"""Prompt-lookup (n-gram) drafting shared by every speculative engine.

The draft never affects outputs — every speculative loop verifies it
against the target model's own logits — so drafting is purely a quality
knob: more context matched ⇒ higher acceptance ⇒ fewer verify passes.

Scheme: longest-suffix match, up to 4-gram. Anchor candidates are
history positions holding the current token whose predecessor also
matches (the bigram floor — the scheme the first cut used everywhere);
each candidate scores +1 per additional consecutive context token that
matches (3rd and 4th), and the winner is the longest match, ties broken
toward the most recent occurrence. The k-1 tokens after the anchor are
the draft. Fallback when no bigram matches anywhere: repeat the current
token (covers degenerate repetition). On the random-weight bench
harness (tools/spec_accept_ab.py) suffix scoring measures IDENTICAL to
pure latest-bigram — random-weight captions have no competing n-gram
anchors to disambiguate (BASELINE.md round-3 findings). It is kept on
the expectation that real text which revisits an n-gram for a DIFFERENT
continuation no longer shadows the right anchor; see the
realistic-acceptance table in BASELINE.md for the trained-weight
measurement.

No torch-reference analog (the reference decodes one token per forward,
moondream.py:481-528); the technique is public prompt-lookup decoding.
"""

import jax
import jax.numpy as jnp


def ngram_draft_rows(h, cnt1, cur, spec_k):
    """Draft for (B, H) row histories.

    `h`: (B, H) int32 token histories (valid prefix per row).
    `cnt1`: (B,) int32 — valid token count per row, INCLUDING `cur`
        (i.e. `cur` sits at position cnt1-1).
    `cur`: (B,) int32 current token per row.
    Returns (draft (B, spec_k-1) int32 ≥ 0, any_match (B,) bool).
    """
    B, H = h.shape
    t = jnp.arange(H, dtype=jnp.int32)[None, :]
    rows = jnp.arange(B, dtype=jnp.int32)

    def ctx(g):  # g-th previous token; sentinel -1 when the row is shorter
        idx = cnt1 - 1 - g
        return jnp.where(idx >= 0, h[rows, jnp.maximum(idx, 0)], -1)

    p1, p2, p3 = ctx(1), ctx(2), ctx(3)
    r1 = jnp.roll(h, 1, axis=1)  # r1[j] = h[j-1] (j=0 wraps; masked below)
    r2 = jnp.roll(h, 2, axis=1)
    r3 = jnp.roll(h, 3, axis=1)
    # anchor j holds cur and is old enough that j+1 exists to draft from
    elig = (h == cur[:, None]) & (t <= (cnt1 - 2)[:, None])
    b1 = elig & (t >= 1) & (r1 == p1[:, None])
    b2 = b1 & (t >= 2) & (r2 == p2[:, None])
    b3 = b2 & (t >= 3) & (r3 == p3[:, None])
    score = b1.astype(jnp.int32) * 2 + b2.astype(jnp.int32) + b3.astype(
        jnp.int32
    )
    key = jnp.where(b1, score * H + t, -1)  # longest match, then latest
    any_match = jnp.any(b1, axis=1)
    j_sel = jnp.argmax(key, axis=1).astype(jnp.int32)
    start = jnp.clip(j_sel + 1, 0, H - (spec_k - 1))
    gather = start[:, None] + jnp.arange(spec_k - 1, dtype=jnp.int32)
    draft = jnp.take_along_axis(h, gather, axis=1)
    draft = jnp.where(any_match[:, None], draft, cur[:, None])
    return jnp.maximum(draft, 0), any_match  # clamp seed pads (-1)


def ngram_draft(hist, cnt1, tok, spec_k):
    """1-D single-stream variant: history (H,), scalar count and token.
    Returns (draft (spec_k-1,), any_match scalar bool)."""
    d, m = ngram_draft_rows(
        hist[None, :],
        jnp.asarray(cnt1, jnp.int32)[None],
        jnp.asarray(tok, jnp.int32)[None],
        spec_k,
    )
    return d[0], m[0]
