"""Prompt-lookup (n-gram) drafting shared by every speculative engine.

The draft never affects outputs — every speculative loop verifies it
against the target model's own logits — so drafting is purely a quality
knob: more context matched ⇒ higher acceptance ⇒ fewer verify passes.

Scheme: longest-suffix match, up to `max_n`-gram (default 8). Anchor
candidates are history positions holding the current token whose
predecessor also matches (the bigram floor); each candidate scores +1
per additional consecutive context token that matches, and the winner is
the longest match, ties broken toward the most recent occurrence. The
k-1 tokens after the anchor are the draft.

Fallback tiers when no bigram matches anywhere in the row: the LATEST
bare occurrence of the current token (unigram anchor — on real text its
historical successor beats blind repetition), then repeat the current
token (covers degenerate repetition and unseen tokens).

History of the knobs, measured on the realistic-acceptance harness
(tools/spec_accept_realistic.py — tiny LM trained on the repo's prose,
held-out prompts; BASELINE.md table):
  * suffix scoring beyond the bigram measures IDENTICAL on the
    random-weight bench (degenerate repetition has no competing anchors
    to disambiguate — BASELINE.md round-3);
  * round 5 extended the suffix window 4→8 and added the unigram
    fallback; see BASELINE.md round-5 drafting entry for the deltas.

No torch-reference analog (the reference decodes one token per forward,
moondream.py:481-528); the technique is public prompt-lookup decoding.
"""

import jax
import jax.numpy as jnp

MAX_NGRAM = 8


def ngram_draft_rows(h, cnt1, cur, spec_k, max_n: int = MAX_NGRAM):
    """Draft for (B, H) row histories.

    `h`: (B, H) int32 token histories (valid prefix per row).
    `cnt1`: (B,) int32 — valid token count per row, INCLUDING `cur`
        (i.e. `cur` sits at position cnt1-1).
    `cur`: (B,) int32 current token per row.
    `max_n`: longest suffix n-gram considered (static; unrolled into
        max_n-1 rolled comparisons over the (B, H) plane — VPU-trivial
        next to the verify forward this draft feeds).
    Returns (draft (B, spec_k-1) int32 ≥ 0, any_match (B,) bool).
    """
    B, H = h.shape
    t = jnp.arange(H, dtype=jnp.int32)[None, :]
    rows = jnp.arange(B, dtype=jnp.int32)

    def ctx(g):  # g-th previous token; sentinel -1 when the row is shorter
        idx = cnt1 - 1 - g
        return jnp.where(idx >= 0, h[rows, jnp.maximum(idx, 0)], -1)

    # anchor j holds cur and is old enough that j+1 exists to draft from
    elig = (h == cur[:, None]) & (t <= (cnt1 - 2)[:, None])
    # tiered consecutive-context matches: tier g additionally requires
    # h[j-g] == (g-th token before cur); a tier can only hold if every
    # shorter tier held, so the score is the matched suffix length
    b = elig & (t >= 1) & (jnp.roll(h, 1, axis=1) == ctx(1)[:, None])
    b1 = b
    score = b.astype(jnp.int32) * 2
    for g in range(2, max_n):
        b = b & (t >= g) & (jnp.roll(h, g, axis=1) == ctx(g)[:, None])
        score = score + b.astype(jnp.int32)
    key = jnp.where(b1, score * H + t, -1)  # longest match, then latest
    any_bigram = jnp.any(b1, axis=1)
    # unigram fallback: latest bare occurrence of cur
    any_uni = jnp.any(elig, axis=1)
    key_uni = jnp.where(elig, t, -1)
    j_sel = jnp.where(
        any_bigram, jnp.argmax(key, axis=1), jnp.argmax(key_uni, axis=1)
    ).astype(jnp.int32)
    any_match = any_bigram | any_uni
    start = jnp.clip(j_sel + 1, 0, H - (spec_k - 1))
    gather = start[:, None] + jnp.arange(spec_k - 1, dtype=jnp.int32)
    draft = jnp.take_along_axis(h, gather, axis=1)
    draft = jnp.where(any_match[:, None], draft, cur[:, None])
    return jnp.maximum(draft, 0), any_match  # clamp seed pads (-1)


def ngram_draft(hist, cnt1, tok, spec_k, max_n: int = MAX_NGRAM):
    """1-D single-stream variant: history (H,), scalar count and token.
    Returns (draft (spec_k-1,), any_match scalar bool)."""
    d, m = ngram_draft_rows(
        hist[None, :],
        jnp.asarray(cnt1, jnp.int32)[None],
        jnp.asarray(tok, jnp.int32)[None],
        spec_k,
        max_n=max_n,
    )
    return d[0], m[0]
