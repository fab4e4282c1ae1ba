"""Unit tests for the bench.py orchestrator's pure logic.

Round 3's canonical artifact was lost to harness behavior (one JSON
line printed only after every config; unbounded sweep), so the
aggregate/fragment contract is now tested directly: whatever subset of
configs ran — including none — the aggregate must be one valid,
JSON-serializable record with the headline chosen correctly and every
known field present (null when unmeasured).
"""

import json
import sys
import types

import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

import bench  # noqa: E402


def _args(**over):
    a = types.SimpleNamespace(
        config="2b", decode_tokens=128, runs=8, warmup=2, batch=12,
        int4_batch=16, deadline=3000.0, child_deadline=0.0,
    )
    for k, v in over.items():
        setattr(a, k, v)
    return a


def test_aggregate_empty_fields_is_valid_json():
    out = bench.aggregate(_args(), {}, [], list(bench.CONFIG_ORDER))
    s = json.dumps(out)  # must serialize
    back = json.loads(s)
    assert back["value"] is None
    assert back["value_config"] is None
    assert back["configs_done"] == []
    assert back["configs_skipped"] == list(bench.CONFIG_ORDER)
    # every known metric key present (nulls, not missing)
    for key in (
        "bf16_images_per_sec", "spec_pipelined_bf16_images_per_sec",
        "int4_kv8_b12_images_per_sec", "serving_full_tok_s",
        "p50_caption_latency_ms", "encode_ms_median",
    ):
        assert key in back and back[key] is None


def test_aggregate_headline_is_max_across_candidates():
    fields = {
        "bf16_images_per_sec": 4.9,
        "spec_pipelined_bf16_images_per_sec": 5.78,
        "int4_kv8_b12_images_per_sec": 5.0,
        "spec_pipelined_int4_kv8_b12_images_per_sec": 5.16,
    }
    out = bench.aggregate(_args(), fields, ["a"], [])
    assert out["value"] == 5.78
    assert "spec pipelined" in out["value_config"]
    assert "bf16" in out["value_config"]


def test_aggregate_partial_fields_keep_headline():
    # a killed sweep that only finished one throughput config still
    # reports that config as the headline
    fields = {"int4_kv8_b16_images_per_sec": 4.29}
    out = bench.aggregate(_args(), fields, ["int4kv8_pipelined"], ["rest"])
    assert out["value"] == 4.29
    assert out["configs_skipped"] == ["rest"]


def test_aggregate_folds_hbm_and_tfs_keys():
    fields = {
        "chip_tfs_single": 120.0,
        "chip_tfs_pipelined_bf16": 131.5,
        "live_hbm_gb_single": 4.2,
        "live_hbm_gb_pipelined": 9.6,
        "bf16_images_per_sec": 5.0,
    }
    out = bench.aggregate(_args(), fields, ["x"], [])
    assert out["chip_matmul_tfs"] == 131.5
    assert out["peak_live_hbm_gb"] == 9.6
    # the raw per-config keys must not leak into the record
    assert not any(k.startswith("chip_tfs_") for k in out)
    assert not any(k.startswith("live_hbm_gb") for k in out
                   if k != "peak_live_hbm_gb")


def test_every_config_name_has_a_child_branch():
    """CONFIG_ORDER names must be dispatched in child_main — round 4
    started with three names that silently measured nothing."""
    import inspect

    src = inspect.getsource(bench.child_main)
    for name in bench.CONFIG_ORDER + bench.EXTRA_CONFIGS:
        assert f'"{name}"' in src, (
            f"config {name!r} is in CONFIG_ORDER but never matched in "
            "child_main"
        )


def test_aggregate_dual_headline_policy():
    """`value` = best measured config overall (spec allowed);
    expected_real_checkpoint_* = best PLAIN config (round-4 verdict #3:
    spec acceptance on realistic text is ~break-even, so the plain cell
    is the honest real-checkpoint expectation)."""
    fields = {
        "spec_pipelined_int8_b12_images_per_sec": 5.37,
        "spec_pipelined_bf16_images_per_sec": 4.04,
        "int8_b12_images_per_sec": 4.6,
        "bf16_images_per_sec": 3.4,
    }
    out = bench.aggregate(_args(), fields, ["headline_ab"], [])
    assert out["value"] == 5.37
    assert "int8 w8a8 spec" in out["value_config"]
    assert out["expected_real_checkpoint_images_per_sec"] == 4.6
    assert "int8 w8a8 pipelined" in out["expected_real_checkpoint_config"]
    assert "spec" not in out["expected_real_checkpoint_config"]
    assert "headline_policy" in out


def test_aggregate_records_failed_configs():
    out = bench.aggregate(_args(), {}, ["headline_ab"], ["rest"],
                          ["serving_full"])
    assert out["configs_failed"] == ["serving_full"]
    json.dumps(out)


def test_fragment_parsing_contract():
    """The orchestrator keeps the union of every {...} line a child
    prints; later fragments override earlier ones (cumulative emits)."""
    lines = [
        "some stderr noise",
        json.dumps({"encode_ms_median": 300.0}),
        json.dumps({"encode_ms_median": 285.0, "decode_tokens_per_sec": 227.0}),
        "trailing",
    ]
    fields = {}
    for ln in lines:
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                fields.update(json.loads(ln))
            except json.JSONDecodeError:
                pass
    assert fields == {
        "encode_ms_median": 285.0, "decode_tokens_per_sec": 227.0,
    }


def test_config_order_headline_then_p50():
    # round-4 lesson: the interleaved headline ranking runs FIRST, and
    # p50 (`single`) — half the north star, driver-invisible since
    # round 2 — must be SECOND so a driver kill after two configs still
    # records the complete scored set
    assert bench.CONFIG_ORDER[0] == "headline_ab"
    assert bench.CONFIG_ORDER[1] == "single"
    assert bench.CONFIG_ORDER[2] == "serving_full"
    assert bench.BF16_ONLY[0] == "spec_pipelined_bf16"
    # legacy B=16 cells are out of the default driver order
    for legacy in ("int4kv8_pipelined", "int4kv8_spec_pipelined"):
        assert legacy not in bench.CONFIG_ORDER
        assert legacy in bench.EXTRA_CONFIGS
