"""Eval-metric tests: our implementations vs the reference's (imported as a
golden oracle where possible) and hand-computed cases."""

import numpy as np
import pytest

from moondream_tpu.eval.metrics import (
    VQAScorer,
    aggregate_map,
    anls,
    average_precision,
    box_iou,
    edit_distance,
    greedy_match,
    precision_recall_f1,
    relaxed_correctness,
)

from conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

if reference_available():
    add_reference_to_path()


CASES_VQA = [
    ("a dog", ["dog", "a dog", "the dog", "cat", "dog", "dog", "dog", "puppy",
               "dog", "dog"]),
    ("Two", ["2", "two", "2", "3", "2", "2", "two", "2", "2", "4"]),
    ("isnt it", ["isn't it", "no", "isn't it", "yes", "isn't it"]),
    ("stop-sign!", ["stop sign", "stopsign", "stop sign", "sign"]),
    ("1,000", ["1,000", "1000", "1,000"]),
    ("", ["dog", "cat"]),
]


@requires_reference
@pytest.mark.parametrize("candidate,gts", CASES_VQA)
def test_vqa_scorer_matches_reference(candidate, gts):
    from moondream.eval.utils import VQAScorer as RefScorer

    ours = VQAScorer().compute_score(candidate, gts)
    ref = RefScorer().compute_score(candidate, gts)
    assert ours == pytest.approx(ref)


@requires_reference
@pytest.mark.parametrize(
    "target,pred",
    [
        ("14", "14.5"), ("14", "15"), ("100%", "96%"), ("0.25", "25%"),
        ("cat", "cat"), ("cat", "Cat"), ("0", "0"), ("", ""), ("12%", "0.12"),
        ("-5", "-5.2"),
    ],
)
def test_relaxed_correctness_matches_reference(target, pred):
    from moondream.eval.chartqa import relaxed_correctness as ref_rc

    assert relaxed_correctness(target, pred) == ref_rc(target, pred)


def test_anls():
    assert anls("hello", "hello") == 1.0
    assert anls("HELLO ", "hello") == 1.0
    assert anls("abcd", "wxyz") == 0.0  # below 0.5 threshold -> 0
    assert 0.5 <= anls("kitten", "sitten") < 1.0


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "abc") == 3
    assert edit_distance("abc", "abc") == 0


@requires_reference
def test_average_precision_matches_reference():
    from moondream.eval.coco_map import calculate_map as ref_map

    rng = np.random.default_rng(0)
    for _ in range(5):
        n_gt, n_pred = rng.integers(1, 6), rng.integers(0, 7)
        gts = []
        for _ in range(n_gt):
            x1, y1 = rng.uniform(0, 50, 2)
            gts.append((x1, y1, x1 + rng.uniform(5, 30), y1 + rng.uniform(5, 30)))
        preds = []
        for _ in range(n_pred):
            base = gts[rng.integers(0, n_gt)]
            jitter = rng.uniform(-5, 5, 4)
            preds.append(tuple(np.add(base, jitter)) + (rng.uniform(),))

        ours = average_precision(gts, preds, 0.5)
        ref = ref_map([gts], [preds], 0.5)
        assert ours == pytest.approx(ref), (gts, preds)


@requires_reference
def test_greedy_match_matches_reference():
    from moondream.eval.waste_detection import match as ref_match

    gts = [(0.1, 0.1, 0.3, 0.3), (0.5, 0.5, 0.9, 0.9)]
    preds = [(0.12, 0.1, 0.31, 0.29), (0.0, 0.0, 0.05, 0.05), (0.5, 0.52, 0.88, 0.9)]
    assert greedy_match(gts, preds, 0.5) == ref_match(gts, preds, 0.5)
    assert greedy_match(gts, [], 0.5) == ref_match(gts, [], 0.5)


def test_box_iou():
    assert box_iou((0, 0, 2, 2), (0, 0, 2, 2)) == 1.0
    assert box_iou((0, 0, 1, 1), (2, 2, 3, 3)) == 0.0
    assert box_iou((0, 0, 2, 2), (1, 1, 3, 3)) == pytest.approx(1 / 7)


def test_precision_recall_f1():
    out = precision_recall_f1(3, 1, 2)
    assert out["precision"] == 0.75
    assert out["recall"] == 0.6
    assert out["f1"] == pytest.approx(2 * 0.75 * 0.6 / 1.35)
    assert precision_recall_f1(0, 0, 0) == {"precision": 0.0, "recall": 0.0, "f1": 0.0}


def test_aggregate_map():
    assert aggregate_map({1: [1.0, 0.5], 2: [0.0]}, {1: 2, 2: 1}) == pytest.approx(0.5)
