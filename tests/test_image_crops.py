"""Crop-tiling preprocessor tests.

Covers the semantics of the reference's normative test file
(/root/reference/tests/test_image_crops.py) plus exact cross-checks against
the reference implementation itself (tiling decisions and crop pixels must
match bit-for-bit, since both use PIL LANCZOS).
"""

import numpy as np
import pytest

from moondream_tpu.ops.image_crops import (
    overlap_crop_image,
    reconstruct_from_crops,
    select_tiling,
)

from conftest import add_reference_to_path, reference_available


def test_overlap_crop_basic():
    img = np.zeros((800, 600, 3), dtype=np.uint8)
    img[300:500, 200:400] = 255

    result = overlap_crop_image(img, overlap_margin=4, max_crops=12)

    assert result["crops"][0].shape == (378, 378, 3)
    assert len(result["crops"]) > 1
    assert all(c.shape == (378, 378, 3) for c in result["crops"])
    assert len(result["tiling"]) == 2


def test_overlap_crop_small_image():
    img = np.zeros((300, 200, 3), dtype=np.uint8)
    result = overlap_crop_image(img, overlap_margin=4, max_crops=12)

    assert result["crops"][0].shape == (378, 378, 3)
    assert len(result["crops"]) == 2
    assert result["tiling"] == (1, 1)


def test_reconstruction_preserves_pattern():
    img = np.zeros((800, 600, 3), dtype=np.uint8)
    img[300:500, 200:400] = 255

    result = overlap_crop_image(img, overlap_margin=4, max_crops=12)
    recon = np.asarray(
        reconstruct_from_crops(
            np.stack(result["crops"][1:]).astype(np.int32),
            result["tiling"],
            overlap_margin=4,
        )
    )

    h, w = recon.shape[:2]
    center = recon[h // 2 - 100 : h // 2 + 100, w // 2 - 100 : w // 2 + 100].mean()
    assert center > recon[:100, :100].mean() + 100


@pytest.mark.parametrize(
    "hw",
    [(100, 100), (378, 378), (379, 378), (800, 600), (600, 800), (4000, 300),
     (300, 4000), (2000, 2000), (5000, 5000), (379, 5000)],
)
def test_select_tiling_matches_reference(hw):
    if not reference_available():
        pytest.skip("reference tree not mounted")
    add_reference_to_path()
    from moondream.torch.image_crops import select_tiling as ref_select_tiling

    h, w = hw
    for crop in (266, 378):
        for max_crops in (4, 12):
            assert select_tiling(h, w, crop, max_crops) == ref_select_tiling(
                h, w, crop, max_crops
            ), (h, w, crop, max_crops)


@pytest.mark.parametrize("hw", [(800, 600), (300, 200), (1500, 900), (378, 378)])
def test_overlap_crop_matches_reference_bitexact(hw):
    if not reference_available():
        pytest.skip("reference tree not mounted")
    add_reference_to_path()
    from moondream.torch.image_crops import overlap_crop_image as ref_overlap

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)

    ours = overlap_crop_image(img, overlap_margin=4, max_crops=12)
    ref = ref_overlap(img, overlap_margin=4, max_crops=12)

    assert ours["tiling"] == tuple(ref["tiling"])
    np.testing.assert_array_equal(ours["crops"], ref["crops"])


def test_reconstruction_matches_reference():
    if not reference_available():
        pytest.skip("reference tree not mounted")
    add_reference_to_path()
    import torch
    from moondream.torch.image_crops import (
        reconstruct_from_crops as ref_reconstruct,
    )

    rng = np.random.default_rng(1)
    # Feature-plane stitch: 6 tiles of 27x27x8 with margin 4, patch "size" 1 —
    # the exact configuration used on the device path (moondream.py:221-226).
    tiling = (2, 3)
    crops = rng.standard_normal((6, 27, 27, 8)).astype(np.float32)

    ours = np.asarray(
        reconstruct_from_crops(crops, tiling, overlap_margin=4, patch_size=1)
    )
    ref = ref_reconstruct(
        [torch.from_numpy(c) for c in crops], tiling, overlap_margin=4, patch_size=1
    ).numpy()

    np.testing.assert_array_equal(ours, ref)
