"""Parity of the matmul-based resizes against torch F.interpolate.

These interpolation semantics are the reference's known parity footguns
(SURVEY.md §7 hard part 1): bilinear align_corners=True everywhere in the
DPT head, and bicubic align_corners=False with explicit scale factors (the
DINOv2 ``interpolate_offset=0.1`` workaround).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from video_depth_anything_tpu.ops.resize import (
    bicubic_pos_embed_resize,
    bilinear_resize,
)

pytestmark = pytest.mark.slow  # torch-oracle / multi-process tier: excluded from the fast lane (pytest -m 'not slow')



@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((19, 19), (37, 37)),
        ((37, 37), (74, 74)),
        ((74, 74), (148, 148)),
        ((148, 148), (296, 296)),
        ((296, 296), (518, 518)),
        ((20, 33), (37, 66)),
        ((5, 7), (10, 14)),
        ((10, 14), (5, 7)),  # downsample path
        ((8, 8), (8, 8)),  # identity
    ],
)
def test_bilinear_align_corners_true(rng, in_hw, out_hw):
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    got = np.asarray(bilinear_resize(x, *out_hw))
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_hw,
            mode="bilinear",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=5e-5)


@pytest.mark.parametrize("grid,out_hw", [(37, (4, 5)), (37, (20, 33)), (37, (40, 40)), (7, (3, 11))])
def test_bicubic_scale_factor_semantics(rng, grid, out_hw):
    """Bicubic with torch scale-factor coordinate mapping and the +0.1 offset
    (reference dinov2.py:194-205)."""
    offset = 0.1
    dim = 16
    pos = rng.randn(grid, grid, dim).astype(np.float32)
    sh = (out_hw[0] + offset) / grid
    sw = (out_hw[1] + offset) / grid
    got = np.asarray(bicubic_pos_embed_resize(pos, out_hw[0], out_hw[1], sh, sw))
    want = (
        F.interpolate(
            torch.from_numpy(pos).permute(2, 0, 1).unsqueeze(0),
            scale_factor=(sh, sw),
            mode="bicubic",
            align_corners=False,
        )
        .squeeze(0)
        .permute(1, 2, 0)
        .numpy()
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bilinear_scale_factor_2_matches_size():
    """refinenet1 upsamples with scale_factor=2 (ref util/blocks.py:150);
    with align_corners=True this equals size=2H."""
    x = np.random.RandomState(1).randn(1, 9, 11, 4).astype(np.float32)
    got = np.asarray(bilinear_resize(x, 18, 22))
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            scale_factor=2,
            mode="bilinear",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=5e-5)
