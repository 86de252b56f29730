"""Training-clip augmentation (data/augment.py) — geometry consistency.

The reference stubs its augmenter and never implements it
(``datasets/utils.py:51-52``); these tests pin the invariants the round-3
verdict asked for: disparity/mask transform consistently under flip and
crop, intrinsics stay projectively correct, photometric jitter never
touches depth or mask.
"""

import numpy as np
import pytest

from video_depth_anything_tpu.data.augment import (
    AugmentConfig,
    augment_clip,
    crop_intrinsics,
    hflip_intrinsics,
)


def _clip(rng, t=3, h=24, w=32):
    rgb = (rng.rand(t, h, w, 3) * 255).astype(np.uint8)
    depth = (rng.rand(t, h, w) * 10 + 0.5).astype(np.float32)
    valid = (rng.rand(t, h, w) > 0.3).astype(np.float32)
    K = np.array(
        [[50.0, 0.0, w / 2 - 0.5], [0.0, 50.0, h / 2 - 0.5], [0.0, 0.0, 1.0]]
    )
    return rgb, depth, valid, K


def _project(K, p3d):
    uvw = K @ p3d
    return uvw[:2] / uvw[2]


def test_flip_moves_depth_mask_and_disparity_together(rng):
    rgb, depth, valid, K = _clip(rng)
    cfg = AugmentConfig(hflip_prob=1.0, crop_min_scale=1.0,
                        brightness=0.0, contrast=0.0, color=0.0)
    r2, d2, v2, K2 = augment_clip(
        rgb, depth, valid, np.random.RandomState(0), cfg, K
    )
    np.testing.assert_array_equal(r2, rgb[:, :, ::-1])
    np.testing.assert_array_equal(d2, depth[:, :, ::-1])
    np.testing.assert_array_equal(v2, valid[:, :, ::-1])
    # disparity computed from flipped depth == flip of disparity — the
    # derive-after-augment order in clips.py makes this structural, but pin
    # the arithmetic anyway
    np.testing.assert_array_equal(1.0 / d2, (1.0 / depth)[:, :, ::-1])
    # a 3D point projecting to pixel x must project to W−1−x after flip
    p = np.array([0.3, -0.1, 2.0])
    u, v = _project(K, p)
    # flipped world point: mirror x about the camera axis
    u2, v2_ = _project(K2, np.array([-p[0], p[1], p[2]]))
    w = rgb.shape[2]
    assert np.isclose(u2, (w - 1) - u, atol=1e-9)
    assert np.isclose(v2_, v, atol=1e-9)


def test_crop_shifts_intrinsics_consistently(rng):
    rgb, depth, valid, K = _clip(rng)
    cfg = AugmentConfig(hflip_prob=0.0, crop_min_scale=0.5,
                        brightness=0.0, contrast=0.0, color=0.0)
    arng = np.random.RandomState(3)
    r2, d2, v2, K2 = augment_clip(rgb, depth, valid, arng, cfg, K)
    ch, cw = r2.shape[1:3]
    assert ch < rgb.shape[1] or cw < rgb.shape[2]
    # find the crop window by matching depth content
    found = False
    for y0 in range(rgb.shape[1] - ch + 1):
        for x0 in range(rgb.shape[2] - cw + 1):
            if np.array_equal(depth[:, y0 : y0 + ch, x0 : x0 + cw], d2):
                found = True
                break
        if found:
            break
    assert found
    np.testing.assert_array_equal(rgb[:, y0 : y0 + ch, x0 : x0 + cw], r2)
    np.testing.assert_array_equal(valid[:, y0 : y0 + ch, x0 : x0 + cw], v2)
    # a 3D point's pixel shifts by exactly (−x0, −y0)
    p = np.array([0.4, 0.2, 3.0])
    u, v = _project(K, p)
    u2, v2_ = _project(K2, p)
    assert np.isclose(u2, u - x0, atol=1e-9)
    assert np.isclose(v2_, v - y0, atol=1e-9)


def test_photometric_touches_frames_only(rng):
    rgb, depth, valid, K = _clip(rng)
    cfg = AugmentConfig(hflip_prob=0.0, crop_min_scale=1.0,
                        brightness=0.3, contrast=0.3, color=0.2)
    r2, d2, v2, K2 = augment_clip(
        rgb, depth, valid, np.random.RandomState(1), cfg, K
    )
    np.testing.assert_array_equal(d2, depth)
    np.testing.assert_array_equal(v2, valid)
    np.testing.assert_array_equal(K2, K)
    assert r2.dtype == np.uint8 and r2.shape == rgb.shape
    assert not np.array_equal(r2, rgb)  # jitter actually applied


def test_intrinsics_helpers_batched():
    K = np.tile(np.eye(3), (4, 1, 1))
    K[:, 0, 2] = 10.0
    K[:, 1, 2] = 7.0
    Kf = hflip_intrinsics(K, 32)
    np.testing.assert_allclose(Kf[:, 0, 2], 31 - 10.0)
    Kc = crop_intrinsics(K, 3, 2)
    np.testing.assert_allclose(Kc[:, 0, 2], 7.0)
    np.testing.assert_allclose(Kc[:, 1, 2], 5.0)


def test_sampler_flip_only_equals_flipped_batch(rng):
    """ClipSampler with a flip-only AugmentConfig must emit exactly the
    unaugmented batch mirrored on W — clip selection draws happen before
    augmentation draws, so equal seeds pick the same clips."""
    from video_depth_anything_tpu.data.clips import ClipSampler

    class _DS:
        """Minimal scene dataset: ``image (N, H, W, 3) float32 [0,1]`` +
        depth/valid, the ``data/base.py`` contract."""

        def __init__(self, rng):
            n, h, w = 6, 28, 28
            self.scene = {
                "image": rng.rand(n, h, w, 3).astype(np.float32),
                "depth": (rng.rand(n, h, w) * 5 + 0.5).astype(np.float32),
                "valid_depth": np.ones((n, h, w), bool),
            }

        def __len__(self):
            return 1

        def __getitem__(self, i):
            return self.scene

    ds = _DS(np.random.RandomState(2))
    flip_cfg = AugmentConfig(hflip_prob=1.0, crop_min_scale=1.0,
                             brightness=0.0, contrast=0.0, color=0.0)
    plain = next(iter(ClipSampler([ds], clip_len=4, input_size=28, seed=5)))
    flipped = next(iter(
        ClipSampler([ds], clip_len=4, input_size=28, seed=5,
                    augment=flip_cfg)
    ))
    np.testing.assert_allclose(
        flipped["frames"], plain["frames"][:, :, :, ::-1], atol=1e-6
    )
    np.testing.assert_allclose(
        flipped["disparity"], plain["disparity"][:, :, :, ::-1], atol=1e-6
    )
    np.testing.assert_allclose(
        flipped["mask"], plain["mask"][:, :, :, ::-1], atol=1e-6
    )
