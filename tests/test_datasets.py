"""Dataset loaders: synthesize miniature on-disk datasets with known values
and verify the decode conventions (depth scaling, camera parsing, index
matching) that the reference loaders implement."""

import gzip
import json
import os

import cv2
import numpy as np
import pytest
from PIL import Image

from video_depth_anything_tpu.data import get_dataset


def _write_rgb(path, h=12, w=16, value=128):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, np.full((h, w, 3), value, np.uint8))


def test_kitti_decode(tmp_path):
    root = str(tmp_path)
    scene = "2011_09_26_drive_0001_sync"
    date = "2011_09_26"
    depth_dir = os.path.join(
        root, "kitti_depth/data_depth_annotated/train", scene,
        "proj_depth/groundtruth/image_02",
    )
    img_dir = os.path.join(root, "kitti_raw", date, scene, "image_02", "data")
    os.makedirs(depth_dir)
    os.makedirs(img_dir)
    # images 0..9; GT depth only for frames 5..7 (KITTI skips first/last 5)
    for i in range(10):
        _write_rgb(os.path.join(img_dir, f"{i:010d}.png"))
    for i in range(5, 8):
        d = np.full((12, 16), i * 256 * 4, np.uint16)  # -> i*4 meters
        cv2.imwrite(os.path.join(depth_dir, f"{i:010d}.png"), d)
    calib = os.path.join(root, "kitti_raw", date)
    with open(os.path.join(calib, "calib_cam_to_cam.txt"), "w") as f:
        for cam in range(4):
            p = np.zeros(12)
            p[0], p[5], p[2], p[6], p[10] = 700.0 + cam, 700.0, 600.0, 180.0, 1.0
            f.write(f"P_rect_0{cam}: " + " ".join(map(str, p)) + "\n")
            f.write(f"R_rect_0{cam}: " + " ".join(map(str, np.eye(3).ravel())) + "\n")

    ds = get_dataset("kitti", root, cameras=("image_02",))
    assert len(ds) == 1
    s = ds[0]
    assert s["image"].shape == (3, 12, 16, 3)
    np.testing.assert_allclose(s["depth"][0], 5 * 4.0)  # value/256 meters
    np.testing.assert_allclose(s["depth"][2], 7 * 4.0)
    assert s["valid_depth"].all()
    np.testing.assert_allclose(s["intrinsics"][0][0, 0], 702.0)  # K_cam2


def test_vkitti_decode(tmp_path):
    root = str(tmp_path)
    scene = os.path.join(root, "Scene01", "clone")
    for cam in ("0",):
        for i in range(3):
            _write_rgb(os.path.join(scene, "frames/rgb/Camera_0", f"rgb_{i:05d}.jpg"))
            d = np.full((12, 16), 1500 + 100 * i, np.uint16)  # cm
            cv2.imwrite(
                os.path.join(scene, "frames/depth/Camera_0", f"depth_{i:05d}.png"), d
            ) or os.path.exists(scene)
    os.makedirs(os.path.join(scene, "frames/depth/Camera_0"), exist_ok=True)
    for i in range(3):
        d = np.full((12, 16), 1500 + 100 * i, np.uint16)
        cv2.imwrite(os.path.join(scene, "frames/depth/Camera_0", f"depth_{i:05d}.png"), d)
    with open(os.path.join(scene, "intrinsic.txt"), "w") as f:
        f.write("frame cameraID K[0,0] K[1,1] K[0,2] K[1,2]\n")
        for i in range(3):
            f.write(f"{i} 0 725.0 725.0 620.5 187.0\n")
    with open(os.path.join(scene, "extrinsic.txt"), "w") as f:
        f.write("frame cameraID r1,1 ...\n")
        for i in range(3):
            r = np.eye(3).ravel()
            f.write(
                f"{i} 0 {r[0]} {r[1]} {r[2]} {0.1*i} {r[3]} {r[4]} {r[5]} 0.0 "
                f"{r[6]} {r[7]} {r[8]} 0.0\n"
            )

    ds = get_dataset("vkitti", root, cameras=("0",))
    s = ds[0]
    np.testing.assert_allclose(s["depth"][1], 16.0)  # 1600 cm -> 16 m
    np.testing.assert_allclose(s["intrinsics"][2][0, 2], 620.5)
    np.testing.assert_allclose(s["extrinsics"][2][0, 3], 0.2, atol=1e-6)
    assert s["valid_depth"].all()


def test_sintel_decode(tmp_path):
    from video_depth_anything_tpu.data.sintel import read_dpt, write_cam, write_dpt

    root = str(tmp_path)
    scene_img = os.path.join(root, "training/final/alley_1")
    scene_dep = os.path.join(root, "training/depth/alley_1")
    scene_cam = os.path.join(root, "training/camdata_left/alley_1")
    os.makedirs(scene_dep)
    os.makedirs(scene_cam)
    rng = np.random.RandomState(0)
    want_depth = []
    for i in range(1, 4):
        _write_rgb(os.path.join(scene_img, f"frame_{i:04d}.png"))
        d = (rng.rand(12, 16) * 50).astype(np.float32)
        want_depth.append(d)
        write_dpt(os.path.join(scene_dep, f"frame_{i:04d}.dpt"), d)
        k = np.array([[1120.0, 0, 511.5], [0, 1120.0, 217.5], [0, 0, 1]])
        n = np.hstack([np.eye(3), [[0.0], [0.0], [0.1 * i]]])
        write_cam(os.path.join(scene_cam, f"frame_{i:04d}.cam"), k, n)

    ds = get_dataset("sintel", root)
    s = ds[0]
    np.testing.assert_allclose(s["depth"], np.stack(want_depth))
    np.testing.assert_allclose(s["intrinsics"][0][0, 0], 1120.0)
    np.testing.assert_allclose(s["extrinsics"][2][2, 3], 0.3, atol=1e-6)
    # round-trip reader sanity
    np.testing.assert_allclose(
        read_dpt(os.path.join(scene_dep, "frame_0001.dpt")), want_depth[0]
    )


def test_tartanair_decode(tmp_path):
    root = str(tmp_path)
    scene = os.path.join(root, "abandonedfactory", "Easy", "P001")
    os.makedirs(os.path.join(scene, "depth_left"))
    rng = np.random.RandomState(1)
    for i in range(3):
        _write_rgb(os.path.join(scene, "image_left", f"{i:06d}_left.png"))
        np.save(
            os.path.join(scene, "depth_left", f"{i:06d}_left_depth.npy"),
            np.full((12, 16), 10.0 + i, np.float32),
        )
    # identity quaternion, translating along x in NED
    poses = np.zeros((3, 7))
    poses[:, 0] = np.arange(3) * 0.5
    poses[:, 6] = 1.0
    np.savetxt(os.path.join(scene, "pose_left.txt"), poses)

    ds = get_dataset("tartanair", root, cameras=("left",))
    s = ds[0]
    np.testing.assert_allclose(s["depth"][2], 12.0)
    assert s["intrinsics"][0][0, 0] == 320.0
    # cam->world pose (x-translation -> NED row 1) inverted to world->cam
    np.testing.assert_allclose(s["extrinsics"][1][1, 3], -0.5, atol=1e-6)


def test_pointodyssey_decode(tmp_path):
    root = str(tmp_path)
    scene = os.path.join(root, "train", "scene_a")
    os.makedirs(os.path.join(scene, "depths"))
    for i in range(3):
        _write_rgb(os.path.join(scene, "rgbs", f"rgb_{i:05d}.jpg"))
        d = np.full((12, 16), 65535 // 100 * (i + 1), np.uint16)
        cv2.imwrite(os.path.join(scene, "depths", f"depth_{i:05d}.png"), d)
    np.savez(
        os.path.join(scene, "anno.npz"),
        intrinsics=np.tile(np.eye(3, dtype=np.float32) * 288, (3, 1, 1)),
        extrinsics=np.tile(np.eye(4, dtype=np.float32), (3, 1, 1)),
    )
    ds = get_dataset("pointodyssey", root)
    s = ds[0]
    expect = 65535 // 100 * 2 / 65535 * 1000
    np.testing.assert_allclose(s["depth"][1], expect, rtol=1e-6)
    assert s["intrinsics"].shape == (3, 3, 3)


def test_sceneflow_decode(tmp_path):
    from video_depth_anything_tpu.data.sceneflow import read_pfm, write_pfm

    root = str(tmp_path)
    scene = "TRAIN/A/0000"
    for i in range(6, 9):
        _write_rgb(os.path.join(root, "frames_cleanpass", scene, "left", f"{i:04d}.png"))
        disp = np.full((12, 16), 21.0, np.float32)
        os.makedirs(os.path.join(root, "disparity", scene, "left"), exist_ok=True)
        write_pfm(os.path.join(root, "disparity", scene, "left", f"{i:04d}.pfm"), disp)
    os.makedirs(os.path.join(root, "camera_data", scene), exist_ok=True)
    with open(os.path.join(root, "camera_data", scene, "camera_data.txt"), "w") as f:
        for i in range(3):
            vals = np.eye(4)
            vals[0, 3] = i * 1.0
            f.write("L " + " ".join(map(str, vals.ravel())) + "\n")
            f.write("R " + " ".join(map(str, vals.ravel())) + "\n")

    ds = get_dataset(
        "sceneflow", root, use_driving=False, use_monkaa=False
    )
    s = ds[0]
    np.testing.assert_allclose(s["depth"][0], 1050.0 / 21.0)  # focal*baseline/disp
    np.testing.assert_allclose(s["extrinsics"][1][0, 3], 1.0)
    # PFM round trip
    d, sc = read_pfm(os.path.join(root, "disparity", scene, "left", "0006.pfm"))
    np.testing.assert_allclose(d, 21.0)
    assert sc == 1.0


def test_dynamicreplica_decode(tmp_path):
    from video_depth_anything_tpu.data.dynamicreplica import load_float16_png_depth

    root = str(tmp_path)
    split_dir = os.path.join(root, "train")
    os.makedirs(split_dir)
    rng = np.random.RandomState(3)
    annots = []
    depth_f16 = (rng.rand(12, 16) * 10).astype(np.float16)
    for i in range(2):
        img_rel = f"images/s1_left_{i:03d}.png"
        dep_rel = f"depths/s1_left_{i:03d}.png"
        msk_rel = f"masks/s1_left_{i:03d}.png"
        _write_rgb(os.path.join(split_dir, img_rel))
        os.makedirs(os.path.join(split_dir, "depths"), exist_ok=True)
        Image.fromarray(depth_f16.view(np.uint16)).save(os.path.join(split_dir, dep_rel))
        _write_rgb(os.path.join(split_dir, msk_rel), value=255)
        annots.append(
            {
                "sequence_name": "s1",
                "camera_name": "left",
                "image": {"path": img_rel, "size": [12, 16]},
                "depth": {"path": dep_rel, "scale_adjustment": 1.0, "mask_path": msk_rel},
                "viewpoint": {
                    "principal_point": [0.0, 0.0],
                    "focal_length": [1.0, 1.0],
                    "intrinsics_format": "ndc_norm_image_bounds",
                    "R": np.eye(3).tolist(),
                    "T": [0.0, 0.0, 0.0],
                },
            }
        )
    with gzip.open(
        os.path.join(split_dir, "frame_annotations_train.jgz"), "wt", encoding="utf8"
    ) as z:
        json.dump(annots, z)

    ds = get_dataset("dynamicreplica", root)
    s = ds[0]
    np.testing.assert_allclose(s["depth"][0], depth_f16.astype(np.float32))
    assert s["depth_mask"].all()
    # ndc -> pixel: f_px = f_ndc * (w/2, h/2) = (8, 6)
    np.testing.assert_allclose(s["intrinsics"][0][0, 0], 8.0)
    np.testing.assert_allclose(s["intrinsics"][0][1, 1], 6.0)


def test_irs_gated_without_exr(tmp_path):
    root = str(tmp_path)
    scene = os.path.join(root, "Home_A")
    _write_rgb(os.path.join(scene, "l_00001.png"))
    open(os.path.join(scene, "d_00001.exr"), "wb").write(b"\x76\x2f\x31\x01")
    ds = get_dataset("irs", root)
    assert len(ds) == 1
    try:
        ds[0]
        has_exr = True
    except RuntimeError as e:
        has_exr = False
        assert "EXR" in str(e)
    if has_exr:  # pragma: no cover - env-dependent
        pass


def test_clip_sampler(tmp_path):
    from video_depth_anything_tpu.data.clips import ClipSampler

    class TinyDS:
        max_depth = 50.0

        def __len__(self):
            return 2

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            gt = rng.rand(6, 20, 24).astype(np.float32) * 10 + 1
            return {
                "image": rng.rand(6, 20, 24, 3).astype(np.float32),
                "depth": gt,
                "valid_depth": np.ones_like(gt, dtype=bool),
            }

    sampler = ClipSampler([TinyDS()], clip_len=4, batch_size=2, input_size=28)
    batch = next(iter(sampler))
    assert batch["frames"].shape[0] == 2
    assert batch["frames"].shape[1] == 4
    assert batch["frames"].shape[2] % 14 == 0
    assert batch["disparity"].shape == batch["mask"].shape
    assert (batch["disparity"] > 0).all()


def test_prefetcher_order_exhaustion_and_errors():
    from video_depth_anything_tpu.data.clips import Prefetcher

    # order preserved, exhaustion terminal (and stays terminal)
    pf = Prefetcher(iter(range(7)), depth=2)
    assert list(pf) == list(range(7))
    assert list(pf) == []

    # producer exceptions re-raise at the consumer, after the good items
    def boom():
        yield 1
        yield 2
        raise RuntimeError("decode failed")

    pf = Prefetcher(boom(), depth=1)
    assert next(pf) == 1
    assert next(pf) == 2
    try:
        next(pf)
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "decode failed" in str(e)


def test_clip_sampler_mixed_shapes_and_short_scenes():
    """Clips from scenes of different resolutions and lengths must stack."""
    from video_depth_anything_tpu.data.clips import ClipSampler

    class DS:
        def __init__(self, n, h, w):
            self.n, self.h, self.w = n, h, w
            self.max_depth = 50.0

        def __len__(self):
            return 1

        def __getitem__(self, i):
            rng = np.random.RandomState(self.h)
            gt = rng.rand(self.n, self.h, self.w).astype(np.float32) * 10 + 1
            return {
                "image": rng.rand(self.n, self.h, self.w, 3).astype(np.float32),
                "depth": gt,
                "valid_depth": np.ones_like(gt, dtype=bool),
            }

    sampler = ClipSampler(
        [DS(2, 20, 30), DS(9, 36, 24)], clip_len=4, batch_size=4, input_size=28
    )
    batch = next(iter(sampler))
    assert batch["frames"].shape == (4, 4, 28, 28, 3)
    assert batch["disparity"].shape == (4, 4, 28, 28)
