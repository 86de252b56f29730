"""Multi-process multi-host bring-up (parallel/multihost.py).

``initialize_distributed`` was previously only exercised as the single-host
no-op; this spawns TWO real processes on the CPU backend with a localhost
coordinator — the same ``jax.distributed.initialize`` path a TPU pod
bootstrap takes (one process per host, coordinator on host 0) — and checks
global process/device visibility plus a cross-process allgather.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from video_depth_anything_tpu.parallel.multihost import initialize_distributed

pid, n, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
p, np_ = initialize_distributed(addr, n, pid)
assert (p, np_) == (pid, n), (p, np_)
assert jax.process_count() == n
# one CPU device per process, all globally visible
assert len(jax.devices()) == n, jax.devices()
assert len(jax.local_devices()) == 1

import jax.numpy as jnp
from jax.experimental import multihost_utils

vals = multihost_utils.process_allgather(jnp.asarray([pid], jnp.int32))
got = sorted(int(v) for v in vals.ravel())
assert got == list(range(n)), got
print("WORKER_OK", pid, flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_initialize_distributed_two_process_cpu():
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    # one device per process — the workers assert global visibility of 2
    env.pop("XLA_FLAGS", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), "2", addr],
            env=env,
            cwd=root,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"distributed workers hung; partial output: {outs}")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out


@pytest.mark.slow
def test_two_process_e2e_matches_single(tmp_path):
    """SURVEY §7 step 6 end-to-end: two run.py processes with a localhost
    coordinator — each decoding only its own host_window_spans frame range
    and computing only its own windows — must produce exactly the
    single-process pipeline's stitched depth video (the per-window forward
    is the same jit program on the same splice-resolved inputs; the
    process_allgather + stitch adds no arithmetic)."""
    import numpy as np

    from video_depth_anything_tpu.io.video import save_video

    rng = np.random.RandomState(7)
    base = np.zeros((60, 64, 80, 3), np.uint8)
    yy, xx = np.mgrid[0:64, 0:80]
    for t in range(60):
        base[t, ..., 0] = ((xx * 3 + t * 5) % 256).astype(np.uint8)
        base[t, ..., 1] = ((yy * 4 - t * 3) % 256).astype(np.uint8)
        base[t, ..., 2] = rng.randint(0, 256, (64, 80), np.uint8)
    video = str(tmp_path / "clip.mp4")
    save_video(base, video, fps=24)

    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        VDA_NATIVE_DECODE="0",
        VDA_NATIVE_PREPROC="0",
    )
    env.pop("XLA_FLAGS", None)  # one device per process
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    common = [
        sys.executable, "run.py", "--input_video", video,
        "--encoder", "vits", "--random_init", "--fp32",
        "--input_size", "112", "--window_batch", "1", "--save_npz",
    ]

    single_dir = str(tmp_path / "single")
    r = subprocess.run(
        common + ["--output_dir", single_dir], env=env, cwd=root,
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    port = _free_port()
    multi_dir = str(tmp_path / "multi")
    procs = [
        subprocess.Popen(
            common + [
                "--output_dir", multi_dir,
                "--coordinator", f"127.0.0.1:{port}",
                "--num_hosts", "2", "--host_id", str(i),
            ],
            env=env, cwd=root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multi-host run hung; partial output: {outs}")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {i} failed:\n{out}"

    want = np.load(os.path.join(single_dir, "clip_depth.npz"))["depth"]
    got = np.load(os.path.join(multi_dir, "clip_depth.npz"))["depth"]
    assert got.shape == want.shape == (60, 64, 80)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_two_process_dp_e2e_matches_single(tmp_path):
    """Two-level parallelism e2e: 2 processes × 2 local CPU devices each
    (4 global), every host sharding its windows over its own local-device
    mesh (--data_parallel inside --num_hosts) — stitched output must equal
    the single-process pipeline within float tolerance (the DP window
    forward batches windows differently, so bit-equality is not the
    contract here; the single-host multihost e2e test pins that)."""
    import numpy as np

    from video_depth_anything_tpu.io.video import save_video

    rng = np.random.RandomState(11)
    base = (rng.rand(60, 48, 64, 3) * 255).astype(np.uint8)
    video = str(tmp_path / "clip.mp4")
    save_video(base, video, fps=24)

    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        VDA_NATIVE_DECODE="0",
        VDA_NATIVE_PREPROC="0",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    common = [
        sys.executable, "run.py", "--input_video", video,
        "--encoder", "vits", "--random_init", "--fp32",
        "--input_size", "112", "--save_npz",
    ]

    single_dir = str(tmp_path / "single")
    r = subprocess.run(
        common + ["--output_dir", single_dir, "--window_batch", "1"],
        env=env, cwd=root, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    port = _free_port()
    multi_dir = str(tmp_path / "multi")
    procs = [
        subprocess.Popen(
            common + [
                "--output_dir", multi_dir, "--data_parallel",
                "--coordinator", f"127.0.0.1:{port}",
                "--num_hosts", "2", "--host_id", str(i),
            ],
            env=env, cwd=root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multi-host DP run hung; partial output: {outs}")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {i} failed:\n{out}"

    want = np.load(os.path.join(single_dir, "clip_depth.npz"))["depth"]
    got = np.load(os.path.join(multi_dir, "clip_depth.npz"))["depth"]
    assert got.shape == want.shape == (60, 48, 64)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_two_process_tp_e2e_matches_single(tmp_path):
    """TP × multi-host composition (round-3 verdict item 3): 2 processes ×
    2 local CPU devices each, every host sharding the ViT/motion-FF weights
    Megatron-style over its own local ``model:2`` mesh axis
    (--model_parallel inside --num_hosts) — the layout for vitl on a pod
    with multi-chip hosts: windows over DCN, TP collectives riding each
    host's own ICI.  Stitched output must match the single-process pipeline
    within float tolerance (TP changes GEMM reduction order)."""
    import numpy as np

    from video_depth_anything_tpu.io.video import save_video

    rng = np.random.RandomState(13)
    base = (rng.rand(60, 48, 64, 3) * 255).astype(np.uint8)
    video = str(tmp_path / "clip.mp4")
    save_video(base, video, fps=24)

    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        VDA_NATIVE_DECODE="0",
        VDA_NATIVE_PREPROC="0",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    common = [
        sys.executable, "run.py", "--input_video", video,
        "--encoder", "vits", "--random_init", "--fp32",
        "--input_size", "112", "--save_npz",
    ]

    single_dir = str(tmp_path / "single")
    r = subprocess.run(
        common + ["--output_dir", single_dir, "--window_batch", "1"],
        env=env, cwd=root, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    port = _free_port()
    multi_dir = str(tmp_path / "multi")
    procs = [
        subprocess.Popen(
            common + [
                "--output_dir", multi_dir, "--model_parallel", "2",
                "--coordinator", f"127.0.0.1:{port}",
                "--num_hosts", "2", "--host_id", str(i),
            ],
            env=env, cwd=root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multi-host TP run hung; partial output: {outs}")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {i} failed:\n{out}"

    want = np.load(os.path.join(single_dir, "clip_depth.npz"))["depth"]
    got = np.load(os.path.join(multi_dir, "clip_depth.npz"))["depth"]
    assert got.shape == want.shape == (60, 48, 64)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ranged_decode_matches_full_decode(tmp_path):
    """read_video_frame_range(a, b) must equal read_video_frames()[a:b]
    bit-for-bit (seek-verified or grab-skip path), and count_video_frames
    must agree with the actual decoded count — the multi-host spans are
    computed from it before any host decodes."""
    import numpy as np

    from video_depth_anything_tpu.io.video import (
        count_video_frames,
        read_video_frame_range,
        read_video_frames,
        save_video,
    )

    rng = np.random.RandomState(5)
    base = (rng.rand(37, 32, 48, 3) * 255).astype(np.uint8)
    video = str(tmp_path / "v.mp4")
    save_video(base, video, fps=24)

    os.environ["VDA_NATIVE_DECODE"] = "0"
    try:
        full, fps = read_video_frames(video)
        n, fps2 = count_video_frames(video)
        assert n == len(full) == 37 and fps == fps2
        for a, b in ((0, 5), (10, 25), (30, 37)):
            got = read_video_frame_range(video, a, b)
            np.testing.assert_array_equal(got, full[a:b])
        # fps striding: every 2nd frame
        strided, _ = read_video_frames(video, target_fps=12)
        got = read_video_frame_range(video, 3, 9, target_fps=12)
        np.testing.assert_array_equal(got, strided[3:9])
        # forced sequential grab()-skip path (untrusted-container mode)
        os.environ["VDA_SEEK_MODE"] = "grab"
        got = read_video_frame_range(video, 10, 25)
        np.testing.assert_array_equal(got, full[10:25])
        # header validation pass accepts a well-formed container
        os.environ["VDA_VALIDATE_FRAME_COUNT"] = "1"
        n3, _ = count_video_frames(video)
        assert n3 == 37
    finally:
        os.environ.pop("VDA_NATIVE_DECODE", None)
        os.environ.pop("VDA_SEEK_MODE", None)
        os.environ.pop("VDA_VALIDATE_FRAME_COUNT", None)
