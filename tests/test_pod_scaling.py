"""Smoke tests for the pod scaling harness (scripts/pod_scaling_bench.py).

The harness is the ready-to-run measurement for the parked real-pod
scaling item; these tests pin that BOTH its modes — the raw-window upper
bound and the shipped-pipeline end-to-end row — run green on a CPU mesh
and report the documented fields, so the first hardware run can't be
blocked by harness rot.
"""

import json
import pytest
import os
import subprocess
import sys

pytestmark = pytest.mark.slow  # torch-oracle / multi-process tier: excluded from the fast lane (pytest -m 'not slow')


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(ROOT, "scripts", "pod_scaling_bench.py")


def _run(extra, n_devices=8, timeout=900):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["VDA_NATIVE_PREPROC"] = "0"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, SCRIPT, "--size", "28", "--frames", "4",
         "--iters", "2"] + extra,
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=timeout,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    rows = [json.loads(l) for l in r.stdout.splitlines()
            if l.startswith("{")]
    return {row["mode"]: row for row in rows}


def test_raw_and_pipeline_single_chip():
    rows = _run(["--pipeline", "--pipeline_frames", "40",
                 "--pipeline_iters", "1"])
    raw, pipe = rows["raw_windows"], rows["pipeline"]
    assert raw["level"] == pipe["level"] == "chip"
    assert raw["devices"] == pipe["devices"] == 1
    assert raw["frames_per_s_total"] > 0
    assert pipe["frames_per_s_total"] > 0
    assert pipe["video_frames"] == 40
    # (no raw-vs-pipeline bound asserted: the smoke config runs raw at
    # --frames 4 while the pipeline always uses real 32-frame windows, so
    # their per-frame amortization differs; at matched --frames 32 the
    # pipeline row prices decode+preprocess+D2H+stitch on top of the raw
    # device bound — that relation is documented, not unit-tested)


def test_raw_and_pipeline_host_level_dp_tp():
    rows = _run(["--local_devices", "--model_parallel", "2", "--pipeline",
                 "--pipeline_frames", "40", "--pipeline_iters", "1"])
    raw, pipe = rows["raw_windows"], rows["pipeline"]
    assert raw["level"] == pipe["level"] == "host"
    assert raw["devices"] == pipe["devices"] == 8
    assert raw["model_parallel"] == pipe["model_parallel"] == 2
    assert pipe["frames_per_s_total"] > 0
