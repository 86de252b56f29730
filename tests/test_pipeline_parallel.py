"""Pipeline-parallel encoder correctness on the 8-device CPU mesh.

The GPipe-style staged encoder (``parallel.pipeline_parallel``) must produce
the same depth as the single-device forward: the block chain is pure
composition, microbatches carry no cross-frame state, and the tap
all_gather moves each stage's owned taps verbatim — so fp32 parity is
tight, not tolerance-waved.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_depth_anything_tpu.config import get_model_config
from video_depth_anything_tpu.models.vda import VDAModel
from video_depth_anything_tpu.parallel.pipeline_parallel import (
    PipelineParallelVideoDepthPipeline,
    PipelineParallelWindowRunner,
)


@pytest.fixture(scope="module")
def model():
    m = VDAModel("vits", dtype=jnp.float32)
    m.init_params(jax.random.PRNGKey(0))
    return m


@pytest.mark.slow
@pytest.mark.parametrize("stages", [2, 4])
def test_pp_window_matches_single_device(model, stages):
    x = np.random.RandomState(0).randn(1, 4, 56, 56, 3).astype(np.float32)
    ref = np.asarray(model.infer_window(x))
    pp = PipelineParallelWindowRunner(model, num_stages=stages)
    got = np.asarray(pp.infer_window(x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_pp_window_matches_single_device_small(model):
    """Fast-lane PP coverage at a cheap shape (the 56² 2/4-stage pair is
    in the slow tier)."""
    x = np.random.RandomState(0).randn(1, 4, 28, 28, 3).astype(np.float32)
    ref = np.asarray(model.infer_window(x))
    pp = PipelineParallelWindowRunner(model, num_stages=2)
    got = np.asarray(pp.infer_window(x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pp_odd_stage_count_autopicks_microbatches(model):
    """S=3 (depth 12 divisible) with B*T=4: no divisor of 4 equals 2S=6 —
    the auto-pick must still find a runnable M (here 4) instead of
    erroring (review finding: odd stage counts were dead on arrival)."""
    x = np.random.RandomState(4).randn(1, 4, 28, 28, 3).astype(np.float32)
    ref = np.asarray(model.infer_window(x))
    pp = PipelineParallelWindowRunner(model, num_stages=3)
    assert pp._pick_m(4) == 4
    got = np.asarray(pp.infer_window(x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_pp_mid_stage_and_double_taps():
    """Taps that fall mid-stage and two taps inside one stage (vitl taps
    block 4 inside its first stage at S=4 — ref run.py:74-77)."""
    vits = get_model_config("vits")
    cfg = dc.replace(
        vits,
        vit=dc.replace(vits.vit, depth=8),
        intermediate_layer_idx=(0, 1, 5, 7),
    )
    m = VDAModel(cfg=cfg, dtype=jnp.float32)
    m.init_params(jax.random.PRNGKey(1))
    x = np.random.RandomState(1).randn(1, 4, 28, 28, 3).astype(np.float32)
    ref = np.asarray(m.infer_window(x))
    pp = PipelineParallelWindowRunner(m, num_stages=4)
    got = np.asarray(pp.infer_window(x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pp_explicit_microbatches(model):
    x = np.random.RandomState(2).randn(2, 4, 28, 28, 3).astype(np.float32)
    ref = np.asarray(model.infer_window(x))
    pp = PipelineParallelWindowRunner(
        model, num_stages=2, num_microbatches=8
    )
    got = np.asarray(pp.infer_window(x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_pp_validation_errors(model):
    with pytest.raises(ValueError, match="not divisible"):
        PipelineParallelWindowRunner(model, num_stages=5)  # depth 12 % 5
    pp = PipelineParallelWindowRunner(
        model, num_stages=2, num_microbatches=3
    )
    x = np.zeros((1, 4, 28, 28, 3), np.float32)
    with pytest.raises(ValueError, match="must divide"):
        pp.infer_window(x)
    with pytest.raises(ValueError, match="num_stages"):
        PipelineParallelWindowRunner(model, num_stages=1)


@pytest.mark.slow
def test_pp_tracks_params_replacement():
    """Replacing ``model.params`` after the runner is built (checkpoint
    load into a live pipeline) must be picked up — the base pipeline
    re-reads ``model.params`` every call (review finding: the staged
    copies went stale)."""
    m = VDAModel("vits", dtype=jnp.float32)
    m.init_params(jax.random.PRNGKey(0))
    pp = PipelineParallelWindowRunner(m, num_stages=2)
    x = np.random.RandomState(5).randn(1, 4, 28, 28, 3).astype(np.float32)
    first = np.asarray(pp.infer_window(x))
    m.init_params(jax.random.PRNGKey(99))
    ref = np.asarray(m.infer_window(x))
    got = np.asarray(pp.infer_window(x))
    assert not np.allclose(got, first)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_bench_pp_harness(capsys):
    """The PP scaling harness (scripts/bench_pp.py) runs both its
    baseline and staged modes on the CPU mesh and prints valid JSON."""
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_pp",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "bench_pp.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for stages in (1, 2):
        mod.main([
            "--stages", str(stages), "--size", "28", "--frames", "4",
            "--iters", "2", "--warmup", "1",
        ])
        row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert row["stages"] == stages and row["frames_per_s"] > 0


@pytest.mark.slow
def test_pp_pipeline_e2e_matches_serial(model):
    """Full video pipeline (preprocess → PP windows → stitch) equals the
    serial pipeline."""
    from video_depth_anything_tpu.inference.pipeline import VideoDepthPipeline

    rng = np.random.RandomState(3)
    video = (rng.rand(70, 64, 80, 3) * 255).astype(np.uint8)

    serial = VideoDepthPipeline(model, input_size=56)
    want, _ = serial.infer_video_depth(video)

    pp = PipelineParallelVideoDepthPipeline(
        model, pipeline_parallel=2, input_size=56
    )
    got, _ = pp.infer_video_depth(video)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
