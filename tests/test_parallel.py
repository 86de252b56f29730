"""Mesh/sharding/data-parallel correctness on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as PS

from video_depth_anything_tpu.config import get_model_config
from video_depth_anything_tpu.models.vda import VDAModel
from video_depth_anything_tpu.parallel.mesh import (
    create_mesh,
    param_partition_specs,
    shard_params,
)


@pytest.fixture(scope="module")
def small_model():
    m = VDAModel("vits", dtype=jnp.float32)
    m.init_params(jax.random.PRNGKey(0))
    return m


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())
    mesh = create_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        create_mesh(data=3, model=3)


def test_partition_rules(small_model):
    specs = param_partition_specs(small_model.params)
    qkv = specs["pretrained"]["block_0"]["attn"]["qkv"]["kernel"]
    assert qkv == PS(None, "model")
    proj = specs["pretrained"]["block_0"]["attn"]["proj"]["kernel"]
    assert proj == PS("model", None)
    # head convs replicated
    assert specs["head"]["output_conv1"]["kernel"] == PS()


@pytest.mark.slow
def test_tp_forward_matches_single_device(small_model):
    """Tensor-sharded forward over model=2 must equal the unsharded one."""
    mesh = create_mesh(data=4, model=2)
    x = np.random.RandomState(0).randn(1, 2, 56, 56, 3).astype(np.float32)

    ref = np.asarray(small_model.infer_window(x))

    sharded = shard_params(small_model.params, mesh)
    with mesh:
        got = np.asarray(
            jax.jit(small_model.module.apply)({"params": sharded}, jnp.asarray(x))
        )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_data_parallel_pipeline_matches_serial(small_model):
    from video_depth_anything_tpu.inference.pipeline import VideoDepthPipeline
    from video_depth_anything_tpu.parallel.data_parallel import (
        DataParallelVideoDepthPipeline,
    )

    rng = np.random.RandomState(1)
    video = (rng.rand(70, 64, 80, 3) * 255).astype(np.uint8)

    serial = VideoDepthPipeline(small_model, input_size=56)
    want, _ = serial.infer_video_depth(video)

    dp = DataParallelVideoDepthPipeline(small_model, input_size=56)
    got, _ = dp.infer_video_depth(video)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_host_window_spans_cover_all_windows():
    from video_depth_anything_tpu.inference.pipeline import num_windows, window_frame_indices
    from video_depth_anything_tpu.parallel.multihost import host_window_spans

    n_frames = 300
    spans = host_window_spans(n_frames, 4)
    n_win = num_windows(n_frames)
    assert spans[0].window_start == 0 and spans[-1].window_stop == n_win
    covered = []
    idx = window_frame_indices(n_frames)
    for s in spans:
        covered.extend(range(s.window_start, s.window_stop))
        # every frame a host's windows reference lies inside its decode span
        if s.window_stop > s.window_start:
            used = idx[s.window_start : s.window_stop]
            assert used.min() >= s.frame_start
            assert used.max() < s.frame_stop
    assert covered == list(range(n_win))


def test_initialize_distributed_single_host_noop():
    from video_depth_anything_tpu.parallel.multihost import initialize_distributed

    assert initialize_distributed() == (0, 1)


@pytest.mark.slow
def test_zero1_shards_opt_state_and_matches_baseline(small_model, tmp_path):
    """ZeRO-1: optimizer-state leaves gain a 'data'-axis shard, the step
    result matches the unsharded trainer, and save/restore re-establishes
    the sharded layout."""
    from video_depth_anything_tpu.train.trainer import Trainer, make_optimizer

    mesh = create_mesh(data=4, model=2)
    rng = np.random.RandomState(0)
    batch = {
        "frames": jnp.asarray(rng.randn(4, 2, 28, 28, 3), dtype=jnp.float32),
        "disparity": jnp.asarray(rng.rand(4, 2, 28, 28), dtype=jnp.float32),
        "mask": jnp.ones((4, 2, 28, 28), dtype=jnp.float32),
    }

    # host copy: trainer.step donates its state, and donation would delete
    # the fixture's param buffers if device_put aliased them
    params_host = jax.tree.map(np.asarray, small_model.params)

    results = {}
    for zero1 in (False, True):
        trainer = Trainer(
            small_model.module,
            optimizer=make_optimizer(learning_rate=1e-4),
            mesh=mesh,
            compute_dtype=jnp.float32,
            zero1=zero1,
        )
        state = trainer.init_state(jax.tree.map(jnp.asarray, params_host))
        if zero1:
            # moments carry a 'data' shard where a dimension allows it
            specs = [
                x.sharding.spec
                for x in jax.tree.leaves(state.opt_state)
                if hasattr(x, "sharding") and x.ndim >= 1
            ]
            assert any("data" in (s or ()) for s in specs), specs
            big = max(
                (x for x in jax.tree.leaves(state.opt_state) if x.ndim >= 1),
                key=lambda x: x.size,
            )
            shard_elems = big.addressable_shards[0].data.size
            assert shard_elems * 4 <= big.size, (shard_elems, big.size)
        with mesh:
            for _ in range(2):
                state, metrics = trainer.step(state, batch)
        results[zero1] = (state, float(metrics["loss"]))
        if zero1:
            # params must stay TP-only after apply_updates (no silent
            # data-sharding of the weights)
            for leaf in jax.tree.leaves(state.params):
                assert "data" not in (leaf.sharding.spec or ()), leaf.sharding

            # save/restore re-establishes the ZeRO layout
            path = str(tmp_path / "z1")
            trainer.save_state(path, state)
            trainer2 = Trainer(
                small_model.module,
                optimizer=make_optimizer(learning_rate=1e-4),
                mesh=mesh,
                compute_dtype=jnp.float32,
                zero1=True,
            )
            restored = trainer2.restore_state(path, jax.tree.map(jnp.asarray, params_host))
            rspecs = [
                x.sharding.spec
                for x in jax.tree.leaves(restored.opt_state)
                if hasattr(x, "sharding") and x.ndim >= 1
            ]
            assert any("data" in (s or ()) for s in rspecs), rspecs
            for a, b in zip(
                jax.tree.leaves(state.opt_state),
                jax.tree.leaves(restored.opt_state),
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
                )

    (s0, l0), (s1, l1) = results[False], results[True]
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


@pytest.mark.slow
def test_dp_tp_inference_pipeline_matches_serial(small_model):
    """Productized TP inference (round-3): the mesh pipeline with
    model_parallel=2 — params TP-sharded via TP_RULES, windows over the
    remaining data axis — must reproduce the serial single-device pipeline.
    This is the run.py --model_parallel path."""
    from video_depth_anything_tpu.inference.pipeline import VideoDepthPipeline
    from video_depth_anything_tpu.parallel.data_parallel import (
        DataParallelVideoDepthPipeline,
    )

    rng = np.random.RandomState(2)
    video = (rng.rand(50, 64, 80, 3) * 255).astype(np.uint8)

    serial = VideoDepthPipeline(small_model, input_size=56)
    want, _ = serial.infer_video_depth(video)

    tp = DataParallelVideoDepthPipeline(
        small_model, input_size=56, model_parallel=2
    )
    assert tp.mesh.shape == {"data": 4, "model": 2}
    got, _ = tp.infer_video_depth(video)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_tp_kv_streaming_matches_single_device(small_model):
    """Tensor-parallel KV streaming: the step programs run with
    Megatron-sharded weights over a ('data':1,'model':2) mesh — output
    must match the single-device KV pipeline within float tolerance (TP
    changes GEMM reduction order).  Streaming is sequential, so TP is the
    only way spare chips can accelerate it."""
    from video_depth_anything_tpu.inference.kv_streaming import (
        KVStreamingPipeline,
    )

    rng = np.random.RandomState(4)
    video = (rng.rand(10, 56, 56, 3) * 255).astype(np.uint8)

    single = KVStreamingPipeline(small_model, input_size=56, inference_length=4)
    want, _ = single.infer(video)
    tp = KVStreamingPipeline(
        small_model, input_size=56, inference_length=4,
        model_parallel=2, stream_chunk=2,
    )
    assert tp._mesh.shape == {"data": 1, "model": 2}
    got, _ = tp.infer(video)
    assert got.shape == want.shape == (10, 56, 56)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_multihost_pipeline_single_process_matches_serial(small_model):
    """MultiHostVideoDepthPipeline degenerates to the serial pipeline at
    n_hosts=1 (process allgather of one host), and its decode_range contract
    slices the same frames the serial path preprocesses."""
    from video_depth_anything_tpu.inference.pipeline import VideoDepthPipeline
    from video_depth_anything_tpu.parallel.multihost import (
        MultiHostVideoDepthPipeline,
    )

    rng = np.random.RandomState(3)
    video = (rng.rand(50, 64, 80, 3) * 255).astype(np.uint8)

    serial = VideoDepthPipeline(small_model, input_size=56, window_batch=1)
    want, _ = serial.infer_video_depth(video)

    mh = MultiHostVideoDepthPipeline(
        small_model, input_size=56, window_batch=1,
        process_id=0, num_processes=1,
    )
    got, _ = mh.infer_video_depth(len(video), lambda a, b: video[a:b])
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_tp_feature_cache_streaming_matches_single_device(small_model):
    """TP feature-cache streaming (both the warmup/step programs and the
    chunked steady program run with model:2-sharded weights) matches the
    single-device pipeline within float tolerance."""
    from video_depth_anything_tpu.inference.streaming import (
        StreamingDepthPipeline,
    )

    rng = np.random.RandomState(6)
    video = (rng.rand(14, 56, 56, 3) * 255).astype(np.uint8)
    kwargs = dict(input_size=56, inference_length=6, keyframe_list=(2,))

    want, _ = StreamingDepthPipeline(small_model, **kwargs).infer(video)
    tp = StreamingDepthPipeline(small_model, model_parallel=2, **kwargs)
    assert tp._mesh.shape == {"data": 1, "model": 2}
    got, _ = tp.infer(video)
    assert got.shape == want.shape == (9, 56, 56)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_tp_kv_streaming_aligned_matches_single_device(small_model):
    """TP x per-frame realignment: the aligned KV step (anchor re-predict
    + in-jit fit) and its chunked scan run with model:2-sharded weights —
    equality with the single-device aligned pipeline within float
    tolerance.  Covers the aligned branches the plain TP test misses."""
    from video_depth_anything_tpu.inference.kv_streaming import (
        KVStreamingPipeline,
    )

    rng = np.random.RandomState(7)
    video = (rng.rand(11, 56, 56, 3) * 255).astype(np.uint8)
    kwargs = dict(input_size=56, inference_length=4, align_each_new_frame=True)

    want, _ = KVStreamingPipeline(small_model, **kwargs).infer(video)
    tp = KVStreamingPipeline(
        small_model, model_parallel=2, stream_chunk=3, **kwargs
    )
    got, _ = tp.infer(video)
    assert got.shape == want.shape == (11, 56, 56)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
