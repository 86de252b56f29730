#!/usr/bin/env python
"""Benchmark harness — prints the driver JSON line(s).

Headline metric: model frames/s per chip for the vits 32-frame window at
518×518 in bf16 (the reference README's benchmark shape, ``README.md:46-61``).
``vs_baseline`` compares against the reference A100 FP16 Small number
(7.5 ms/frame ⇒ 133.3 frames/s, BASELINE.md).

Output contract (the driver parses the LAST complete JSON line):
  1. The headline line is printed and flushed IMMEDIATELY after the first
     measurement — a kill during the extra rows can no longer lose the
     round's number.
  2. A second, full line (same headline fields + every extra row) is
     printed when the extras finish.
Extra rows run most-important-first under a wall-clock budget
(``VDA_BENCH_BUDGET_S``, default 480 s from process start); rows past the
budget are recorded as ``"SKIPPED: time budget"``.

Every row is compiled ONCE via the AOT path (``fn.lower(...).compile()``)
and that same executable provides ``memory_analysis()`` — static
argument/output/temp byte accounting (the README VRAM-table analogue,
``/root/reference/README.md:49-57``) that works even on backends whose
``memory_stats()`` reports zeros.  The JAX persistent compilation cache is
enabled so re-runs skip the minute-scale remote compiles entirely.

Execution is forced through a scalar tap of the full depth output, so the
measurement captures device compute without the (environment-specific)
tunnel cost of shipping the 32×518×518 map to the host; end-to-end numbers
live in the run log (`run.py --save_stats`).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_FPS_A100_FP16_SMALL = 1000.0 / 7.5 * 1.0  # per-frame ms -> frames/s


def _mem() -> dict:
    """Runtime device-memory snapshot (MB) for the bench row being finished.

    ``peak_mb`` is the process-cumulative high-water mark (the backend has
    no per-region reset), so a row's peak is max-so-far across the configs
    run before it; ``in_use_mb`` is live bytes right after the config's
    buffers drop.  Backends that report all-zero ``memory_stats`` omit the
    block (the static ``mem_static`` row fills that gap)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        out = {
            "in_use_mb": round(stats.get("bytes_in_use", 0) / 2**20, 1),
            "peak_mb": round(stats.get("peak_bytes_in_use", 0) / 2**20, 1),
        }
        return out if any(out.values()) else {}
    except Exception:  # pragma: no cover - backend without memory_stats
        return {}


def _static_mem(compiled) -> dict:
    """Static memory accounting of a compiled executable (MB).

    ``compiled.memory_analysis()`` is backend-independent byte accounting
    from the compiler: argument + output + XLA temp (activations/workspace)
    + generated code.  ``peak_est_mb`` (args+out+temp) is the README
    VRAM-table analogue for runtimes whose ``memory_stats`` is empty."""
    try:
        m = compiled.memory_analysis()

        def mb(b):
            return round(float(b) / 2**20, 1)

        out = {
            "args_mb": mb(m.argument_size_in_bytes),
            "out_mb": mb(m.output_size_in_bytes),
            "temp_mb": mb(m.temp_size_in_bytes),
            "code_mb": mb(m.generated_code_size_in_bytes),
        }
        out["peak_est_mb"] = round(
            out["args_mb"] + out["out_mb"] + out["temp_mb"], 1
        )
        return out
    except Exception:  # pragma: no cover - backend without memory_analysis
        return {}


def _aot(fn, *args, **kwargs):
    """Compile a jitted fn exactly once; return ``(compiled, seconds)``.

    The AOT executable serves both the timed calls and the static memory
    analysis, so no bench row ever pays a second (minute-scale, remote)
    compile.  Static args are baked in at lower time — call the result with
    the dynamic arguments only."""
    t0 = time.time()
    compiled = fn.lower(*args, **kwargs).compile()
    return compiled, time.time() - t0


def bench_window(encoder: str = "vits", size: int = 518, frames: int = 32,
                 iters: int = 10, warmup: int = 3, batch: int = 1,
                 attn_impl: str = "auto") -> dict:
    """``batch`` > 1 measures the window-batched production path
    (independent sliding windows per program, inference/pipeline.py
    ``window_batch``): per-kernel-call fixed costs amortize — vits 329 →
    400 f/s/chip at batch 4 on v5e.  ``attn_impl="auto:fast"`` selects the
    no-max exp2 softmax in the Pallas spatial kernel (run.py --attn_impl)."""
    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.models.vda import VDAModel

    model = VDAModel(encoder, dtype=jnp.bfloat16, attn_impl=attn_impl)
    model.init_params(jax.random.PRNGKey(0))

    x = jax.device_put(
        jnp.asarray(
            np.random.randn(batch, frames, size, size, 3), dtype=jnp.bfloat16
        )
    )

    def force(d):
        # Scalar tap forces full execution; avoids bulk D2H in the timing.
        return float(jnp.sum(d[0, 0, :2, :2]))

    step, compile_s = _aot(model._jit_forward, model.params, x)
    mem_static = _static_mem(step)
    for _ in range(warmup):
        force(step(model.params, x))
    # The axon tunnel costs ~28 ms per host roundtrip; amortize it by
    # dispatching `iters` steps back-to-back and forcing only the last —
    # the device executes in order, so this measures true per-step time.
    t0 = time.time()
    d = None
    for _ in range(iters):
        d = step(model.params, x)
    force(d)
    med = (time.time() - t0) / iters
    total = batch * frames
    return {
        "encoder": encoder,
        "size": size,
        "frames": frames,
        "batch": batch,
        "compile_s": round(compile_s, 2),
        "median_window_s": round(med, 4),
        "frames_per_s": round(total / med, 2),
        "ms_per_frame": round(1000.0 * med / total, 3),
        "mem": _mem(),
        "mem_static": mem_static,
    }


def bench_streaming(encoder: str = "vits", size: int = 518,
                    iters: int = 20, warmup: int = 3, chunk: int = 8) -> dict:
    """Steady-state streaming throughput, chunked production path: the
    feature cache holds pre-motion per-frame features, so ``chunk`` steady
    frames batch into one device program (batched encoder + batched
    K-window head + slot scatter) — see inference/streaming.py."""
    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.inference.streaming import (
        StreamingDepthPipeline,
    )
    from video_depth_anything_tpu.models.vda import VDAModel

    model = VDAModel(encoder, dtype=jnp.bfloat16)
    model.init_params(jax.random.PRNGKey(0))
    pipe = StreamingDepthPipeline(model, chunk_size=chunk)
    params = model.params

    xs = jax.device_put(
        jnp.asarray(np.random.randn(max(chunk, 1), size, size, 3),
                    dtype=model.dtype)
    )
    feats = pipe._encode_fn(params, xs[:1])
    cache = tuple(
        jnp.zeros((pipe.cache_len,) + f.shape[1:], dtype=f.dtype)
        for f in feats
    )
    if chunk > 1:
        gather, slots, _ = pipe._steady_indices(
            list(range(pipe.cache_len)), chunk
        )
        gather = jnp.asarray(gather)
        slots = jnp.asarray(slots)
        compiled, compile_s = _aot(
            pipe._chunk_fn, params, xs, cache, gather, slots,
            out_hw=(size, size),
        )

        def step(cache):
            return compiled(params, xs, cache, gather, slots)
    else:
        use_idx = jnp.asarray(
            np.asarray(pipe.use_feature_idx[-1], dtype=np.int64)
        )
        slot = jnp.int32(pipe.cache_len - 1)
        compiled, compile_s = _aot(
            pipe._step_fn, params, xs, cache, use_idx, slot, pred_idx=None,
            out_hw=(size, size),
        )

        def step(cache):
            return compiled(params, xs, cache, use_idx, slot, pred_idx=None)

    mem_static = _static_mem(compiled)
    depth, cache = step(cache)
    for _ in range(warmup):
        depth, cache = step(cache)
    float(jnp.sum(depth[0, :2, :2]))
    t0 = time.time()
    for _ in range(iters):
        depth, cache = step(cache)
    float(jnp.sum(depth[0, :2, :2]))
    med = (time.time() - t0) / iters / max(chunk, 1)
    return {
        "encoder": encoder,
        "size": size,
        "chunk": chunk,
        "compile_s": round(compile_s, 2),
        "median_step_s": round(med, 4),
        "frames_per_s": round(1.0 / med, 2),
        "mem": _mem(),
        "mem_static": mem_static,
    }


def bench_kv_streaming(encoder: str = "vits", size: int = 518,
                       iters: int = 20, warmup: int = 3, chunk: int = 1,
                       aligned: bool = False) -> dict:
    """Steady-state KV-cache streaming step (O(1)-per-frame mode): encoder
    (1 frame) + single-query motion attention over the ring caches +
    1-frame refinenets, one fused program per frame.

    ``chunk`` > 1 measures the chunked program (batched encoder +
    ``lax.scan`` over K head steps in ONE dispatch — the fix for the mode
    being dispatch-bound e2e, round-3 verdict item 1).  ``aligned``
    measures the per-frame on-device realignment variant (anchor
    re-predicted each step + in-jit (s, t) fit)."""
    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.inference.kv_streaming import (
        KVStreamingPipeline,
    )
    from video_depth_anything_tpu.models.vda import VDAModel

    model = VDAModel(encoder, dtype=jnp.bfloat16)
    model.init_params(jax.random.PRNGKey(0))
    pipe = KVStreamingPipeline(
        model, align_each_new_frame=aligned, stream_chunk=chunk
    )
    params = model.params

    x_warm = jax.device_put(
        jnp.asarray(
            np.random.randn(1, pipe.L, size, size, 3), dtype=model.dtype
        )
    )
    depth0, caches = pipe._start_fn(
        params, x_warm, out_hw=(size, size), pin_anchor=aligned
    )
    x = jax.device_put(
        jnp.asarray(
            np.random.randn(max(chunk, 1), size, size, 3), dtype=model.dtype
        )
    )

    if aligned:
        anchor_levels = pipe._levels_fn(params, x_warm[0, :1])
        ref_anchor = depth0[0, 0]
        if chunk > 1:
            compiled, compile_s = _aot(
                pipe._aligned_chunk_step_fn, params, x, caches,
                anchor_levels, ref_anchor, out_hw=(size, size),
            )

            def step(caches):
                return compiled(params, x, caches, anchor_levels, ref_anchor)
        else:
            compiled, compile_s = _aot(
                pipe._aligned_step_fn, params, x, caches, anchor_levels,
                ref_anchor, out_hw=(size, size),
            )

            def step(caches):
                d, c, _, _ = compiled(
                    params, x, caches, anchor_levels, ref_anchor
                )
                return d, c
    elif chunk > 1:
        compiled, compile_s = _aot(
            pipe._chunk_step_fn, params, x, caches, out_hw=(size, size)
        )

        def step(caches):
            return compiled(params, x, caches)
    else:
        compiled, compile_s = _aot(
            pipe._step_fn, params, x, caches, out_hw=(size, size)
        )

        def step(caches):
            return compiled(params, x, caches)

    mem_static = _static_mem(compiled)
    depth, caches = step(caches)
    for _ in range(warmup):
        depth, caches = step(caches)
    float(jnp.sum(depth[0, :2, :2]))
    t0 = time.time()
    for _ in range(iters):
        depth, caches = step(caches)
    float(jnp.sum(depth[0, :2, :2]))
    med = (time.time() - t0) / iters / max(chunk, 1)
    return {
        "encoder": encoder,
        "size": size,
        "chunk": chunk,
        "aligned": aligned,
        "compile_s": round(compile_s, 2),
        "median_step_s": round(med, 4),
        "frames_per_s": round(1.0 / med, 2),
        "mem": _mem(),
        "mem_static": mem_static,
    }


def bench_train(encoder: str = "vits", size: int = 266, frames: int = 32,
                iters: int = 5) -> dict:
    """Training-step throughput (frozen encoder, SSI+TGM losses) — the
    subsystem the reference lacks entirely (its train.py is a VRAM stress
    tool, SURVEY.md §2.5); clip-frames/s/chip at the standard 32×266²
    training shape.  Uses the jit step (not AOT) because ``Trainer`` owns
    its compilation; the static-memory block is omitted for this row."""
    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.models.vda import VDAModel
    from video_depth_anything_tpu.parallel.mesh import create_mesh
    from video_depth_anything_tpu.train.trainer import Trainer, make_optimizer

    model = VDAModel(encoder, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = create_mesh()
    trainer = Trainer(
        model.module,
        optimizer=make_optimizer(learning_rate=1e-4),
        mesh=mesh,
        compute_dtype=jnp.bfloat16,
    )
    state = trainer.init_state(params)
    rng = np.random.RandomState(0)
    # one clip per data-axis slice: the step shards the batch over 'data',
    # so a fixed batch of 1 would leave N-1 chips idle on multi-chip hosts
    b = mesh.shape["data"]
    batch = {
        "frames": jnp.asarray(
            rng.randn(b, frames, size, size, 3), dtype=jnp.float32
        ),
        "disparity": jnp.asarray(
            rng.rand(b, frames, size, size), dtype=jnp.float32
        ),
        "mask": jnp.ones((b, frames, size, size), dtype=jnp.float32),
    }
    with mesh:
        t0 = time.time()
        state, metrics = trainer.step(state, batch)
        loss = float(metrics["loss"])
        compile_s = time.time() - t0
        for _ in range(2):
            state, metrics = trainer.step(state, batch)
        float(metrics["loss"])
        t0 = time.time()
        for _ in range(iters):
            state, metrics = trainer.step(state, batch)
        float(metrics["loss"])
        med = (time.time() - t0) / iters
    return {
        "encoder": encoder,
        "size": size,
        "frames": frames,
        "clips_per_step": b,
        "compile_s": round(compile_s, 2),
        "step_s": round(med, 4),
        # b clips over b data-axis chips -> per-chip rate is frames/step
        "clip_frames_per_s_per_chip": round(frames / med, 2),
        "loss": round(loss, 4),
        "mem": _mem(),
    }


def bench_data_parallel(encoder: str = "vits", size: int = 518,
                        frames: int = 32, iters: int = 5) -> dict:
    """Per-chip window throughput under the data-parallel window sharding
    (single chip here: validates the pjit path adds no overhead; on a pod
    the same code scales over the ``data`` axis)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from video_depth_anything_tpu.models.vda import VDAModel
    from video_depth_anything_tpu.parallel.mesh import create_mesh

    n_dev = len(jax.devices())
    model = VDAModel(encoder, dtype=jnp.bfloat16)
    model.init_params(jax.random.PRNGKey(0))
    mesh = create_mesh()
    module = model.module

    @jax.jit
    def fwd(params, xs):
        xs = jax.lax.with_sharding_constraint(
            xs, NamedSharding(mesh, PS("data"))
        )
        return module.apply({"params": params}, xs)

    x = jax.device_put(
        jnp.asarray(
            np.random.randn(n_dev, frames, size, size, 3), dtype=model.dtype
        )
    )
    step, compile_s = _aot(fwd, model.params, x)
    mem_static = _static_mem(step)

    def force(d):
        return float(jnp.sum(d[0, 0, :2, :2]))

    force(step(model.params, x))
    for _ in range(2):
        d = step(model.params, x)
    force(d)
    t0 = time.time()
    for _ in range(iters):
        d = step(model.params, x)
    force(d)
    med = (time.time() - t0) / iters
    total_frames = n_dev * frames
    return {
        "encoder": encoder,
        "devices": n_dev,
        "compile_s": round(compile_s, 2),
        "frames_per_s_total": round(total_frames / med, 2),
        "frames_per_s_per_chip": round(total_frames / med / n_dev, 2),
        "mem": _mem(),
        "mem_static": mem_static,
    }


# Extra rows, most-important-first (vitl + the production streaming modes
# before secondary size/batch variants): under the wall-clock budget the
# high-value rows are the ones that survive.
EXTRA_ROWS = (
    ("vitl", lambda: bench_window("vitl")),
    ("kv_streaming_vits_chunked", lambda: bench_kv_streaming("vits", chunk=8)),
    ("kv_streaming_vits_aligned_chunked",
     lambda: bench_kv_streaming("vits", aligned=True, chunk=8)),
    ("vits_wb4", lambda: bench_window("vits", batch=4)),
    ("vitb", lambda: bench_window("vitb")),
    ("streaming_vits_chunked", lambda: bench_streaming("vits")),
    ("kv_streaming_vits", lambda: bench_kv_streaming("vits")),
    ("kv_streaming_vits_aligned",
     lambda: bench_kv_streaming("vits", aligned=True)),
    ("vitl_fast", lambda: bench_window("vitl", attn_impl="auto:fast")),
    ("vitb_wb4", lambda: bench_window("vitb", batch=4)),
    ("streaming_vits", lambda: bench_streaming("vits", chunk=1)),
    ("kv_streaming_vitb", lambda: bench_kv_streaming("vitb")),
    ("kv_streaming_vitl", lambda: bench_kv_streaming("vitl")),
    ("kv_streaming_vitl_chunked",
     lambda: bench_kv_streaming("vitl", chunk=8)),
    ("dp_vits", lambda: bench_data_parallel("vits")),
    ("train_vits", lambda: bench_train("vits")),
)


def main() -> int:
    t_start = time.time()
    budget_s = float(os.environ.get("VDA_BENCH_BUDGET_S", "480"))

    from video_depth_anything_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    r = bench_window("vits")
    fps = r["frames_per_s"]

    def line(detail):
        return json.dumps(
            {
                "metric": "frames/sec/chip vits 1x32x518x518 bf16",
                "value": fps,
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS_A100_FP16_SMALL, 3),
                "detail": detail,
            }
        )

    # Headline line FIRST, flushed: a kill during the extras can no longer
    # lose the round's number (the driver parses the last complete line —
    # both lines carry the same headline fields).
    detail = {"window_vits": r}
    print(line(detail), flush=True)

    if os.environ.get("VDA_BENCH_FAST", "0") != "1":
        import sys

        for key, fn in EXTRA_ROWS:
            elapsed = time.time() - t_start
            if elapsed > budget_s:
                detail[key] = "SKIPPED: time budget"
                continue
            try:
                detail[key] = fn()
            except Exception as e:  # noqa: BLE001
                detail[key] = f"ERROR: {type(e).__name__}: {e}"
            print(f"# bench row {key}: {detail[key]}", file=sys.stderr,
                  flush=True)
        detail["elapsed_s"] = round(time.time() - t_start, 1)
        print(line(detail), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
