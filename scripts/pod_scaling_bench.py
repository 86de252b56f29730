#!/usr/bin/env python
"""Pod scaling measurement harness (roadmap "still parked" item — ready
to run the moment real multi-chip/multi-host hardware is available).

Measures window throughput at the three scaling levels the roadmap calls
for, with one command per level:

  # 1 chip (the BENCH_r* baseline shape)
  python scripts/pod_scaling_bench.py

  # 1 host, all local chips (windows shard over the local 'data' axis;
  # add --model_parallel N to TP-shard within the host)
  python scripts/pod_scaling_bench.py --local_devices

  # N hosts (run on every host; host 0 prints the aggregate)
  python scripts/pod_scaling_bench.py --coordinator host0:1234 \
      --num_hosts N --host_id $ID --local_devices

Two measurement modes, printed as one JSON line each:

  {"mode": "raw_windows", ...}   device window forwards only, every host
      timing an identical independent batch — an UPPER BOUND on scaling
      (no decode, no preprocess, no DCN exchange, no stitch).
  {"mode": "pipeline", ...}      (with --pipeline) the SHIPPED pipelines
      end-to-end over synthetic frames: ranged decode callback +
      preprocess + window forwards + D2H + (multi-host) the DCN
      ``process_allgather`` depth exchange + the sequential stitch
      (ref chain: ``video_depth.py:384-415``).  This is the number a
      product deployment gets; quote it, not the raw row, for scaling
      claims.

Single-chip raw numbers use the same amortized-dispatch methodology as
bench.py (docs/PERFORMANCE.md "Measurement methodology").
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--encoder", default="vits")
    p.add_argument("--size", type=int, default=518)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--local_devices", action="store_true",
                   help="shard windows over all local devices (1-host level)")
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_hosts", type=int, default=None)
    p.add_argument("--host_id", type=int, default=None)
    p.add_argument("--pipeline", action="store_true",
                   help="also measure the SHIPPED pipeline end-to-end "
                        "(decode callback + preprocess + DCN exchange + "
                        "stitch) over synthetic frames")
    p.add_argument("--pipeline_frames", type=int, default=130,
                   help="synthetic video length for --pipeline")
    p.add_argument("--pipeline_iters", type=int, default=3)
    p.add_argument("--video_hw", type=int, nargs=2, default=None,
                   help="synthetic source resolution (default: --size²)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from video_depth_anything_tpu.models.vda import VDAModel
    from video_depth_anything_tpu.parallel.mesh import create_mesh, shard_params
    from video_depth_anything_tpu.parallel.multihost import (
        initialize_distributed,
    )
    from video_depth_anything_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    pid, n_hosts = initialize_distributed(
        args.coordinator, args.num_hosts, args.host_id
    )

    local = jax.local_devices()
    n_local = len(local) if args.local_devices else 1
    mesh = create_mesh(
        data=n_local // args.model_parallel,
        model=args.model_parallel,
        devices=local[:n_local],
    )

    model = VDAModel(args.encoder, dtype=jnp.bfloat16)
    model.init_params(jax.random.PRNGKey(0))
    params = shard_params(model.params, mesh)
    module = model.module

    @jax.jit
    def fwd(params, xs):
        xs = jax.lax.with_sharding_constraint(xs, NamedSharding(mesh, PS("data")))
        return module.apply({"params": params}, xs)

    b = mesh.shape["data"]
    x = jax.device_put(
        jnp.asarray(
            np.random.RandomState(0).randn(b, args.frames, args.size, args.size, 3),
            dtype=jnp.bfloat16,
        ),
        NamedSharding(mesh, PS("data")),
    )

    def force(d):
        return float(jnp.sum(d[0, 0, :2, :2]))

    t0 = time.time()
    force(fwd(params, x))
    compile_s = time.time() - t0
    for _ in range(2):
        force(fwd(params, x))
    t0 = time.time()
    d = None
    for _ in range(args.iters):
        d = fwd(params, x)
    force(d)
    med = (time.time() - t0) / args.iters

    local_fps = b * args.frames / med
    # raw mode: every host runs an identical independent batch
    # ⇒ total = hosts × local (an upper bound; see module docstring)
    total_fps = local_fps * n_hosts
    level = (
        "pod" if n_hosts > 1 else ("host" if n_local > 1 else "chip")
    )
    if pid == 0:
        print(json.dumps({
            "mode": "raw_windows",
            "level": level,
            "devices": n_local * n_hosts,
            "hosts": n_hosts,
            "model_parallel": args.model_parallel,
            "compile_s": round(compile_s, 1),
            "frames_per_s_total": round(total_fps, 2),
            "frames_per_s_per_chip": round(total_fps / (n_local * n_hosts), 2),
        }), flush=True)

    if not args.pipeline:
        return 0

    # -- shipped-pipeline measurement (the number a deployment gets) --------
    vh, vw = args.video_hw or (args.size, args.size)
    video = (
        np.random.RandomState(1).rand(args.pipeline_frames, vh, vw, 3) * 255
    ).astype(np.uint8)

    if n_hosts > 1:
        from video_depth_anything_tpu.parallel.multihost import (
            MultiHostVideoDepthPipeline,
        )

        pipe = MultiHostVideoDepthPipeline(
            model, input_size=args.size,
            data_parallel=args.local_devices,
            model_parallel=args.model_parallel,
        )

        def run():
            depth, _ = pipe.infer_video_depth(
                len(video), lambda a, b: video[a:b]
            )
            return depth
    elif n_local > 1:
        from video_depth_anything_tpu.parallel.data_parallel import (
            DataParallelVideoDepthPipeline,
        )

        pipe = DataParallelVideoDepthPipeline(
            model, input_size=args.size, mesh=mesh
        )

        def run():
            depth, _ = pipe.infer_video_depth(video)
            return depth
    else:
        from video_depth_anything_tpu.inference.pipeline import (
            VideoDepthPipeline,
        )

        pipe = VideoDepthPipeline(model, input_size=args.size)

        def run():
            depth, _ = pipe.infer_video_depth(video)
            return depth

    t0 = time.time()
    depth = run()  # warmup: compiles + numpy one-time costs
    pipe_compile_s = time.time() - t0
    assert np.isfinite(depth).all() and depth.shape[0] == len(video)
    t0 = time.time()
    for _ in range(args.pipeline_iters):
        run()
    med = (time.time() - t0) / args.pipeline_iters
    # pipeline mode: ONE video processed cooperatively by all hosts —
    # total throughput is video length / wall time, no extrapolation
    if pid == 0:
        print(json.dumps({
            "mode": "pipeline",
            "level": level,
            "devices": n_local * n_hosts,
            "hosts": n_hosts,
            "model_parallel": args.model_parallel,
            "video_frames": len(video),
            "video_hw": [vh, vw],
            "compile_s": round(pipe_compile_s, 1),
            "frames_per_s_total": round(len(video) / med, 2),
            "frames_per_s_per_chip": round(
                len(video) / med / (n_local * n_hosts), 2
            ),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
