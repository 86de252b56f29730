#!/usr/bin/env python
"""Train-step throughput (frozen encoder + trainable head/motion, SSI+TGM
losses) at a realistic clip shape.

  nohup python scripts/bench_train.py > /tmp/bench_train.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--encoder", default="vits")
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--size", type=int, default=266)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--train_encoder", action="store_true")
    p.add_argument("--remat_motion", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.models.vda import VDAModel
    from video_depth_anything_tpu.parallel.mesh import create_mesh
    from video_depth_anything_tpu.train.trainer import Trainer, make_optimizer

    import dataclasses

    from video_depth_anything_tpu.config import get_model_config

    cfg = get_model_config(args.encoder)
    if args.remat_motion:
        cfg = dataclasses.replace(cfg, remat_motion=True)
    model = VDAModel(args.encoder, dtype=jnp.bfloat16, cfg=cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = create_mesh()
    trainer = Trainer(
        model.module,
        optimizer=make_optimizer(
            learning_rate=1e-4, train_encoder=args.train_encoder
        ),
        mesh=mesh,
        compute_dtype=jnp.bfloat16,
        train_encoder=args.train_encoder,
    )
    state = trainer.init_state(params)

    rng = np.random.RandomState(0)
    b, t, s = 1, args.frames, args.size
    batch = {
        "frames": jnp.asarray(rng.randn(b, t, s, s, 3), dtype=jnp.float32),
        "disparity": jnp.asarray(rng.rand(b, t, s, s), dtype=jnp.float32),
        "mask": jnp.ones((b, t, s, s), dtype=jnp.float32),
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
        for _ in range(args.iters):
            state, metrics = trainer.step(state, batch)
        float(metrics["loss"])
        med = (time.time() - t0) / args.iters

    print(json.dumps({
        "bench": f"train_step/{args.encoder}_{t}x{s}"
        + ("_trainenc" if args.train_encoder else "")
        + ("_remat" if args.remat_motion else ""),
        "compile_s": round(compile_s, 1),
        "step_s": round(med, 4),
        "clip_frames_per_s": round(b * t / med, 2),
        "loss": round(loss, 4),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
