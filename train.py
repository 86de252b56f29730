#!/usr/bin/env python
"""Temporal fine-tuning CLI (net-new; the reference's ``train.py`` is a GPU
stress tool with no training loop — SURVEY.md §2.5).

Frozen DINOv2 encoder, trainable head + motion modules, SSI + TGM loss,
clips sampled from scene datasets, pjit'd step over a data×model mesh.

  python train.py --dataset pointodyssey --root /data/po --encoder vits \
      --steps 1000 --clip_len 8 --batch_size 2 --out ckpt_out
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Video Depth Anything training (TPU)")
    p.add_argument("--dataset", action="append", required=True,
                   help="dataset name (repeatable): pointodyssey, dynamicreplica, ...")
    p.add_argument("--root", action="append", required=True,
                   help="dataset root, one per --dataset")
    p.add_argument("--encoder", default="vits", choices=["vits", "vitb", "vitl"])
    p.add_argument("--init_checkpoint", default=None, help=".pth or native dir")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--clip_len", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--input_size", type=int, default=266)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--tgm_weight", type=float, default=10.0)
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="linear LR warmup steps (0 = constant LR)")
    p.add_argument("--decay_steps", type=int, default=0,
                   help="cosine decay horizon after warmup (0 = none)")
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient-accumulation micro-batches per update")
    p.add_argument("--augment", action="store_true",
                   help="per-clip geometric (hflip, scaled crop) + "
                        "photometric (brightness/contrast/color, frames "
                        "only) augmentation (data/augment.py)")
    p.add_argument("--train_encoder", action="store_true")
    p.add_argument("--zero1", action="store_true",
                   help="shard optimizer state over the data mesh axis "
                        "(ZeRO-1; Adam moments are 2x params in fp32)")
    p.add_argument("--remat_motion", action="store_true",
                   help="rematerialize motion modules in the backward "
                        "(fits vitl 32x518^2 on a 16 GB chip)")
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--eval_every", type=int, default=0,
                   help="validate every N steps on held-out clips: "
                        "scale/shift-aligned AbsRel + delta1 in disparity "
                        "space, logged with the step metrics (0 = off)")
    p.add_argument("--eval_clips", type=int, default=2,
                   help="held-out clips for --eval_every (fixed seed, "
                        "sampled once at startup)")
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--out", default="./checkpoints_out")
    p.add_argument("--resume", action="store_true",
                   help="resume params/optimizer/step from <out>/state_latest")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from video_depth_anything_tpu.data import get_dataset
    from video_depth_anything_tpu.data.clips import ClipSampler
    from video_depth_anything_tpu.io.checkpoint import (
        load_native,
        load_torch_checkpoint,
        save_native,
    )
    from video_depth_anything_tpu.models.vda import VDAModel
    from video_depth_anything_tpu.parallel.mesh import create_mesh
    from video_depth_anything_tpu.train.trainer import Trainer, make_optimizer

    datasets = [
        get_dataset(name, root) for name, root in zip(args.dataset, args.root)
    ]
    augment = None
    if args.augment:
        from video_depth_anything_tpu.data.augment import AugmentConfig

        augment = AugmentConfig()
    sampler = ClipSampler(
        datasets,
        clip_len=args.clip_len,
        batch_size=args.batch_size,
        input_size=args.input_size,
        augment=augment,
    )

    import dataclasses

    from video_depth_anything_tpu.config import get_model_config

    cfg = get_model_config(args.encoder)
    if args.remat_motion:
        cfg = dataclasses.replace(cfg, remat_motion=True)
    model = VDAModel(args.encoder, dtype=jnp.bfloat16, cfg=cfg)
    if args.init_checkpoint:
        model.params = (
            load_torch_checkpoint(args.init_checkpoint, model.cfg)
            if args.init_checkpoint.endswith(".pth")
            else load_native(args.init_checkpoint)
        )
    else:
        model.init_params(jax.random.PRNGKey(0))

    n_dev = len(jax.devices())
    mesh = create_mesh(model=args.model_parallel) if n_dev > 1 else None
    trainer = Trainer(
        model.module,
        optimizer=make_optimizer(
            args.lr,
            train_encoder=args.train_encoder,
            warmup_steps=args.warmup_steps,
            decay_steps=args.decay_steps,
            accum_steps=args.accum_steps,
        ),
        mesh=mesh,
        tgm_weight=args.tgm_weight,
        train_encoder=args.train_encoder,
        zero1=args.zero1,
    )
    import os

    os.makedirs(args.out, exist_ok=True)
    state_path = os.path.join(args.out, "state_latest")
    if args.resume and os.path.isdir(state_path):
        state = trainer.restore_state(state_path, model.params)
        print(f"resumed from {state_path} at step {int(state.step)}")
    else:
        state = trainer.init_state(model.params)

    from video_depth_anything_tpu.data.clips import Prefetcher

    eval_batches = []
    eval_fn = None
    if args.eval_every:
        # Held-out clips: a differently-seeded sampler, drawn once — long
        # runs report learning (aligned AbsRel/δ1), not just loss.
        hold = ClipSampler(
            datasets, clip_len=args.clip_len, batch_size=1,
            input_size=args.input_size, seed=10_007,
        )
        hold_it = iter(hold)
        eval_batches = [next(hold_it) for _ in range(args.eval_clips)]
        eval_fn = jax.jit(
            lambda p, f: model.module.apply({"params": p}, f)
        )

    def validate(params):
        """Scale/shift-aligned AbsRel + δ1 in disparity space (the SSI loss
        target space) over the held-out clips — the train-time counterpart
        of the eval harness's per-scene alignment (evals/evaluate.py)."""
        import numpy as np

        from video_depth_anything_tpu.ops.scale_shift import (
            compute_scale_and_shift,
        )

        rels, d1s = [], []
        for b in eval_batches:
            pred = np.asarray(
                eval_fn(params, jnp.asarray(b["frames"], model.dtype)),
                np.float32,
            )
            for i in range(pred.shape[0]):
                gt = b["disparity"][i]
                valid = (b["mask"][i] > 0) & (gt > 1e-6)
                s, t = compute_scale_and_shift(pred[i][valid], gt[valid])
                pa = np.maximum(pred[i] * s + t, 1e-6)
                rels.append(
                    float(np.mean(np.abs(pa[valid] - gt[valid]) / gt[valid]))
                )
                ratio = np.maximum(pa[valid] / gt[valid], gt[valid] / pa[valid])
                d1s.append(float(np.mean(ratio < 1.25)))
        return {
            "val_absrel_disp": round(float(np.mean(rels)), 5),
            "val_delta1_disp": round(float(np.mean(d1s)), 5),
        }

    log_path = os.path.join(args.out, "train_log.jsonl")

    def log_line(m):
        line = json.dumps(m)
        print(line)
        with open(log_path, "a") as fh:
            fh.write(line + "\n")

    t0 = time.time()
    # Overlap host-side clip sampling (dataset decode + cv2 resizes) with
    # device compute: two batches stay in flight in a background thread.
    it = Prefetcher(iter(sampler), depth=2)
    start_step = int(state.step)
    for step in range(start_step + 1, args.steps + 1):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        if mesh is not None:
            with mesh:
                state, metrics = trainer.step(state, batch)
        else:
            state, metrics = trainer.step(state, batch)
        is_log = step % args.log_every == 0 or step == 1
        is_eval = args.eval_every and step % args.eval_every == 0
        if is_log or is_eval:
            m = {k: float(v) for k, v in metrics.items()}
            m.update(step=step, sps=round((step - start_step) / (time.time() - t0), 3))
            if is_eval:
                m.update(validate(state.params))
            log_line(m)
        if step % args.save_every == 0 or step == args.steps:
            trainer.save_state(state_path, state)
            path = os.path.join(args.out, f"step_{step:07d}")
            save_native(os.path.abspath(path), jax.device_get(state.params))
            print(f"saved {path} (+ resumable state_latest)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
