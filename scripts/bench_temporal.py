#!/usr/bin/env python
"""Micro-benchmark the motion-module components at the vitl window shapes.

Times each candidate formulation with the amortized-dispatch method from
bench.py (the axon tunnel costs ~28 ms per roundtrip; block_until_ready does
not block), printing one JSON line per (shape, variant).

  nohup python scripts/bench_temporal.py > /tmp/bench_temporal.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import time

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Motion-module shapes per encoder: (name, S, C) — T=32, B=1, heads=8 always.
SHAPES_BY_ENCODER = {
    # vitl/518: features=256, out_channels=[256,512,1024,1024]
    "vitl": [
        ("m0_1024@37x37", 37 * 37, 1024),
        ("m1_1024@19x19", 19 * 19, 1024),
        ("m2_256@37x37", 37 * 37, 256),
        ("m3_256@74x74", 74 * 74, 256),
    ],
    # vits/518: features=64, out_channels=[48,96,192,384]
    "vits": [
        ("m0_192@37x37", 37 * 37, 192),
        ("m1_384@19x19", 19 * 19, 384),
        ("m2_64@37x37", 37 * 37, 64),
        ("m3_64@74x74", 74 * 74, 64),
    ],
}
SHAPES = SHAPES_BY_ENCODER["vitl"]
T = 32
HEADS = 8


def amortized(fn, force, iters=20, warmup=3):
    out = fn()
    force(out)  # compile
    for _ in range(warmup):
        out = fn()
    force(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    force(out)
    return (time.time() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="einsum,proj,groupnorm,geglu,module,pallas")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--encoder", default="vitl", choices=sorted(SHAPES_BY_ENCODER))
    args = p.parse_args(argv)
    variants = args.variants.split(",")
    global SHAPES
    SHAPES = SHAPES_BY_ENCODER[args.encoder]

    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)

    def force(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32)))

    def emit(key, val):
        print(
            json.dumps(
                {"bench": key, "ms": round(val * 1e3, 3) if isinstance(val, float) else val}
            ),
            flush=True,
        )

    for name, s, c in SHAPES:
        d = c // HEADS
        scale = d**-0.5
        x = jnp.asarray(rng.randn(1, T, s, c) * 0.5, dtype=jnp.bfloat16)
        q = jnp.asarray(rng.randn(1, T, s, c) * 0.5, dtype=jnp.bfloat16)
        k = jnp.asarray(rng.randn(1, T, s, c) * 0.5, dtype=jnp.bfloat16)
        v = jnp.asarray(rng.randn(1, T, s, c) * 0.5, dtype=jnp.bfloat16)

        if "einsum" in variants:
            # the in-model attention core (temporal.py _attend)
            @jax.jit
            def core(q, k, v):
                b, t, ss, cc = q.shape
                q5 = q.reshape(b, t, ss, HEADS, cc // HEADS)
                k5 = k.reshape(b, t, ss, HEADS, cc // HEADS)
                v5 = v.reshape(b, t, ss, HEADS, cc // HEADS)
                scores = jnp.einsum(
                    "bqshd,bkshd->bshqk", q5, k5,
                    preferred_element_type=jnp.float32,
                ) * jnp.float32(scale)
                probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
                out = jnp.einsum(
                    "bshqk,bkshd->bqshd", probs, v5,
                    preferred_element_type=jnp.float32,
                ).astype(q.dtype)
                return out.reshape(b, t, ss, cc)

            dt = amortized(lambda: core(q, k, v), force, args.iters)
            emit(f"{name}/einsum_core", dt)

        if "attnpath" in variants:
            # Whole attention path (qkv proj → core → out proj) in the two
            # candidate layouts.  "natural": projections in (B,T,S,C), core
            # via the bshqk einsum (XLA inserts the (b,s,h,t,d) relayouts of
            # four ~90 MB tensors itself).  "transposed": ONE explicit
            # transpose to (B,S,T,C), everything layout-local, ONE transpose
            # back — tests whether 2 explicit relayouts beat XLA's implicit
            # ones.
            wq = jnp.asarray(rng.randn(c, c) * 0.02, dtype=jnp.bfloat16)
            wk = jnp.asarray(rng.randn(c, c) * 0.02, dtype=jnp.bfloat16)
            wv = jnp.asarray(rng.randn(c, c) * 0.02, dtype=jnp.bfloat16)
            wo = jnp.asarray(rng.randn(c, c) * 0.02, dtype=jnp.bfloat16)

            @jax.jit
            def path_nat(x, wq, wk, wv, wo):
                b, t, ss, cc = x.shape
                d_ = cc // HEADS
                q5 = (x @ wq).reshape(b, t, ss, HEADS, d_)
                k5 = (x @ wk).reshape(b, t, ss, HEADS, d_)
                v5 = (x @ wv).reshape(b, t, ss, HEADS, d_)
                scores = jnp.einsum(
                    "bqshd,bkshd->bshqk", q5, k5,
                    preferred_element_type=jnp.float32,
                ) * jnp.float32(scale)
                probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
                out = jnp.einsum(
                    "bshqk,bkshd->bqshd", probs, v5,
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
                return out.reshape(b, t, ss, cc) @ wo

            @jax.jit
            def path_tr(x, wq, wk, wv, wo):
                b, t, ss, cc = x.shape
                d_ = cc // HEADS
                xt = x.transpose(0, 2, 1, 3)  # (b, s, t, c) — one relayout
                q5 = (xt @ wq).reshape(b, ss, t, HEADS, d_)
                k5 = (xt @ wk).reshape(b, ss, t, HEADS, d_)
                v5 = (xt @ wv).reshape(b, ss, t, HEADS, d_)
                scores = jnp.einsum(
                    "bsqhd,bskhd->bshqk", q5, k5,
                    preferred_element_type=jnp.float32,
                ) * jnp.float32(scale)
                probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
                out = jnp.einsum(
                    "bshqk,bskhd->bsqhd", probs, v5,
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
                out = out.reshape(b, ss, t, cc) @ wo
                return out.transpose(0, 2, 1, 3)

            dt = amortized(lambda: path_nat(q, wq, wk, wv, wo), force, args.iters)
            emit(f"{name}/attnpath_natural", dt)
            dt = amortized(lambda: path_tr(q, wq, wk, wv, wo), force, args.iters)
            emit(f"{name}/attnpath_transposed", dt)

        if "headstack" in variants:
            # Head-stacked attention: embed the head structure into masked
            # operands so the score GEMM contracts over full C (not d) and
            # the PV GEMM contracts over h*T lanes.  scores[s,q,h*T+k] =
            # sum_c Q[q,s,c] * K[k,s,c] * M[c,h]; out[q,s,c] =
            # sum_{h,k} P[s,q,h*T+k] * V[k,s,c] * M[c,h].  Cross-head terms
            # are zeroed by the mask; math is exactly per-head attention.
            d_ = c // HEADS
            mask_np = np.zeros((c, HEADS), np.float32)
            for h_ in range(HEADS):
                mask_np[h_ * d_:(h_ + 1) * d_, h_] = 1.0
            mask = jnp.asarray(mask_np, dtype=jnp.bfloat16)

            @jax.jit
            def headstack(q, k, v, mask):
                b, t, ss, cc = q.shape
                # K'' (b, s, c, h*t): broadcast K^T across heads, mask.
                kt = k.transpose(0, 2, 3, 1)  # (b, s, c, t)
                kp = (kt[:, :, :, None, :] * mask[None, None, :, :, None]
                      ).reshape(b, ss, cc, HEADS * t)
                qt = q.transpose(0, 2, 1, 3)  # (b, s, t, c)
                scores = jnp.einsum(
                    "bsqc,bsck->bsqk", qt, kp,
                    preferred_element_type=jnp.float32,
                ) * jnp.float32(scale)
                probs = jax.nn.softmax(
                    scores.reshape(b, ss, t, HEADS, t), axis=-1
                ).reshape(b, ss, t, HEADS * t).astype(q.dtype)
                vt = v.transpose(0, 2, 1, 3)  # (b, s, t, c)
                vp = (vt[:, :, None, :, :] * mask.T[None, None, :, None, :]
                      ).reshape(b, ss, HEADS * t, cc)
                out = jnp.einsum(
                    "bsqk,bskc->bsqc", probs, vp,
                    preferred_element_type=jnp.float32,
                ).astype(q.dtype)
                return out.transpose(0, 2, 1, 3)

            dt = amortized(lambda: headstack(q, k, v, mask), force, args.iters)
            emit(f"{name}/headstack", dt)

        if "proj" in variants:
            w = jnp.asarray(rng.randn(c, c) * 0.02, dtype=jnp.bfloat16)

            @jax.jit
            def proj4(x, w):
                y = x
                for _ in range(4):
                    y = y @ w
                return y

            dt = amortized(lambda: proj4(x, w), force, args.iters)
            emit(f"{name}/proj4", dt)

        if "groupnorm" in variants:
            hw = int(round(s**0.5))
            xg = x.reshape(1, T, hw, hw, c)
            sc = jnp.ones((c,), jnp.float32)
            bi = jnp.zeros((c,), jnp.float32)

            @jax.jit
            def gn(x, sc, bi):
                xf = x.astype(jnp.float32)
                shape = xf.shape
                g = 32
                grouped = xf.reshape(shape[:-3] + (-1,) + (g, c // g))
                mean = grouped.mean(axis=(-3, -1), keepdims=True)
                var = grouped.var(axis=(-3, -1), keepdims=True)
                grouped = (grouped - mean) * jax.lax.rsqrt(var + 1e-6)
                xf = grouped.reshape(shape)
                return (xf * sc + bi).astype(x.dtype)

            dt = amortized(lambda: gn(xg, sc, bi), force, args.iters)
            emit(f"{name}/groupnorm", dt)

            @jax.jit
            def gn2(x, sc, bi):
                # two-moment formulation: spatial sums first (sublane
                # reduction), then the tiny per-group lane reduce; one fused
                # normalize pass with per-sample (a, b) broadcast.
                g = 32
                xf = x.astype(jnp.float32)
                s1 = jnp.sum(xf, axis=(-3, -2))  # (..., C)
                s2 = jnp.sum(xf * xf, axis=(-3, -2))
                cnt = x.shape[-3] * x.shape[-2] * (c // g)
                gshape = s1.shape[:-1] + (g, c // g)
                mean = s1.reshape(gshape).sum(-1, keepdims=True) / cnt
                ex2 = s2.reshape(gshape).sum(-1, keepdims=True) / cnt
                inv = jax.lax.rsqrt(ex2 - mean * mean + 1e-6)
                aa = jnp.broadcast_to(inv, gshape).reshape(s1.shape) * sc
                bb = bi - jnp.broadcast_to(mean, gshape).reshape(s1.shape) * aa
                aa = aa[..., None, None, :]
                bb = bb[..., None, None, :]
                return (xf * aa + bb).astype(x.dtype)

            dt = amortized(lambda: gn2(xg, sc, bi), force, args.iters)
            emit(f"{name}/groupnorm2", dt)

        if "geglu" in variants:
            w1 = jnp.asarray(rng.randn(c, 8 * c) * 0.02, dtype=jnp.bfloat16)
            w2 = jnp.asarray(rng.randn(4 * c, c) * 0.02, dtype=jnp.bfloat16)

            @jax.jit
            def ff(x, w1, w2):
                h = x @ w1
                h, gate = jnp.split(h, 2, axis=-1)
                h = h * jax.nn.gelu(gate, approximate=True)
                return h @ w2

            dt = amortized(lambda: ff(x, w1, w2), force, args.iters)
            emit(f"{name}/geglu", dt)

        if "bisect" in variants:
            # Bisect the whole-module-minus-component-sum gap (m0: 22.6 vs
            # ~17.1 component sum): "shell" = GN→proj_in→proj_out+residual
            # (no transformer block), "block" = the transformer block alone
            # (2×(LN→XLA attn→res) + LN→GEGLU→res) from a materialized y.
            from video_depth_anything_tpu.config import MotionModuleConfig
            from video_depth_anything_tpu.models.temporal import (
                TemporalModule,
                TemporalTransformerBlock,
            )

            hw = int(round(s**0.5))
            xm = x.reshape(1, T, hw, hw, c)
            cfg = MotionModuleConfig()
            mod = TemporalModule(cfg, c)
            params = mod.init(jax.random.PRNGKey(0), xm)

            import flax.linen as fnn

            def shell_fn(mdl, xin):
                residual = xin
                y = mdl.proj_in(mdl.norm(xin))
                return mdl.proj_out(y) + residual

            app_shell = jax.jit(fnn.apply(shell_fn, mod))
            dt = amortized(lambda: app_shell(params, xm), force, args.iters)
            emit(f"{name}/shell", dt)

            blk = TemporalTransformerBlock(cfg, c, "xla")
            xb = x  # (1, T, S, C) token layout the block consumes
            bparams = {"params": params["params"]["block_0"]}
            app_blk = jax.jit(lambda p, xx: blk.apply(p, xx))
            dt = amortized(lambda: app_blk(bparams, xb), force, args.iters)
            emit(f"{name}/block_xla", dt)

        if "fusedmod" in variants:
            # Whole-module A/B: XLA module vs the fused Pallas module kernel
            # (ops/pallas_motion.py) at the same params.
            import os

            from video_depth_anything_tpu.config import MotionModuleConfig
            from video_depth_anything_tpu.models.temporal import TemporalModule

            hw = int(round(s**0.5))
            xm = x.reshape(1, T, hw, hw, c)
            cfg = MotionModuleConfig()
            mod = TemporalModule(cfg, c, "xla")
            params = mod.init(jax.random.PRNGKey(0), xm)
            appx = jax.jit(lambda p, xx: mod.apply(p, xx))
            dt = amortized(lambda: appx(params, xm), force, args.iters)
            emit(f"{name}/module_xla", dt)

            os.environ["VDA_FUSED_MOTION"] = "1"
            modf = TemporalModule(cfg, c, "auto")
            appf = jax.jit(lambda p, xx: modf.apply(p, xx))
            try:
                got = appf(params, xm)
                want = appx(params, xm)
                err = float(
                    jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)).max()
                    / (jnp.abs(want.astype(jnp.float32)).max() + 1e-6)
                )
                dt = amortized(lambda: appf(params, xm), force, args.iters)
                emit(f"{name}/module_fused", dt)
                emit(f"{name}/module_fused_relerr", err)
            except Exception as e:  # noqa: BLE001
                emit(f"{name}/module_fused", f"ERROR: {type(e).__name__}: {e}")
            finally:
                os.environ["VDA_FUSED_MOTION"] = "auto"

        if "module" in variants:
            from video_depth_anything_tpu.config import MotionModuleConfig
            from video_depth_anything_tpu.models.temporal import TemporalModule

            hw = int(round(s**0.5))
            xm = x.reshape(1, T, hw, hw, c)
            cfg = MotionModuleConfig()
            mod = TemporalModule(cfg, c)
            params = mod.init(jax.random.PRNGKey(0), xm)
            app = jax.jit(lambda p, xx: mod.apply(p, xx))
            dt = amortized(lambda: app(params, xm), force, args.iters)
            emit(f"{name}/module", dt)
            # attn_impl="xla": skips the Pallas dispatch so XLA sees the
            # whole proj→attend graph from x and can pick fused layouts
            # for the projection outputs (the kernel forces natural-layout
            # q/k/v materialization at its boundary).
            modx = TemporalModule(cfg, c, "xla")
            appx = jax.jit(lambda p, xx: modx.apply(p, xx))
            dt = amortized(lambda: appx(params, xm), force, args.iters)
            emit(f"{name}/module_xla", dt)

        if "pallas" in variants:
            try:
                from video_depth_anything_tpu.ops.pallas_temporal import (
                    temporal_attention_window,
                )

                for impl in ("mxu",):
                    fn = jax.jit(
                        lambda q, k, v, impl=impl: temporal_attention_window(
                            q, k, v, heads=HEADS, scale=scale, reduce_impl=impl
                        )
                    )
                    dt = amortized(lambda: fn(q, k, v), force, args.iters)
                    emit(f"{name}/pallas_{impl}", dt)
            except Exception as e:  # noqa: BLE001
                emit(f"{name}/pallas", f"ERROR: {e}")

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
