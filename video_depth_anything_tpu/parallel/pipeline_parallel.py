"""Pipeline parallelism over the ViT encoder blocks (GPipe-style).

The reference has no distributed code at all (SURVEY.md §2.6); this mode is
net-new, and it exists because the encoder dominates window cost (vitl:
~331 of 433 ms, docs/PERFORMANCE.md slack ledger) and its structure is a
perfect pipeline:

* the DINOv2 block chain is a pure sequential composition of ``depth``
  identical blocks (ref ``dinov2.py:297-321``) — stage ``s`` owns the
  contiguous slice ``[s·L/S, (s+1)·L/S)`` of blocks;
* frames are INDEPENDENT through the encoder (temporal attention lives
  only in the DPT head, ref ``dpt_temporal.py:75-87``), so the window's
  ``B·T`` frames split into microbatches with zero cross-microbatch state —
  no recompute, no stale activations, textbook GPipe with bubble fraction
  ``(S−1)/(M+S−1)``.

TPU-native design: one ``shard_map`` over the mesh's ``model`` axis; each
device holds its stage's block parameters (stacked ``(S, L/S, …)`` pytree
sharded on axis 0 — HBM per chip drops by ~``1/S`` for the encoder);
activations hop stages via ``jax.lax.ppermute`` (neighbor ICI transfers,
never DCN); a ``lax.scan`` drives the ``M+S−1`` pipeline ticks.  The four
intermediate-layer taps the DPT head consumes can land mid-stage (vitl taps
block 4 inside stage 0 at S=4), so every stage scatters its owned taps into
a compact ``(max taps per stage, M, …)`` local buffer and one ``all_gather``
merges them (tap → stage ownership is static; with the shipped configs'
balanced placements the gather moves each tap exactly once instead of
psum-ing zero padding).  Communication: each stage
hop moves one activation tensor per microbatch over neighbor ICI; the tap
gather moves the 4-tap set once at the end (see docs/PERFORMANCE.md
"Pipeline parallelism").

When to use which parallelism (also see docs/MIGRATION.md): windows over
spare chips → data parallel (embarrassingly parallel, zero comms); one
window faster → tensor parallel (two all-reduces per block); encoder HBM
per chip, or TP's per-block all-reduces dominating at small activations →
pipeline parallel.  DP composes with PP the same way it composes with TP
(``data`` × ``model``).
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from video_depth_anything_tpu.inference.pipeline import VideoDepthPipeline
from video_depth_anything_tpu.models.dinov2 import Block, embed_tokens
from video_depth_anything_tpu.parallel.mesh import tp_mesh


def stack_block_params(pretrained_params, depth: int, num_stages: int):
    """Stack ``block_0..block_{depth-1}`` params into one pytree with a
    leading ``(num_stages, depth // num_stages)`` stage axis (axis 0 is the
    one sharded over ``model``)."""
    if depth % num_stages:
        raise ValueError(
            f"encoder depth {depth} not divisible by {num_stages} stages"
        )
    per = depth // num_stages
    blocks = [pretrained_params[f"block_{i}"] for i in range(depth)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return jax.tree.map(
        lambda q: q.reshape((num_stages, per) + q.shape[1:]), stacked
    )


class PipelineParallelWindowRunner:
    """Window forward with the encoder pipelined over ``num_stages`` chips.

    Drop-in for ``VDAModel.infer_window``: ``infer_window(x)`` takes
    normalized ``(B, T, H, W, 3)`` frames and returns ``(B, T, H, W)``
    inverse depth equal (up to reduction order) to the single-device
    forward.  ``num_microbatches`` must divide ``B·T`` when given; the
    default picks the divisor of ``B·T`` nearest ``2·S`` (bubble
    ``(S−1)/(M+S−1)``), so any stage count that divides the encoder depth
    works with any frame count.
    """

    def __init__(
        self,
        model,
        num_stages: Optional[int] = None,
        mesh: Optional[Mesh] = None,
        num_microbatches: Optional[int] = None,
    ):
        if mesh is None:
            if not num_stages or num_stages < 2:
                raise ValueError("pipeline parallelism needs num_stages >= 2")
            mesh = tp_mesh(num_stages)
        self.mesh = mesh
        self.model = model
        self.cfg = model.cfg
        self.S = mesh.shape["model"]
        depth = self.cfg.vit.depth
        if depth % self.S:
            raise ValueError(
                f"encoder depth {depth} not divisible by {self.S} stages"
            )
        self.Ls = depth // self.S
        self.num_microbatches = num_microbatches
        self.tap_idx = tuple(int(i) for i in self.cfg.intermediate_layer_idx)
        self._shard_params(model.params)

    def _shard_params(self, params) -> None:
        """(Re)shard ``params`` over the stage mesh: blocks stacked and
        ``model``-sharded, everything else replicated."""
        self._params_ref = (params, params["pretrained"], params["head"])
        stacked = stack_block_params(
            params["pretrained"], self.cfg.vit.depth, self.S
        )
        self.stage_params = jax.device_put(
            stacked, NamedSharding(self.mesh, PS("model"))
        )
        rest_pre = {
            k: v
            for k, v in params["pretrained"].items()
            if not k.startswith("block_")
        }
        repl = NamedSharding(self.mesh, PS())
        self.rest_params = jax.device_put(
            {"pretrained": rest_pre, "head": params["head"]}, repl
        )

    def refresh_params(self) -> None:
        """Re-stack if ``model.params`` (or its pretrained/head subtree)
        was replaced since construction (checkpoint load into an
        already-built pipeline) — the base window pipeline re-reads
        ``model.params`` every call; this is the staged equivalent.
        Identity-based: rebinding the dict or either subtree is detected;
        mutating individual leaves in place is not (flax params are
        conventionally treated as immutable pytrees)."""
        p = self.model.params
        cur = (p, p["pretrained"], p["head"])
        if any(a is not b for a, b in zip(cur, self._params_ref)):
            self._shard_params(p)

    # -- pipelined encoder (inside shard_map over 'model') ------------------

    def _pp_encode_fn(self, M: int):
        cfg = self.cfg.vit
        block = Block(cfg, self.model.module.attn_impl)
        S, Ls = self.S, self.Ls
        tap_idx = self.tap_idx
        # tap → (owning stage, local slot) is STATIC: stages scatter into a
        # compact (max-taps-per-stage) local buffer, one all_gather moves
        # S·max_tps slot buffers, and the select below reassembles the tap
        # order.  max_tps comes from the ACTUAL placement: balanced
        # placements (all shipped configs — vits/vitb taps fall one per
        # 3-block stage, vitl one per 6-block stage) gather each tap
        # exactly once, ~2× fewer bytes than psum-ing a zero-padded full
        # (taps, …) buffer; a maximally skewed placement degrades toward
        # psum cost but never exceeds it by more than the ring traversal.
        stage_of = [t // Ls for t in tap_idx]
        slot_of = []
        counts = [0] * S
        for s in stage_of:
            slot_of.append(counts[s])
            counts[s] += 1
        max_tps = max(counts)

        def pp(stage_params, tokens_mb):
            # stage_params leaves: (1, Ls, …) local shard; tokens_mb
            # (M, m, N+1, D) replicated.  SPMD: identical code per device,
            # the stage id comes from the mesh axis index.
            sid = jax.lax.axis_index("model")
            sp = jax.tree.map(lambda q: q[0], stage_params)
            m, n1, d = tokens_mb.shape[1:]
            buf0 = jnp.zeros((m, n1, d), tokens_mb.dtype)
            taps0 = jnp.zeros((max_tps, M, m, n1, d), tokens_mb.dtype)

            def tick(carry, i):
                buf, taps = carry
                feed = jax.lax.dynamic_index_in_dim(
                    tokens_mb, jnp.minimum(i, M - 1), axis=0, keepdims=False
                )
                # stage 0 injects microbatch i (the ring-wrapped value it
                # received from the last stage is discarded)
                x = jnp.where(sid == 0, feed, buf)
                mb = i - sid  # microbatch flowing through this stage now
                valid = (mb >= 0) & (mb < M)
                mbc = jnp.clip(mb, 0, M - 1)
                for j in range(Ls):
                    bp = jax.tree.map(lambda q: q[j], sp)
                    x = block.apply({"params": bp}, x)
                    gidx = sid * Ls + j
                    for t, tap in enumerate(tap_idx):
                        # hit only on the owner stage; slot_of[t] may be
                        # shared across stages (each writes only its own)
                        hit = valid & (gidx == tap)
                        slot = slot_of[t]
                        taps = taps.at[slot, mbc].set(
                            jnp.where(hit, x, taps[slot, mbc])
                        )
                nxt = jax.lax.ppermute(
                    x, "model", [(k, (k + 1) % S) for k in range(S)]
                )
                return (buf if S == 1 else nxt, taps), None

            (_, taps), _ = jax.lax.scan(
                tick, (buf0, taps0), jnp.arange(M + S - 1)
            )
            # (S, max_tps, M, m, n1, d), identical on every device
            allt = jax.lax.all_gather(taps, "model")
            return jnp.stack(
                [allt[stage_of[t], slot_of[t]] for t in range(len(tap_idx))]
            )

        return jax.shard_map(
            pp,
            mesh=self.mesh,
            in_specs=(PS("model"), PS()),
            out_specs=PS(),
            check_vma=False,
        )

    def _pick_m(self, bt: int) -> int:
        """Microbatch count: the divisor of ``bt`` nearest ``2·S`` (ties →
        larger, shallower bubble).  Every bt has divisors (worst case
        ``M=1`` or ``M=bt``), so auto-pick never fails — odd stage counts
        and prime frame counts stay runnable, just with a deeper bubble."""
        if self.num_microbatches is not None:
            m = int(self.num_microbatches)
            if bt % m:
                raise ValueError(f"microbatches {m} must divide B*T={bt}")
            return m
        target = 2 * self.S
        divisors = [m for m in range(1, bt + 1) if bt % m == 0]
        m = min(divisors, key=lambda q: (abs(q - target), -q))
        if m < self.S:
            import warnings

            warnings.warn(
                f"pipeline parallelism over {self.S} stages with only {m} "
                f"microbatch(es) for B*T={bt}: bubble fraction "
                f"{(self.S - 1) / (m + self.S - 1):.0%} — pick a frame "
                f"count divisible into >= {self.S} microbatches for real "
                f"pipelining",
                stacklevel=3,
            )
        return m

    @functools.cached_property
    def _jit_forward(self):
        from video_depth_anything_tpu.models.dpt import DPTHeadTemporal
        from video_depth_anything_tpu.ops.resize import bilinear_resize

        cfg = self.cfg
        head = DPTHeadTemporal(cfg, self.model.module.attn_impl)

        @functools.partial(
            jax.jit, static_argnames=("M", "skip_tmp_block")
        )
        def fwd(stage_params, rest, x, M, skip_tmp_block=False):
            b, t, h, w, _ = x.shape
            p = cfg.vit.patch_size
            ph, pw = h // p, w // p
            pre = rest["pretrained"]
            frames = x.reshape(b * t, h, w, 3)
            tokens = embed_tokens(
                cfg.vit,
                pre["patch_kernel"],
                pre["patch_bias"],
                pre["cls_token"],
                pre["pos_embed"],
                frames,
            )
            bt, n1, d = tokens.shape
            taps = self._pp_encode_fn(M)(
                stage_params, tokens.reshape(M, bt // M, n1, d)
            )
            taps = taps.reshape(len(self.tap_idx), bt, n1, d)
            norm = nn.LayerNorm(epsilon=cfg.vit.norm_eps, dtype=tokens.dtype)
            feats = tuple(
                norm.apply({"params": pre["norm"]}, taps[k])[:, 1:]
                for k in range(len(self.tap_idx))
            )
            depth = head.apply(
                {"params": rest["head"]}, feats, b, t, ph, pw, skip_tmp_block
            )
            depth = depth.astype(x.dtype)
            depth = bilinear_resize(depth, h, w)
            return depth.reshape(b, t, h, w)

        return fwd

    def infer_window(self, frames, skip_tmp_block: bool = False):
        self.refresh_params()
        x = jnp.asarray(frames, dtype=self.model.dtype)
        bt = x.shape[0] * x.shape[1]
        return self._jit_forward(
            self.stage_params,
            self.rest_params,
            x,
            M=self._pick_m(bt),
            skip_tmp_block=skip_tmp_block,
        )


class PipelineParallelVideoDepthPipeline(VideoDepthPipeline):
    """``VideoDepthPipeline`` with the window forward staged over
    ``pipeline_parallel`` chips — same preprocessing, window batching,
    stitching, and output surface (``run.py --pipeline_parallel N``)."""

    def __init__(
        self,
        model,
        pipeline_parallel: int = 2,
        num_microbatches: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(model, **kwargs)
        self._pp_runner = PipelineParallelWindowRunner(
            model,
            num_stages=pipeline_parallel,
            num_microbatches=num_microbatches,
        )

    @functools.cached_property
    def _window_fn(self):
        from video_depth_anything_tpu.ops.resize import bilinear_resize
        from video_depth_anything_tpu.utils.device import transfer_cast

        runner = self._pp_runner

        @functools.partial(
            jax.jit,
            static_argnames=("out_h", "out_w", "M", "skip_tmp_block"),
        )
        def fwd(stage_params, rest, x, out_h, out_w, M,
                skip_tmp_block=False):
            depth = runner._jit_forward.__wrapped__(
                stage_params, rest, x, M, skip_tmp_block
            )
            depth = depth[..., None].astype(jnp.float32)
            depth = bilinear_resize(depth, out_h, out_w)[..., 0]
            return transfer_cast(depth)

        def call(params, x, out_h, out_w, skip_tmp_block=False):
            runner.refresh_params()
            bt = x.shape[0] * x.shape[1]
            return fwd(
                runner.stage_params, runner.rest_params, x,
                out_h, out_w, runner._pick_m(bt),
                skip_tmp_block=skip_tmp_block,
            )

        return call
