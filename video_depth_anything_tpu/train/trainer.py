"""pjit'd training step for temporal fine-tuning.

Net-new (the reference has no training loop — SURVEY.md §2.5): frozen
DINOv2 encoder, trainable DPT head + motion modules, optax AdamW, loss =
SSI + λ·TGM on disparity (``train.losses``).  Sharding: clips over the mesh
``data`` axis, optional Megatron TP over ``model`` via the param rules in
``parallel.mesh``; gradients reduce over ICI via GSPMD-inserted collectives.

Encoder freezing is expressed through ``optax.masked`` so the param pytree
stays whole (checkpoint-compatible) while encoder updates are zeroed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from video_depth_anything_tpu.models.vda import VideoDepthAnything
from video_depth_anything_tpu.parallel.mesh import TP_RULES, param_partition_specs
from video_depth_anything_tpu.train.losses import video_depth_loss


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(
    learning_rate: float = 1e-5,
    weight_decay: float = 1e-2,
    train_encoder: bool = False,
    clip_norm: float = 1.0,
    warmup_steps: int = 0,
    decay_steps: int = 0,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW with global-norm clipping, optionally under a linear-warmup +
    cosine-decay schedule (``warmup_steps``/``decay_steps``) and gradient
    accumulation (``accum_steps`` micro-batches per optimizer update, via
    ``optax.MultiSteps`` — the train loop stays one batch per step call)."""
    if warmup_steps or decay_steps:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=max(1, warmup_steps),
            # constant-after-warmup when no decay horizon is given
            decay_steps=decay_steps or 10**9,
            end_value=0.0 if decay_steps else learning_rate,
        )
    else:
        lr = learning_rate
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr, weight_decay=weight_decay),
    )
    if not train_encoder:
        # Frozen encoder: zero its updates entirely (optax.masked would pass
        # the raw gradients through for masked-out leaves, silently training
        # it).
        def labels(params):
            return {
                k: jax.tree.map(
                    lambda _: "freeze" if k == "pretrained" else "train", v
                )
                for k, v in params.items()
            }

        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def _zero1_spec(spec: PS, shape, data: int) -> PS:
    """Add ``'data'`` sharding to the first dimension a leaf can shard:
    unsharded by TP, divisible by the data-axis size.  Returns the spec
    unchanged when no dimension qualifies (scalars, tiny/odd leaves —
    they stay replicated, which is always correct)."""
    parts = list(spec) + [None] * (len(shape) - len(spec))
    for i, (p, s) in enumerate(zip(parts, shape)):
        if p is None and s >= data and s % data == 0:
            parts[i] = "data"
            return PS(*parts)
    return spec


class Trainer:
    """Bundles module + optimizer + mesh into a jitted ``step``.

    ``batch``: dict with ``frames (B,T,H,W,3)`` normalized fp32, ``disparity
    (B,T,H,W)`` fp32 target, ``mask (B,T,H,W)``.
    """

    def __init__(
        self,
        module: VideoDepthAnything,
        optimizer: Optional[optax.GradientTransformation] = None,
        mesh: Optional[Mesh] = None,
        tgm_weight: float = 10.0,
        compute_dtype=jnp.bfloat16,
        remat_encoder: bool = True,
        train_encoder: bool = False,
        zero1: bool = False,
    ):
        self.module = module
        self.tx = optimizer or make_optimizer(train_encoder=train_encoder)
        self.mesh = mesh
        self.tgm_weight = tgm_weight
        self.compute_dtype = compute_dtype
        self.remat_encoder = remat_encoder
        # Must match the optimizer's ``train_encoder``: when False the step
        # treats ``params["pretrained"]`` as a non-differentiated constant —
        # no encoder backward pass, no whole-model remat.  (The optimizer
        # mask alone would zero the updates but still pay for computing the
        # encoder gradients, ~2× the encoder forward per step.)
        self.train_encoder = train_encoder
        # ZeRO-1: shard the optimizer state over the ``data`` axis (on top
        # of the params' TP sharding, which the moments inherit).  Adam
        # moments are 2× the params in fp32 — 3 GB at vitl — replicated
        # per chip otherwise.  The moment update runs data-sharded; GSPMD
        # all-gathers only the (bf16-sized) ``updates`` for apply_updates.
        # Exactness: elementwise optimizer math is sharding-invariant; the
        # only cross-leaf op (global grad-norm clip) reduces over ICI.
        self.zero1 = zero1 and mesh is not None and mesh.shape.get("data", 1) > 1
        self._opt_shardings = None

    def init_state(self, params) -> TrainState:
        if self.mesh is not None:
            # place params with their TP shardings first, then init the
            # optimizer from the sharded tree so moment buffers inherit the
            # same layout (one tx.init total)
            params = self._place_params(params)
        opt_state = self._place_opt_state(self.tx.init(params))
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    def _place_params(self, params):
        pspecs = param_partition_specs(params, TP_RULES)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            params,
            pspecs,
        )

    def _place_opt_state(self, opt_state):
        if self.zero1:
            # Optimizer-agnostic: every array leaf already carries the
            # sharding it inherited from the params through ``tx.init``'s
            # eager ops; extend each with a 'data'-axis shard where a
            # dimension allows it, and remember the specs so ``step`` can
            # pin the updated state to the same layout.
            data = self.mesh.shape["data"]
            mesh = self.mesh

            def sharding_of(x):
                # NamedSharding leaves (never None/PS: both are pytree
                # containers and would break the paired tree.maps below)
                if not hasattr(x, "ndim") or x.ndim == 0:
                    return NamedSharding(mesh, PS())
                cur = (
                    x.sharding.spec
                    if isinstance(getattr(x, "sharding", None), NamedSharding)
                    else PS()
                )
                return NamedSharding(mesh, _zero1_spec(cur, x.shape, data))

            self._opt_shardings = jax.tree.map(sharding_of, opt_state)
            opt_state = jax.tree.map(jax.device_put, opt_state, self._opt_shardings)
        return opt_state

    # -- checkpoint / resume ------------------------------------------------

    def save_state(self, path: str, state: TrainState) -> None:
        """Persist the full train state (params + optimizer state + step)
        for resumable training (net-new vs the load-only reference,
        SURVEY.md §5)."""
        import os

        import jax
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.abspath(path),
            {
                "params": jax.device_get(state.params),
                "opt_state": jax.device_get(state.opt_state),
                "step": jax.device_get(state.step),
            },
            force=True,
        )
        ckptr.wait_until_finished()

    def restore_state(self, path: str, params_template) -> TrainState:
        """Restore a ``save_state`` checkpoint; ``params_template`` provides
        the pytree structure/dtypes (typed restore, no topology guessing)."""
        import os

        import jax
        import orbax.checkpoint as ocp

        template = {
            "params": params_template,
            "opt_state": self.tx.init(params_template),
            "step": jnp.zeros((), jnp.int32),
        }
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype), template
        )
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(path), abstract)
        params, opt_state = restored["params"], restored["opt_state"]
        if self.mesh is not None:
            # re-establish the training layout (TP params; ZeRO-1 moments
            # via a sharding template computed from a placed-params init —
            # the checkpoint itself is layout-free host arrays)
            params = self._place_params(params)
            if self.zero1 and self._opt_shardings is None:
                self._place_opt_state(self.tx.init(params))
            if self._opt_shardings is not None:
                opt_state = jax.tree.map(
                    jax.device_put, opt_state, self._opt_shardings
                )
        return TrainState(params, opt_state, restored["step"])

    @functools.cached_property
    def step(self):
        module = self.module
        tx = self.tx
        tgm_weight = self.tgm_weight
        dtype = self.compute_dtype
        mesh = self.mesh

        train_encoder = self.train_encoder
        zero1_shardings = self._opt_shardings if self.zero1 else None
        # Whole-model remat only pays when gradients flow through the
        # encoder; with a frozen encoder the backward stops at the 4 feature
        # taps and rematerializing the forward would just run it twice.
        remat = self.remat_encoder and train_encoder

        def loss_fn(trainable, frozen, frames, disparity, mask):
            fwd = module.apply
            if remat:
                fwd = jax.checkpoint(fwd, static_argnums=())
            pred = fwd({"params": {**frozen, **trainable}}, frames.astype(dtype))
            return video_depth_loss(pred, disparity, mask, tgm_weight)

        def train_step(state: TrainState, batch):
            frames, disparity, mask = (
                batch["frames"],
                batch["disparity"],
                batch["mask"],
            )
            if mesh is not None:
                shard = NamedSharding(mesh, PS("data"))
                frames = jax.lax.with_sharding_constraint(frames, shard)
                disparity = jax.lax.with_sharding_constraint(disparity, shard)
                mask = jax.lax.with_sharding_constraint(mask, shard)
            if train_encoder:
                trainable, frozen = state.params, {}
            else:
                trainable = {
                    k: v for k, v in state.params.items() if k != "pretrained"
                }
                frozen = {
                    k: v for k, v in state.params.items() if k == "pretrained"
                }
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, frozen, frames, disparity, mask
            )
            # Rebuild the full-tree gradient with zeros for frozen leaves so
            # the optimizer state/labels keep the whole-pytree layout
            # (checkpoint compatibility); XLA folds the zero updates away.
            if not train_encoder:
                grads = {**jax.tree.map(jnp.zeros_like, frozen), **grads}
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            if zero1_shardings is not None:
                # Pin the updated optimizer state to its ZeRO-1 layout and
                # the new params back to TP-only (apply_updates would
                # otherwise inherit the updates' data-sharding, silently
                # turning the weights data-sharded for the next forward).
                opt_state = jax.tree.map(
                    jax.lax.with_sharding_constraint, opt_state, zero1_shardings
                )
                updates = jax.tree.map(
                    lambda u, s: jax.lax.with_sharding_constraint(
                        u, NamedSharding(mesh, s)
                    ),
                    updates,
                    param_partition_specs(updates, TP_RULES),
                )
            params = optax.apply_updates(state.params, updates)
            # Norm of the *trainable* gradients (frozen leaves are exact
            # zeros here, unlike the pre-mask encoder grads the optimizer
            # used to discard).
            metrics["grad_norm"] = optax.global_norm(grads)
            return TrainState(params, opt_state, state.step + 1), metrics

        return jax.jit(train_step, donate_argnums=(0,))
