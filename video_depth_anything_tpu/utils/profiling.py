"""Profiling utilities (capability of reference
``Test_singleImage_processing.py:204-254``: per-component timing, FLOPs and
parameter decomposition encoder-vs-head, profiler traces).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def param_counts(params) -> Dict[str, float]:
    """Parameter counts (M) split encoder vs head (ref thop split,
    ``Test_singleImage_processing.py:216-254``)."""
    def count(tree):
        return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree)) / 1e6

    return {
        "encoder_Mparams": count(params.get("pretrained", {})),
        "head_Mparams": count(params.get("head", {})),
        "total_Mparams": count(params),
    }


def compiled_cost(fn: Callable, *args) -> Dict[str, float]:
    """XLA cost analysis of a jitted function (FLOPs, bytes accessed)."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    out = {}
    if cost:
        out["gflops"] = cost.get("flops", 0.0) / 1e9
        out["gbytes_accessed"] = cost.get("bytes accessed", 0.0) / 1e9
    try:
        mem = compiled.memory_analysis()
        out["peak_mb"] = getattr(mem, "temp_size_in_bytes", 0) / 2**20
    except Exception:
        pass
    return out


def time_fn(fn: Callable, iters: int = 5, warmup: int = 2) -> Dict[str, float]:
    """Median wall time of ``fn`` (must force its own execution)."""
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return {
        "median_s": float(np.median(ts)),
        "min_s": float(np.min(ts)),
        "iters": iters,
    }


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    if log_dir:
        jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        if log_dir:
            jax.profiler.stop_trace()


def component_timings(model, frames: int = 32, size: int = 518) -> Dict[str, Dict]:
    """Time encoder-only, head-only, and the full window forward."""
    cfg = model.cfg
    x = jnp.zeros((1, frames, size, size, 3), dtype=model.dtype)
    flat = x.reshape(frames, size, size, 3)

    enc = jax.jit(
        lambda p, f: model.module.apply(
            {"params": p}, f, cfg.intermediate_layer_idx,
            method=lambda m, f, idx: m.pretrained(f, idx),
        )
    )
    full = jax.jit(lambda p, xx: model.module.apply({"params": p}, xx))

    def force(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf[..., 0, 0]))

    results = {}
    results["encoder"] = time_fn(lambda: force(enc(model.params, flat)))
    results["full"] = time_fn(lambda: force(full(model.params, x)))
    results["head_derived_s"] = round(
        results["full"]["median_s"] - results["encoder"]["median_s"], 4
    )
    return results
