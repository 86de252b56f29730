"""Persistent XLA compilation cache.

Fresh programs on this class of backend can cost 1-10 minutes of (remote)
compilation; the on-disk cache makes every later process start in seconds
for shapes it has seen before.  Wired into every entry point (``bench.py``,
``run.py``, ``eval.py``, ``train.py``) — a legitimate product feature, not
just a bench convenience: inference services restart, and the model's shape
buckets (``utils/transform.Resize`` multiples of 14) recur across videos.

Opt out with ``VDA_COMPILE_CACHE=0``; redirect with ``VDA_COMPILE_CACHE_DIR``.
"""

from __future__ import annotations

import os
from typing import Optional


def _default_cache_dir() -> str:
    # repo-local by default (this file lives at <repo>/video_depth_anything_tpu/utils/)
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if os.access(repo, os.W_OK):
        return os.path.join(repo, ".jax_cache")
    return os.path.join(os.path.expanduser("~"), ".cache", "vda_jax")


def enable_persistent_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a writable directory.

    Returns the directory in use, or ``None`` if disabled/unsupported.
    Safe to call multiple times and before/after other jax config updates;
    never raises (a backend without serialization support silently skips
    caching — correctness is unaffected).
    """
    mode = os.environ.get("VDA_COMPILE_CACHE", "auto")
    if mode == "0":
        return None
    path = (
        cache_dir
        or os.environ.get("VDA_COMPILE_CACHE_DIR")
        or _default_cache_dir()
    )
    try:
        import jax

        # CPU compiles are fast, and XLA:CPU AOT deserialization is pinned
        # to the exact machine-feature set of the compiling process
        # (feature-mismatch loads warn about possible SIGILL).  The cache's
        # value is the minute-scale REMOTE compiles of accelerator
        # backends — auto mode enables it only there.  The platform check
        # MUST be side-effect-free (config/env only, never
        # jax.default_backend()): entry points call this before
        # ``jax.distributed.initialize``, which requires that no backend
        # has been initialized yet.  VDA_COMPILE_CACHE=1 forces it on.
        platforms = (
            jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS") or ""
        )
        if mode != "1" and platforms.split(",")[0] == "cpu":
            return None

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything: with minute-scale remote compiles even tiny
        # programs are worth persisting
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception:
            pass  # older jax: size gate not configurable
        return path
    except Exception:
        return None
