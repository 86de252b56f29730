"""Small device/host transfer helpers."""

from __future__ import annotations


def transfer_cast(x):
    """Optionally cast a depth output to fp16 for the D2H copy.

    ``VDA_TRANSFER_DTYPE=fp16`` halves the device→host bytes of every
    emitted depth map (the dominant e2e cost where the host link is slow;
    full-res fp32 frames are ~3.7 MB each at 720p).  fp16 keeps ~3
    significant decimal digits — fine for visualization and most
    downstream use, NOT for bit-level parity (default stays fp32; the
    drain converts back to fp32 on host either way).  Read at trace time:
    set the env var before the pipeline's first call.
    """
    import os

    if os.environ.get("VDA_TRANSFER_DTYPE", "fp32") in ("fp16", "float16"):
        import jax.numpy as jnp

        return x.astype(jnp.float16)
    return x


def start_host_transfer(x):
    """Kick off the device→host copy of ``x`` immediately (non-blocking).

    The inference loops keep a lag buffer of depth outputs so their D2H
    overlaps the next step's compute — but ``np.asarray`` only *starts*
    the copy when called, so without this each drain still pays the full
    transfer latency serially (≈28 ms per host↔device roundtrip through
    this environment's tunnel).  ``copy_to_host_async`` starts the
    transfer at enqueue time; the later ``np.asarray`` just waits for
    completion.  Returns ``x`` (no-op on backends without the method).
    """
    try:
        x.copy_to_host_async()
    except (AttributeError, NotImplementedError):  # pragma: no cover
        pass
    return x
