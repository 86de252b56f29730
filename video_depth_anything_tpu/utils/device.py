"""Small device/host transfer helpers."""

from __future__ import annotations


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
