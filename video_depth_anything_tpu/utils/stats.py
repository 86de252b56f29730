"""Run statistics logging (reference ``run.py:103-143`` append-log style)."""

from __future__ import annotations

import datetime
import json
import os
from typing import Mapping


def device_memory_stats() -> dict:
    """Peak/in-use device memory in MB where the backend reports it."""
    import jax

    out = {}
    try:
        for d in jax.local_devices():
            stats = d.memory_stats()
            if stats:
                out[str(d)] = {
                    "bytes_in_use_mb": stats.get("bytes_in_use", 0) / 2**20,
                    "peak_bytes_in_use_mb": stats.get("peak_bytes_in_use", 0) / 2**20,
                }
    except Exception:
        pass
    return out


def host_rss_mb() -> float:
    try:
        import resource

        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    except Exception:
        return 0.0


def append_run_log(
    path: str, args: Mapping, n_frames: int, n_depths: int, wall_s: float
) -> None:
    rec = {
        "timestamp": datetime.datetime.now().isoformat(timespec="seconds"),
        "args": {k: v for k, v in args.items()},
        "frames_decoded": n_frames,
        "frames_predicted": n_depths,
        "wall_s": round(wall_s, 3),
        "fps_end_to_end": round(n_depths / wall_s, 3) if wall_s else None,
        "host_peak_rss_mb": round(host_rss_mb(), 1),
        "device_memory": device_memory_stats(),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
