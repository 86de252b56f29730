"""Torch-compatible image resizing as MXU-friendly matmuls.

The reference pipeline leans on two PyTorch interpolation semantics that
``jax.image.resize`` does not reproduce:

* ``F.interpolate(mode="bilinear", align_corners=True)`` — used for every
  feature-map upsample in the DPT head (reference ``video_depth_anything/
  util/blocks.py:156-158``, ``dpt.py:156``) and for the final depth upsample
  (``video_depth.py:63``).
* ``F.interpolate(mode="bicubic", align_corners=False, scale_factor=(sx, sy))``
  — used for DINOv2 positional-embedding interpolation with the 0.1 offset
  (``dinov2.py:179-210``).

Instead of translating the gather-based GPU kernels, we build separable 1-D
interpolation weight matrices on the host (static shapes under ``jit``; the
matrices fold into the compiled program as constants) and apply them as two
dense matmuls.  On TPU this runs on the MXU and fuses with neighbouring ops,
which is both exact (same arithmetic as the PyTorch kernels, in fp32) and
fast — resize becomes a pair of GEMMs instead of a scatter/gather.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "bilinear_resize",
    "bilinear_resize_np",
    "bilinear_resize_packed",
    "bicubic_pos_embed_resize",
    "linear_weight_matrix",
    "cubic_weight_matrix",
]


@functools.lru_cache(maxsize=None)
def linear_weight_matrix(in_size: int, out_size: int) -> np.ndarray:
    """1-D linear interpolation matrix ``W`` with torch align_corners=True
    semantics: ``out = W @ x`` where ``W`` has shape ``(out_size, in_size)``.

    Source coordinate: ``src = dst * (in - 1) / (out - 1)`` (0 when out == 1),
    matching ``area_pixel_compute_source_index`` with ``align_corners=True``.
    """
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if out_size == 1:
        w[0, 0] = 1.0
        return w.astype(np.float32)
    # torch CPU computes source coordinates in scalar_t (= fp32 for float
    # inputs); replicate that arithmetic so parity is exact, not just close.
    scale = np.float32(in_size - 1) / np.float32(out_size - 1)
    for dst in range(out_size):
        src = np.float32(dst) * scale
        lo = int(np.floor(src))
        lo = min(lo, in_size - 1)
        hi = min(lo + 1, in_size - 1)
        frac = float(src) - lo
        w[dst, lo] += 1.0 - frac
        w[dst, hi] += frac
    return w.astype(np.float32)


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel used by torch (Keys, A = -0.75)."""
    x = np.abs(x)
    out = np.zeros_like(x)
    m1 = x <= 1.0
    m2 = (x > 1.0) & (x < 2.0)
    out[m1] = ((a + 2.0) * x[m1] - (a + 3.0)) * x[m1] * x[m1] + 1.0
    out[m2] = (((x[m2] - 5.0) * x[m2] + 8.0) * x[m2] - 4.0) * a
    return out


@functools.lru_cache(maxsize=None)
def cubic_weight_matrix(in_size: int, out_size: int, scale: float) -> np.ndarray:
    """1-D bicubic interpolation matrix with torch ``align_corners=False`` and
    an explicit ``scale_factor`` (torch uses the *given* scale factor, not
    ``out/in``, when one is passed — the reference relies on this for the
    ``+ interpolate_offset`` pos-embed workaround, ``dinov2.py:194-205``).

    Source coordinate: ``src = (dst + 0.5) / scale - 0.5``; 4 taps at
    ``floor(src) - 1 .. floor(src) + 2`` with edge clamping.
    """
    w = np.zeros((out_size, in_size), dtype=np.float64)
    # torch: scale_used = fp32(1/scale_factor); src computed in fp32.
    inv = np.float32(1.0) / np.float32(scale)
    for dst in range(out_size):
        src = float((np.float32(dst) + np.float32(0.5)) * inv - np.float32(0.5))
        base = int(np.floor(src))
        frac = src - base
        taps = np.array([frac + 1.0, frac, 1.0 - frac, 2.0 - frac])
        coeffs = _cubic_kernel(taps)
        for t in range(4):
            idx = min(max(base - 1 + t, 0), in_size - 1)
            w[dst, idx] += coeffs[t]
    return w.astype(np.float32)


def _apply_separable(x: jnp.ndarray, w_h: np.ndarray, w_w: np.ndarray) -> jnp.ndarray:
    """Apply 1-D weight matrices along the H and W axes of ``(..., H, W, C)``."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    # (..., H, W, C) -> (..., OH, W, C): contract H against w_h (OH, H).
    xf = jnp.einsum("oh,...hwc->...owc", jnp.asarray(w_h), xf)
    xf = jnp.einsum("ow,...hwc->...hoc", jnp.asarray(w_w), xf)
    return xf.astype(dtype)


def bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear ``align_corners=True`` resize of ``(..., H, W, C)`` to
    ``(..., out_h, out_w, C)``; exact match of torch ``F.interpolate``.
    """
    h, w = x.shape[-3], x.shape[-2]
    if h == out_h and w == out_w:
        return x
    return _apply_separable(
        x, linear_weight_matrix(h, out_h), linear_weight_matrix(w, out_w)
    )


@functools.lru_cache(maxsize=None)
def _linear_taps(in_size: int, out_size: int):
    """Per-output-row (lo, hi, w_lo, w_hi) taps of ``linear_weight_matrix``
    — identical fp32 coordinate arithmetic, in gather-lerp form for the
    host-side resize (two products + one add per output instead of a dense
    GEMM row that is zero everywhere else)."""
    lo_a = np.zeros(out_size, np.int64)
    hi_a = np.zeros(out_size, np.int64)
    wlo = np.ones(out_size, np.float32)
    whi = np.zeros(out_size, np.float32)
    if out_size == 1:
        return lo_a, hi_a, wlo, whi
    scale = np.float32(in_size - 1) / np.float32(out_size - 1)
    for dst in range(out_size):
        src = np.float32(dst) * scale
        lo = min(int(np.floor(src)), in_size - 1)
        hi = min(lo + 1, in_size - 1)
        frac = float(src) - lo
        lo_a[dst], hi_a[dst] = lo, hi
        if lo == hi:
            # the matrix accumulates (1-frac)+frac = 1.0 in float64 here
            wlo[dst], whi[dst] = 1.0, 0.0
        else:
            wlo[dst] = np.float64(1.0) - frac
            whi[dst] = frac
    return lo_a, hi_a, wlo, whi


def bilinear_resize_np(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host (numpy) twin of ``bilinear_resize`` for ``(..., H, W)`` arrays.

    Same taps, same fp32 weights, same H-then-W pass order as the device
    GEMM formulation — the two formulations accumulate the identical two
    products per output, so results agree to fp32 round-off (pinned by
    ``tests/test_host_upsample.py``).  Used by the pipelines'
    ``host_upsample`` mode: the device emits model-resolution depth (the
    D2H shrinks by the source/model area ratio) and this runs after the
    transfer."""
    h, w = x.shape[-2], x.shape[-1]
    xf = np.asarray(x, np.float32)
    if (h, w) == (out_h, out_w):
        return xf
    if h != out_h:
        lo, hi, wl, wh = _linear_taps(h, out_h)
        xf = xf[..., lo, :] * wl[:, None] + xf[..., hi, :] * wh[:, None]
    if w != out_w:
        lo, hi, wl, wh = _linear_taps(w, out_w)
        xf = xf[..., lo] * wl + xf[..., hi] * wh
    return xf


def bilinear_resize_packed(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """``bilinear_resize`` on a 2×2 space-to-depth-packed map, staying packed.

    ``x``: ``(..., H/2, W/2, 4C)`` with channel order ``(sub_y, sub_x, c)``
    (the ``models.layers._space_to_depth`` convention); ``out_h``/``out_w``
    are the **unpacked** target sizes (must be even).  Returns the packed
    ``(..., out_h/2, out_w/2, 4C)`` equivalent of unpack→resize→repack,
    without the two (B·T, H, W, C)-scale relayouts: the 1-D weight matrix is
    phase-split into four ``(out/2, in/2)`` blocks ``W[2o+r, 2u+s]`` and
    applied per (input-phase, output-phase) pair — same taps, same fp32
    arithmetic, same total FLOPs as the unpacked GEMMs.
    """
    h2, w2, c4 = x.shape[-3], x.shape[-2], x.shape[-1]
    if 2 * h2 == out_h and 2 * w2 == out_w:
        return x
    assert out_h % 2 == 0 and out_w % 2 == 0, (out_h, out_w)
    c = c4 // 4
    wh = linear_weight_matrix(2 * h2, out_h).reshape(out_h // 2, 2, h2, 2)
    ww = linear_weight_matrix(2 * w2, out_w).reshape(out_w // 2, 2, w2, 2)
    dtype = x.dtype
    lead = x.shape[:-3]
    x6 = x.reshape(lead + (h2, w2, 2, 2, c)).astype(jnp.float32)
    # rows: contract (u, sub_y); cols: contract (w, sub_x)
    y = jnp.einsum("orus,...uwstc->...owrtc", jnp.asarray(wh), x6)
    y = jnp.einsum("pqwt,...owrtc->...oprqc", jnp.asarray(ww), y)
    return y.reshape(lead + (out_h // 2, out_w // 2, 4 * c)).astype(dtype)


def bicubic_pos_embed_resize(
    pos: jnp.ndarray, out_h: int, out_w: int, scale_h: float, scale_w: float
) -> jnp.ndarray:
    """Bicubic resize of a ``(H, W, C)`` positional-embedding grid using
    explicit torch scale-factor semantics (``align_corners=False``).
    """
    h, w = pos.shape[0], pos.shape[1]
    return _apply_separable(
        pos,
        cubic_weight_matrix(h, out_h, float(scale_h)),
        cubic_weight_matrix(w, out_w, float(scale_w)),
    )
