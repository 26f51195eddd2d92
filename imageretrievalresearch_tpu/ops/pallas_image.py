"""Pallas image kernels: VMEM-resident LUT application.

TPUs have no hardware gather, so XLA lowers per-pixel table lookups
(``lut[img]`` in equalize/autocontrast) to catastrophically slow code — the
dominant cost of on-device AutoAugment (PERF.md). The TPU-native formulation
is 256 vectorized select-accumulate passes; done in XLA those round-trip HBM
per pass, but a Pallas kernel holds the image plane and the 256-entry table
in VMEM so the passes run at VPU speed with one HBM read + one write:

    for k in 0..255:  acc += where(img == k, lut[k], 0)

Grid: one program per (image, channel) plane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_PLANES_PER_PROGRAM = 8


def _hist_kernel(img_ref, out_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (_PLANES_PER_PROGRAM, 256), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_PLANES_PER_PROGRAM, 256), 0)
    hist = jnp.zeros((_PLANES_PER_PROGRAM, 256), jnp.int32)
    for p in range(_PLANES_PER_PROGRAM):
        v = img_ref[p]

        def body(k, h, v=v, p=p):
            s = jnp.sum((v == k).astype(jnp.int32))
            return h + jnp.where((lane == k) & (row == p), s, 0)

        hist = jax.lax.fori_loop(0, 256, body, hist)
    out_ref[:] = hist


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_histogram(img: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Per-plane 256-bin histograms: (P, H, W) int -> (P, 256) int32.

    The XLA alternatives (scatter-add, or a materialized one-hot equality
    tensor) are respectively a TPU compile cliff and a memory blow-up; here
    each plane stays in VMEM for its 256 count-reductions.
    """
    p, h, w = img.shape
    pp = _PLANES_PER_PROGRAM
    ppad = -(-p // pp) * pp
    img_i = jnp.pad(img.astype(jnp.int32), ((0, ppad - p), (0, 0), (0, 0)),
                    constant_values=-1)
    out = pl.pallas_call(
        _hist_kernel,
        grid=(ppad // pp,),
        in_specs=[pl.BlockSpec((pp, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((pp, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ppad, 256), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=ppad * h * w * 256 * 2,
            bytes_accessed=ppad * (h * w * 4 + 1024),
            transcendentals=0),
        interpret=interpret,
    )(img_i)
    return out[:p]


_ROWS_PER_PROGRAM = 512


def _row_shift_kernel(rows_ref, s_ref, out_ref, *, radix: int, qlo: int,
                      qhi: int, fill: int, w: int):
    # Mosaic's roll only supports 32-bit data — compute in i32, store u8
    x = rows_ref[:].astype(jnp.int32)             # (R, W)
    s = s_ref[:]                                  # (R, 1) int32
    q = s // radix
    r = s - radix * q
    acc = jnp.zeros_like(x)
    for qq in range(qlo, qhi + 1):
        # pltpu.roll requires a non-negative shift; left-roll by s is a
        # right-roll by (w - s) mod w
        acc = jnp.where(q == qq, pltpu.roll(x, (-radix * qq) % w, axis=1),
                        acc)
    out = jnp.zeros_like(x)
    for rr in range(radix):
        out = jnp.where(r == rr, pltpu.roll(acc, (-rr) % w, axis=1), out)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    src = col + s
    out_ref[:] = jnp.where((src >= 0) & (src <= w - 1), out,
                           fill).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("smax", "radix", "fill", "interpret"))
def pallas_row_shift(rows: jax.Array, shifts: jax.Array, *, smax: int,
                     radix: int = 8, fill: int = 128,
                     interpret: bool = False) -> jax.Array:
    """Per-row integer shift: (N, W) uint8 + (N,) int32 -> (N, W) with
    out(n, x) = rows(n, x + shifts(n)) and ``fill`` outside [0, W).

    The building block of gather-free NEAREST shear/rotate: the radix-
    factored select-accumulate (s = radix·q + r) runs entirely in VMEM —
    one HBM read + one write per row instead of one round-trip per shift
    pass in the XLA formulation. |shifts| must be <= smax.
    """
    n, w = rows.shape
    rb = _ROWS_PER_PROGRAM
    npad = -(-n // rb) * rb
    rows_p = jnp.pad(rows, ((0, npad - n), (0, 0)))
    s_p = jnp.pad(shifts.astype(jnp.int32), (0, npad - n))[:, None]
    kernel = functools.partial(
        _row_shift_kernel, radix=radix, qlo=(-smax) // radix,
        qhi=smax // radix, fill=fill, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(npad // rb,),
        in_specs=[
            pl.BlockSpec((rb, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, w), rows.dtype),
        cost_estimate=pl.CostEstimate(
            flops=npad * w * (2 * smax // radix + radix + 4),
            bytes_accessed=npad * (2 * w + 4),
            transcendentals=0),
        interpret=interpret,
    )(rows_p, s_p)
    return out[:n]


def _cubic_w(s):
    # ONE bicubic kernel for both shear paths: the Pallas row-shift and
    # the XLA shear must interpolate identically or their documented
    # within-±1 parity breaks. Imported lazily: autoaugment imports this
    # module inside functions, so a top-level import here would load it
    # eagerly for every pallas_image consumer.
    from imageretrievalresearch_tpu.ops.autoaugment import _cubic_kernel
    return _cubic_kernel(s)


def _row_shift_cubic_kernel(rows_ref, base_ref, frac_ref, out_ref, *,
                            radix: int, qlo: int, qhi: int, fill: int,
                            w: int):
    # Mosaic can't cast u8 -> f32 directly; bounce through i32
    x = rows_ref[:].astype(jnp.int32).astype(jnp.float32)   # (R, W)
    base = base_ref[:]                            # (R, 1) int32
    frac = frac_ref[:]                            # (R, 1) f32
    q = base // radix
    r = base - radix * q

    # coarse: shift by radix*q (wrapping; bounds handled per fine pass)
    xc = jnp.zeros_like(x)
    for qq in range(qlo, qhi + 1):
        xc = jnp.where(q == qq, pltpu.roll(x, (-radix * qq) % w, axis=1), xc)

    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    out = jnp.zeros_like(x)
    wsum = jnp.zeros_like(frac)
    # fine: total shift s = radix*q + f; the 4 cubic taps land on
    # f = r + tap for tap in {-1, 0, 1, 2}, so f spans [-1, radix+1]
    for f in range(-1, radix + 2):
        coeff = jnp.zeros_like(frac)
        for tap in range(-1, 3):
            coeff = coeff + jnp.where(r + tap == f,
                                      _cubic_w(frac - tap), 0.0)
        s_f = radix * q + f                       # (R, 1)
        inside = (col + s_f >= 0) & (col + s_f <= w - 1)
        pix = jnp.where(inside, pltpu.roll(xc, (-f) % w, axis=1),
                        jnp.float32(fill))
        out = out + coeff * pix
        wsum = wsum + coeff
    out = out / jnp.maximum(wsum, 1e-8)
    srcx = col.astype(jnp.float32) + base.astype(jnp.float32) + frac
    valid = (srcx >= -0.5) & (srcx <= w - 0.5)
    out = jnp.where(valid, out, jnp.float32(fill))
    # f32 -> u8 must bounce through i32 (Mosaic cast support)
    out_ref[:] = jnp.clip(jnp.round(out), 0, 255).astype(
        jnp.int32).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("smax", "radix", "fill", "interpret"))
def pallas_row_shift_cubic(rows: jax.Array, src0: jax.Array, *, smax: int,
                           radix: int = 8, fill: int = 128,
                           interpret: bool = False) -> jax.Array:
    """Per-row FRACTIONAL shift with PIL-bicubic resampling: (N, W) uint8 +
    (N,) f32 source offsets -> (N, W); out(n, x) resamples rows(n) at
    x + src0(n) with the 4-tap a=-1 cubic, gray fill outside — the VMEM
    form of autoaugment's roll-accumulate shear (one HBM read + write).
    ⌊src0⌋ must lie in [-smax, smax]."""
    n, w = rows.shape
    rb = _ROWS_PER_PROGRAM
    npad = -(-n // rb) * rb
    rows_p = jnp.pad(rows, ((0, npad - n), (0, 0)))
    src_p = jnp.pad(src0.astype(jnp.float32), (0, npad - n))
    base = jnp.floor(src_p).astype(jnp.int32)[:, None]
    frac = (src_p - jnp.floor(src_p))[:, None]
    kernel = functools.partial(
        _row_shift_cubic_kernel, radix=radix, qlo=(-smax) // radix,
        qhi=smax // radix, fill=fill, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(npad // rb,),
        in_specs=[
            pl.BlockSpec((rb, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, w), rows.dtype),
        cost_estimate=pl.CostEstimate(
            flops=npad * w * (2 * (smax // radix) + 4 * (radix + 3) + 8),
            bytes_accessed=npad * (2 * w + 8),
            transcendentals=0),
        interpret=interpret,
    )(rows_p, base, frac)
    return out[:n]


def _lut_kernel(img_ref, lut_ref, out_ref):
    # per-plane scalar table reads from SMEM (dynamic lane indexing of a
    # VMEM vector is not expressible in Mosaic); plane loop is static so
    # each fori pass does exactly one select-accumulate over one (H, W)
    for p in range(_PLANES_PER_PROGRAM):
        v = img_ref[p]                           # (H, W) plane in VMEM

        def body(k, acc, v=v, p=p):
            return acc + jnp.where(v == k, lut_ref[p, k], 0)

        out_ref[p] = jax.lax.fori_loop(0, 256, body, jnp.zeros_like(v))


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_lut_apply(img: jax.Array, lut: jax.Array,
                     *, interpret: bool = False) -> jax.Array:
    """Apply per-plane 256-entry LUTs: (P, H, W) uint8/int32 + (P, 256)
    int32 -> (P, H, W) int32 (P = batch*channels planes)."""
    p, h, w = img.shape
    pp = _PLANES_PER_PROGRAM
    ppad = -(-p // pp) * pp
    img_i = jnp.pad(img.astype(jnp.int32), ((0, ppad - p), (0, 0), (0, 0)))
    lut_i = jnp.pad(lut.astype(jnp.int32), ((0, ppad - p), (0, 0)))
    out = pl.pallas_call(
        _lut_kernel,
        grid=(ppad // pp,),
        in_specs=[
            pl.BlockSpec((pp, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pp, 256), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((pp, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ppad, h, w), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=ppad * h * w * 256 * 2,
            bytes_accessed=ppad * (h * w * 8 + 1024),
            transcendentals=0),
        interpret=interpret,
    )(img_i, lut_i)
    return out[:p]
