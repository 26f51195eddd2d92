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
