"""AutoAugment ImageNetPolicy in pure JAX — batched, jit-compiled, PRNG-keyed.

The reference applies ``AutoAugment.ImageNetPolicy()`` inside its torchvision
Compose pipelines (train/train_efficientnet.py:49-64); the artifact itself is
a missing blob (.MISSING_LARGE_BLOBS:13) containing the well-known public
pure-PIL AutoAugment policies, so behavior follows that public reference:
25 sub-policies of two (op, probability, magnitude-index) steps each,
fill color (128, 128, 128).

PIL-semantics notes (pinned by tests against Pillow in tests/test_autoaugment.py):

- LUT ops (posterize / solarize / invert / equalize / autocontrast) are
  integer-exact vs PIL.
- Enhancement ops (color / contrast / brightness / sharpness) blend
  ``degenerate + f·(img − degenerate)`` with PIL's fixed-point L conversion
  and SMOOTH-filter border behavior (1px border untouched); ±1 quantization
  tolerance vs PIL.
- Geometric ops: shear is a 1-D cubic (Catmull-Rom, PIL BICUBIC) resample
  along one axis; translate is NEAREST; rotate is NEAREST about the image
  center with gray fill (PIL rotate_with_fill semantics).

Everything is shape-static and branchless (``lax.switch`` over the op table),
so one compiled program augments a whole batch on device — the reference runs
these per-sample in Python DataLoader workers (SURVEY.md hard part #5).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

FILL = 128

# op ids
SHEAR_X, SHEAR_Y, TRANSLATE_X, TRANSLATE_Y, ROTATE = 0, 1, 2, 3, 4
COLOR, POSTERIZE, SOLARIZE, CONTRAST, SHARPNESS = 5, 6, 7, 8, 9
BRIGHTNESS, AUTOCONTRAST, EQUALIZE, INVERT = 10, 11, 12, 13
_NUM_OPS = 14

_OP_IDS = {
    "shearX": SHEAR_X, "shearY": SHEAR_Y, "translateX": TRANSLATE_X,
    "translateY": TRANSLATE_Y, "rotate": ROTATE, "color": COLOR,
    "posterize": POSTERIZE, "solarize": SOLARIZE, "contrast": CONTRAST,
    "sharpness": SHARPNESS, "brightness": BRIGHTNESS,
    "autocontrast": AUTOCONTRAST, "equalize": EQUALIZE, "invert": INVERT,
}

# the public ImageNetPolicy sub-policy table:
# ((op1, p1, mag_idx1), (op2, p2, mag_idx2)) x 25
IMAGENET_SUBPOLICIES = [
    (("posterize", 0.4, 8), ("rotate", 0.6, 9)),
    (("solarize", 0.6, 5), ("autocontrast", 0.6, 5)),
    (("equalize", 0.8, 8), ("equalize", 0.6, 3)),
    (("posterize", 0.6, 7), ("posterize", 0.6, 6)),
    (("equalize", 0.4, 7), ("solarize", 0.2, 4)),
    (("equalize", 0.4, 4), ("rotate", 0.8, 8)),
    (("solarize", 0.6, 3), ("equalize", 0.6, 7)),
    (("posterize", 0.8, 5), ("equalize", 1.0, 2)),
    (("rotate", 0.2, 3), ("solarize", 0.6, 8)),
    (("equalize", 0.6, 8), ("posterize", 0.4, 6)),
    (("rotate", 0.8, 8), ("color", 0.4, 0)),
    (("rotate", 0.4, 9), ("equalize", 0.6, 2)),
    (("equalize", 0.0, 7), ("equalize", 0.8, 8)),
    (("invert", 0.6, 4), ("equalize", 1.0, 8)),
    (("color", 0.6, 4), ("contrast", 1.0, 8)),
    (("rotate", 0.8, 8), ("color", 1.0, 2)),
    (("color", 0.8, 8), ("solarize", 0.8, 7)),
    (("sharpness", 0.4, 7), ("invert", 0.6, 8)),
    (("shearX", 0.6, 5), ("equalize", 1.0, 9)),
    (("color", 0.4, 0), ("equalize", 0.6, 3)),
    (("equalize", 0.4, 7), ("solarize", 0.2, 4)),
    (("solarize", 0.6, 5), ("autocontrast", 0.6, 5)),
    (("invert", 0.6, 4), ("equalize", 1.0, 8)),
    (("color", 0.6, 4), ("contrast", 1.0, 8)),
    (("equalize", 0.8, 8), ("equalize", 0.6, 3)),
]


def _magnitude_table() -> np.ndarray:
    """(num_ops, 10) magnitude value per op per magnitude index."""
    t = np.zeros((_NUM_OPS, 10), dtype=np.float32)
    t[SHEAR_X] = t[SHEAR_Y] = np.linspace(0, 0.3, 10)
    t[TRANSLATE_X] = t[TRANSLATE_Y] = np.linspace(0, 150 / 331, 10)
    t[ROTATE] = np.linspace(0, 30, 10)
    for op in (COLOR, CONTRAST, SHARPNESS, BRIGHTNESS):
        t[op] = np.linspace(0.0, 0.9, 10)
    t[POSTERIZE] = np.round(np.linspace(8, 4, 10), 0)
    t[SOLARIZE] = np.linspace(256, 0, 10)
    return t


_MAGS = _magnitude_table()
# (which ops take a random magnitude sign is encoded once, by the
# _GEO_OPS/_ENH_OPS grouping consulted in _apply_stage)


def _policy_arrays() -> tuple[np.ndarray, ...]:
    ops = np.zeros((25, 2), dtype=np.int32)
    probs = np.zeros((25, 2), dtype=np.float32)
    mags = np.zeros((25, 2), dtype=np.float32)
    for i, (s1, s2) in enumerate(IMAGENET_SUBPOLICIES):
        for j, (name, p, mi) in enumerate((s1, s2)):
            op = _OP_IDS[name]
            ops[i, j] = op
            probs[i, j] = p
            mags[i, j] = _MAGS[op, mi]
    return ops, probs, mags


_POLICY_OPS, _POLICY_PROBS, _POLICY_MAGS = _policy_arrays()


# ---------------------------------------------------------------------------
# pointwise / LUT ops (uint8-exact vs PIL)
# ---------------------------------------------------------------------------

def op_invert(img, mag):
    return (255 - img.astype(jnp.int32)).astype(jnp.uint8)


def op_posterize(img, bits):
    bits = bits.astype(jnp.int32)
    mask = (255 << (8 - bits)) & 255
    return (img.astype(jnp.int32) & mask).astype(jnp.uint8)


def op_solarize(img, threshold):
    v = img.astype(jnp.int32)
    return jnp.where(v < threshold, v, 255 - v).astype(jnp.uint8)


def _channel_hist(chan: jax.Array) -> jax.Array:
    """(H,W) uint8 -> (256,) counts."""
    return jnp.zeros(256, jnp.int32).at[chan.astype(jnp.int32).ravel()].add(1)


def op_equalize(img, mag):
    """PIL ImageOps.equalize integer algorithm, per channel — delegates to
    the SAME LUT math the batched path uses (:func:`_equalize_lut`), so the
    single-image parity surface and _apply_stage's batched route cannot
    drift apart."""
    planes = img.astype(jnp.int32).transpose(2, 0, 1)        # (3, H, W)
    lut = _equalize_lut(jax.vmap(_channel_hist)(planes))
    out = jax.vmap(lambda f, l: l[f])(planes, lut)
    return out.transpose(1, 2, 0).astype(jnp.uint8)


def op_autocontrast(img, mag):
    """PIL ImageOps.autocontrast (cutoff 0), per channel — delegates to
    :func:`_autocontrast_lut` (one copy of the integer LUT arithmetic,
    shared with the batched path)."""
    planes = img.astype(jnp.int32).transpose(2, 0, 1)        # (3, H, W)
    lut = _autocontrast_lut(jnp.min(planes, axis=(1, 2)),
                            jnp.max(planes, axis=(1, 2)))
    out = jax.vmap(lambda f, l: l[f])(planes, lut)
    return out.transpose(1, 2, 0).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# enhancement ops (PIL ImageEnhance.X.enhance(1 + signed_mag))
# ---------------------------------------------------------------------------

def _pil_gray(img: jax.Array) -> jax.Array:
    """PIL convert('L') fixed-point luma: (R*19595+G*38470+B*7471+0x8000)>>16."""
    v = img.astype(jnp.int32)
    l = (v[..., 0] * 19595 + v[..., 1] * 38470 + v[..., 2] * 7471
         + 0x8000) >> 16
    return l  # (H, W) int32


def _blend(degenerate: jax.Array, img: jax.Array, factor: jax.Array
           ) -> jax.Array:
    """PIL Image.blend/enhance: degenerate + factor*(img - degenerate),
    clipped; float32 math."""
    d = degenerate.astype(jnp.float32)
    out = d + factor * (img.astype(jnp.float32) - d)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def op_color(img, factor):
    gray = _pil_gray(img)[..., None]
    degenerate = jnp.broadcast_to(gray, img.shape)
    return _blend(degenerate, img, factor)


def op_contrast(img, factor):
    # PIL: mean = int(Stat(L).mean + 0.5), solid-gray degenerate
    gray = _pil_gray(img)
    mean = jnp.floor(jnp.mean(gray.astype(jnp.float32)) + 0.5)
    degenerate = jnp.full(img.shape, mean, dtype=jnp.float32)
    return _blend(degenerate, img, factor)


def op_brightness(img, factor):
    return _blend(jnp.zeros_like(img), img, factor)


def op_sharpness(img, factor):
    # degenerate = ImageFilter.SMOOTH: 3x3 [[1,1,1],[1,5,1],[1,1,1]]/13,
    # 1px border left unfiltered (PIL filters skip the border)
    v = img.astype(jnp.float32)
    kernel = jnp.asarray([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
    smoothed = jax.lax.conv_general_dilated(
        v.transpose(2, 0, 1)[:, None],             # (C,1,H,W)
        kernel[None, None],                        # (1,1,3,3)
        window_strides=(1, 1), padding="VALID")[:, 0]  # (C,H-2,W-2)
    smoothed = jnp.clip(smoothed + 0.5, 0, 255).astype(jnp.int32)  # PIL rounds
    smoothed = smoothed.astype(jnp.float32).transpose(1, 2, 0)
    degenerate = v.at[1:-1, 1:-1].set(smoothed)
    return _blend(degenerate, img, factor)


# ---------------------------------------------------------------------------
# geometric ops
# ---------------------------------------------------------------------------

def _cubic_kernel(s: jax.Array) -> jax.Array:
    """PIL *geometry* bicubic kernel (Geometry.c, a = -1.0 — the legacy
    kernel used by Image.transform/rotate, NOT the a=-0.5 resize filter;
    verified by impulse response in tests)."""
    a = -1.0
    s = jnp.abs(s)
    return jnp.where(
        s < 1.0, ((a + 2) * s - (a + 3)) * s * s + 1,
        jnp.where(s < 2.0, (((s - 5) * s + 8) * s - 4) * a, 0.0))


def _shear_1d(img: jax.Array, v: jax.Array, axis: int) -> jax.Array:
    """PIL AFFINE shear with BICUBIC resampling along one axis.

    shearX (axis=1): src_x = x + v*y (PIL samples at out+0.5 then -0.5);
    1-D cubic along x with gray fill outside.
    """
    h, w, _ = img.shape
    vf = img.astype(jnp.float32)
    if axis == 1:
        ys = jnp.arange(h, dtype=jnp.float32)
        src = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
               + v * (ys[:, None] + 0.5)) - 0.5          # (H, W) src x
        base = jnp.floor(src).astype(jnp.int32)
        frac = src - base
        out = jnp.zeros_like(vf)
        wsum = jnp.zeros((h, w, 1), jnp.float32)
        for tap in (-1, 0, 1, 2):
            idx = base + tap
            inside = (idx >= 0) & (idx <= w - 1)
            wt = _cubic_kernel(frac - tap)[..., None]
            pix = jnp.take_along_axis(
                vf, jnp.clip(idx, 0, w - 1)[..., None], axis=1)
            pix = jnp.where(inside[..., None], pix, FILL)
            out = out + wt * pix
            wsum = wsum + wt
        valid = (src >= -0.5) & (src <= w - 0.5)
        out = out / jnp.maximum(wsum, 1e-8)
        out = jnp.where(valid[..., None], out, FILL)
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    else:
        return jnp.transpose(
            _shear_1d(jnp.transpose(img, (1, 0, 2)), v, 1), (1, 0, 2))


def _translate(img: jax.Array, pixels: jax.Array, axis: int) -> jax.Array:
    """PIL AFFINE translate with NEAREST: src = out + pixels, gray fill."""
    h, w, _ = img.shape
    n = w if axis == 1 else h
    coords = jnp.arange(n, dtype=jnp.float32)
    src = coords + pixels                   # NEAREST: PIL truncates int(x)
    idx = jnp.floor(src + 0.5).astype(jnp.int32)
    inside = (idx >= 0) & (idx <= n - 1)
    idxc = jnp.clip(idx, 0, n - 1)
    if axis == 1:
        out = img[:, idxc]
        out = jnp.where(inside[None, :, None], out, FILL)
    else:
        out = img[idxc]
        out = jnp.where(inside[:, None, None], out, FILL)
    return out.astype(jnp.uint8)


def _rotate(img: jax.Array, degrees: jax.Array) -> jax.Array:
    """PIL Image.rotate(angle) (CCW, NEAREST, about center) with gray fill
    (rotate_with_fill composite semantics)."""
    h, w, _ = img.shape
    # PIL negates the angle before building the output->input affine matrix
    # (Image.rotate: ``angle = -math.radians(angle)``)
    theta = -jnp.deg2rad(degrees)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = w / 2.0, h / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5 - cy
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5 - cx
    src_x = cos * xs + sin * ys + cx - 0.5
    src_y = -sin * xs + cos * ys + cy - 0.5
    ix = jnp.floor(src_x + 0.5).astype(jnp.int32)
    iy = jnp.floor(src_y + 0.5).astype(jnp.int32)
    inside = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
    out = img[jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)]
    return jnp.where(inside[..., None], out, FILL).astype(jnp.uint8)


def op_shear_x(img, mag):
    return _shear_1d(img, mag, axis=1)


def op_shear_y(img, mag):
    return _shear_1d(img, mag, axis=0)


def op_translate_x(img, mag):
    return _translate(img, mag * img.shape[1], axis=1)


def op_translate_y(img, mag):
    return _translate(img, mag * img.shape[0], axis=0)


def op_rotate(img, mag):
    return _rotate(img, mag)


_OP_FNS = [None] * _NUM_OPS
_OP_FNS[SHEAR_X] = op_shear_x
_OP_FNS[SHEAR_Y] = op_shear_y
_OP_FNS[TRANSLATE_X] = op_translate_x
_OP_FNS[TRANSLATE_Y] = op_translate_y
_OP_FNS[ROTATE] = op_rotate
_OP_FNS[COLOR] = op_color
_OP_FNS[POSTERIZE] = op_posterize
_OP_FNS[SOLARIZE] = op_solarize
_OP_FNS[CONTRAST] = op_contrast
_OP_FNS[SHARPNESS] = op_sharpness
_OP_FNS[BRIGHTNESS] = op_brightness
_OP_FNS[AUTOCONTRAST] = op_autocontrast
_OP_FNS[EQUALIZE] = op_equalize
_OP_FNS[INVERT] = op_invert


_GEO_OPS = (SHEAR_X, SHEAR_Y, TRANSLATE_X, TRANSLATE_Y, ROTATE)
_ENH_OPS = (COLOR, CONTRAST, SHARPNESS, BRIGHTNESS)


# ---------------------------------------------------------------------------
# batched histogram ops (equalize / autocontrast): LUT math vectorized over
# (batch*channel) planes; on TPU the histogram and LUT application run as
# VMEM-resident Pallas kernels (XLA's per-pixel gathers/scatters are the
# dominant cost of on-device AutoAugment otherwise — see PERF.md)
# ---------------------------------------------------------------------------

def _equalize_lut(hist: jax.Array) -> jax.Array:
    """(P, 256) histograms -> (P, 256) PIL-equalize LUTs (int algorithm)."""
    p = hist.shape[0]
    nz = hist > 0
    last_nz = 255 - jnp.argmax(nz[:, ::-1].astype(jnp.int32), axis=1)
    h_last = jnp.take_along_axis(hist, last_nz[:, None], axis=1)[:, 0]
    total = jnp.sum(hist, axis=1)
    step = (total - h_last) // 255
    csum = jnp.concatenate(
        [jnp.zeros((p, 1), hist.dtype), jnp.cumsum(hist, axis=1)[:, :-1]],
        axis=1)
    ar = jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32), (p, 256))
    stepc = step[:, None]
    lut = jnp.clip((stepc // 2 + csum) // jnp.maximum(stepc, 1), 0, 255)
    return jnp.where(stepc > 0, lut, ar).astype(jnp.int32)


def _autocontrast_lut(lo: jax.Array, hi: jax.Array) -> jax.Array:
    """(P,) channel min/max -> (P, 256) PIL-autocontrast LUTs."""
    num = (jnp.arange(256, dtype=jnp.int32)[None] - lo[:, None]) * 255
    den = jnp.maximum(hi - lo, 1)[:, None]
    lut = jnp.clip(jnp.where(num >= 0, num // den, -((-num) // den)), 0, 255)
    ar = jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32), lut.shape)
    return jnp.where((hi > lo)[:, None], lut, ar)


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _lut_apply_planes(planes: jax.Array, lut: jax.Array) -> jax.Array:
    """(P, H, W) int + (P, 256) int -> (P, H, W); Pallas on TPU, gather
    elsewhere."""
    if _use_pallas():
        from imageretrievalresearch_tpu.ops.pallas_image import pallas_lut_apply
        return pallas_lut_apply(planes, lut)
    return jax.vmap(lambda f, l: l[f])(planes, lut)


def _plane_histogram(planes: jax.Array) -> jax.Array:
    if _use_pallas():
        from imageretrievalresearch_tpu.ops.pallas_image import pallas_histogram
        return pallas_histogram(planes)
    return jax.vmap(_channel_hist)(planes)


def batched_equalize(images: jax.Array) -> jax.Array:
    """(B, H, W, 3) uint8 -> equalized, semantics of :func:`op_equalize`."""
    b, h, w, c = images.shape
    planes = images.astype(jnp.int32).transpose(0, 3, 1, 2).reshape(-1, h, w)
    hist = _plane_histogram(planes)
    lut = _equalize_lut(hist)
    out = _lut_apply_planes(planes, lut)
    return out.reshape(b, c, h, w).transpose(0, 2, 3, 1).astype(jnp.uint8)


def batched_autocontrast(images: jax.Array) -> jax.Array:
    """(B, H, W, 3) uint8 -> autocontrasted, semantics of
    :func:`op_autocontrast`."""
    b, h, w, c = images.shape
    planes = images.astype(jnp.int32).transpose(0, 3, 1, 2).reshape(-1, h, w)
    lo = jnp.min(planes, axis=(1, 2))
    hi = jnp.max(planes, axis=(1, 2))
    lut = _autocontrast_lut(lo, hi)
    out = _lut_apply_planes(planes, lut)
    return out.reshape(b, c, h, w).transpose(0, 2, 3, 1).astype(jnp.uint8)


def batched_shear_x(images: jax.Array, vm: jax.Array) -> jax.Array:
    """(B, H, W, 3) uint8 + (B,) signed magnitudes -> sheared batch.

    Gather-free roll-accumulate formulation: shearX is a per-row fractional
    shift, so ``out = Σ_s coeff(b, y, s) · roll(img, -s)`` over the static
    integer-shift range, with the 4-tap cubic weights folded into the
    coefficients. Static rolls + fused multiply-adds are fast on TPU where
    the per-pixel gather form is ~100x slower (PERF.md); matches
    :func:`op_shear_x` within ±1 (rounding-tie accumulation order).
    """
    b, h, w, c = images.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    src0 = vm[:, None] * (ys[None, :] + 0.5)        # (B,H); src = x + src0

    if _use_pallas():
        # VMEM-resident cubic row-shift: one HBM read + write instead of a
        # roll/mad round-trip per shift pass (~7x on v5e, PERF.md)
        from imageretrievalresearch_tpu.ops.pallas_image import (
            pallas_row_shift_cubic,
        )
        planes = images.transpose(0, 3, 1, 2)              # (B,3,H,W)
        rows = planes.reshape(b * c * h, w)
        src_rows = jnp.broadcast_to(src0[:, None, :], (b, c, h)).reshape(-1)
        smax = int(_MAGS[SHEAR_X].max() * h) + 1
        out = pallas_row_shift_cubic(rows, src_rows, smax=smax, fill=FILL)
        return out.reshape(b, c, h, w).transpose(0, 2, 3, 1)

    vf = images.astype(jnp.float32).transpose(0, 3, 1, 2)   # (B,3,H,W)
    base = jnp.floor(src0).astype(jnp.int32)
    frac = src0 - base
    smax = int(_MAGS[SHEAR_X].max() * h) + 3        # |v| <= 0.3
    out = jnp.zeros_like(vf)
    col = jnp.arange(w, dtype=jnp.int32)[None, None, None, :]
    for s in range(-smax, smax + 1):
        coeff = jnp.zeros(base.shape, jnp.float32)
        for tap in range(-1, 3):
            coeff = coeff + jnp.where(base + tap == s,
                                      _cubic_kernel(frac - tap), 0.0)
        rolled = jnp.roll(vf, -s, axis=3)
        inside = (col + s >= 0) & (col + s <= w - 1)
        pix = jnp.where(inside, rolled, float(FILL))
        out = out + coeff[:, None, :, None] * pix
    srcx = jnp.arange(w, dtype=jnp.float32)[None, None, :] + src0[:, :, None]
    valid = (srcx >= -0.5) & (srcx <= w - 0.5)
    out = jnp.where(valid[:, None, :, :], out, float(FILL))
    out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out.transpose(0, 2, 3, 1)


def _nearest_row_shift(planes: jax.Array, v: jax.Array, smax: int,
                       radix: int = 8) -> jax.Array:
    """(B, C, H, W) uint8 + (B,) slopes -> per-row NEAREST shift about the
    vertical center: out(y, x) = in(y, x + s(y)), s = ⌊v·(y+½−H/2) + ½⌋.

    Gather-free and radix-factored: s = radix·q + r is applied as a coarse
    select-accumulate over rolls of radix·q followed by a fine one over r —
    ~2·smax/radix + radix select passes instead of 2·smax (compile size and
    runtime both scale with the pass count). All uint8 selects; rolls wrap,
    so out-of-image positions are masked to FILL from the total shift at
    the end."""
    b, c, h, w = planes.shape
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5 - h / 2.0
    s_by = jnp.floor(v[:, None] * ys[None, :] + 0.5).astype(jnp.int32)

    if _use_pallas():
        # all select passes VMEM-resident: one HBM read + write total
        from imageretrievalresearch_tpu.ops.pallas_image import (
            pallas_row_shift,
        )
        rows = planes.reshape(b * c * h, w)
        s_rows = jnp.broadcast_to(s_by[:, None, :], (b, c, h)).reshape(-1)
        out = pallas_row_shift(rows, s_rows, smax=smax, radix=radix,
                               fill=FILL)
        return out.reshape(b, c, h, w)

    q_by = s_by // radix                      # floor division
    r_by = s_by - radix * q_by                # in [0, radix)
    q4 = q_by[:, None, :, None]
    r4 = r_by[:, None, :, None]
    fill = jnp.asarray(FILL, planes.dtype)

    acc = jnp.zeros_like(planes)
    for q in range((-smax) // radix, smax // radix + 1):
        acc = jnp.where(q4 == q, jnp.roll(planes, -radix * q, axis=3), acc)
    out = jnp.zeros_like(planes)
    for r in range(radix):
        out = jnp.where(r4 == r, jnp.roll(acc, -r, axis=3), out)

    col = jnp.arange(w, dtype=jnp.int32)[None, None, None, :]
    src = col + s_by[:, None, :, None]
    return jnp.where((src >= 0) & (src <= w - 1), out, fill)


def batched_rotate(images: jax.Array, degrees: jax.Array) -> jax.Array:
    """(B, H, W, 3) uint8 + (B,) signed degrees -> rotated batch.

    Gather-free 3-shear decomposition of PIL NEAREST rotate:
    ``R(θ) = Sx(tan θ/2) · Sy(−sin θ) · Sx(tan θ/2)`` (output→source
    composition), each pass a per-row integer shift via roll-accumulate
    (:func:`_nearest_row_shift`; the Sy pass runs on the transposed image).
    Per-pass NEAREST rounding drifts ≤1 px from the exact single-gather
    rotate (:func:`op_rotate`) — 60-80% of pixels land identically, the
    rest on an adjacent pixel (immaterial for a random augmentation, ~5x
    faster than the gather form on TPU — see PERF.md). CPU keeps the exact
    gather for PIL parity.
    """
    b, h, w, c = images.shape
    theta = -jnp.deg2rad(degrees)
    a = jnp.tan(theta / 2.0)
    bb = -jnp.sin(theta)
    max_deg = float(_MAGS[ROTATE].max())
    smax_a = int(np.tan(np.deg2rad(max_deg) / 2.0) * (h / 2.0)) + 1
    smax_b = int(np.sin(np.deg2rad(max_deg)) * (w / 2.0)) + 1
    planes = images.transpose(0, 3, 1, 2)               # (B, 3, H, W)
    t1 = _nearest_row_shift(planes, a, smax_a)
    t2 = _nearest_row_shift(t1.transpose(0, 1, 3, 2), bb, smax_b)
    t3 = _nearest_row_shift(t2.transpose(0, 1, 3, 2), a, smax_a)
    return t3.transpose(0, 2, 3, 1)


_BATCHED_OPS = {
    EQUALIZE: lambda images, arg: batched_equalize(images),
    AUTOCONTRAST: lambda images, arg: batched_autocontrast(images),
    SHEAR_X: lambda images, arg: batched_shear_x(images, arg),
}

# the 3-shear rotate trades <=1 px NEAREST drift for ~5x speed — right for
# the TPU hot path, wrong for the CPU PIL-parity surface, so it joins the
# batched-op table only when compiling for TPU (same gate as the Pallas
# LUT/histogram kernels)
_BATCHED_OPS_TPU = dict(_BATCHED_OPS)
_BATCHED_OPS_TPU[ROTATE] = lambda images, arg: batched_rotate(images, arg)

# ops that can actually be selected at each stage position of the 25
# ImageNetPolicy sub-policies (shearY/translateX/translateY never appear;
# shearX and sharpness only in stage 0, autocontrast/contrast only in
# stage 1) — computing only these cuts dead batched work
_STAGE_OPS = tuple(
    tuple(sorted({_OP_IDS[sub[stage][0]] for sub in IMAGENET_SUBPOLICIES}))
    for stage in (0, 1))


def _apply_stage(images: jax.Array, op: jax.Array, mag: jax.Array,
                 do: jax.Array, sign: jax.Array,
                 op_set: tuple[int, ...]) -> jax.Array:
    """One policy stage over the whole batch, batched-by-op.

    Every selectable op is computed once batch-wide (vmapped over per-image
    magnitudes) and the per-image result chosen by a chain of vectorized
    selects. This keeps the compiled program to ~8 batched op instances per
    stage — a per-image ``lax.switch``/``cond`` structure under vmap makes
    XLA:TPU compile pathologically slow (>10 min vs ~30 s for this form;
    each op alone compiles in 0.5-4 s), and an elementwise gather over a
    stacked candidates array is far slower than the select chain on TPU.
    """
    geo = sign * mag
    enh = 1.0 + sign * mag
    opb = op.astype(jnp.int32)[:, None, None, None]
    batched_ops = _BATCHED_OPS_TPU if _use_pallas() else _BATCHED_OPS
    sel = images
    for k in op_set:
        arg = enh if k in _ENH_OPS else (geo if k in _GEO_OPS else mag)
        if k in batched_ops:
            cand = batched_ops[k](images, arg)
        else:
            cand = jax.vmap(_OP_FNS[k])(images, arg)
        sel = jnp.where(opb == k, cand, sel)
    return jnp.where(do[:, None, None, None], sel, images)


@jax.jit
def imagenet_policy_batch(images: jax.Array, key: jax.Array) -> jax.Array:
    """(B, H, W, 3) uint8 + key -> augmented uint8 batch.

    Per image: draw a sub-policy, then apply its two (op, prob, magnitude)
    stages with independent random signs — the public ImageNetPolicy
    semantics, executed as two batched-by-op stages.
    """
    b = images.shape[0]
    k_pol, k_p1, k_p2, k_s1, k_s2 = jax.random.split(key, 5)
    pol = jax.random.randint(k_pol, (b,), 0, len(IMAGENET_SUBPOLICIES))
    ops = jnp.asarray(_POLICY_OPS)[pol]              # (B, 2)
    probs = jnp.asarray(_POLICY_PROBS)[pol]
    mags = jnp.asarray(_POLICY_MAGS)[pol]
    do1 = jax.random.uniform(k_p1, (b,)) < probs[:, 0]
    do2 = jax.random.uniform(k_p2, (b,)) < probs[:, 1]
    s1 = jnp.where(jax.random.bernoulli(k_s1, shape=(b,)), 1.0, -1.0)
    s2 = jnp.where(jax.random.bernoulli(k_s2, shape=(b,)), 1.0, -1.0)
    out = _apply_stage(images, ops[:, 0], mags[:, 0], do1, s1, _STAGE_OPS[0])
    out = _apply_stage(out, ops[:, 1], mags[:, 1], do2, s2, _STAGE_OPS[1])
    return out


def imagenet_policy(img: jax.Array, key: jax.Array) -> jax.Array:
    """Single-image convenience wrapper around the batched policy."""
    return imagenet_policy_batch(img[None], key)[0]
