"""Pallas image-kernel tests (interpret mode) + batched-op consistency."""

import numpy as np
import jax
import jax.numpy as jnp

from imageretrievalresearch_tpu.ops import autoaugment as aa
from imageretrievalresearch_tpu.ops.pallas_image import (
    pallas_histogram,
    pallas_lut_apply,
    pallas_row_shift,
)


class TestKernels:
    def test_lut_apply_matches_gather(self, rng):
        img = rng.integers(0, 256, (6, 32, 40), dtype=np.uint8)
        lut = rng.integers(0, 256, (6, 256)).astype(np.int32)
        out = np.asarray(pallas_lut_apply(jnp.asarray(img), jnp.asarray(lut),
                                          interpret=True))
        ref = np.stack([lut[i][img[i]] for i in range(6)])
        np.testing.assert_array_equal(out, ref)

    def test_lut_apply_non_multiple_planes(self, rng):
        img = rng.integers(0, 256, (13, 16, 24), dtype=np.uint8)
        lut = rng.integers(0, 256, (13, 256)).astype(np.int32)
        out = np.asarray(pallas_lut_apply(jnp.asarray(img), jnp.asarray(lut),
                                          interpret=True))
        assert out.shape == (13, 16, 24)
        ref = np.stack([lut[i][img[i]] for i in range(13)])
        np.testing.assert_array_equal(out, ref)

    def test_row_shift_matches_numpy(self, rng):
        n, w, smax = 700, 224, 57
        rows = rng.integers(0, 256, (n, w), dtype=np.uint8)
        shifts = rng.integers(-smax, smax + 1, n).astype(np.int32)
        out = np.asarray(pallas_row_shift(jnp.asarray(rows),
                                          jnp.asarray(shifts), smax=smax,
                                          interpret=True))
        ref = np.full_like(rows, 128)
        for r in range(n):
            xs = np.arange(w) + shifts[r]
            ok = (xs >= 0) & (xs < w)
            ref[r, ok] = rows[r, xs[ok]]
        np.testing.assert_array_equal(out, ref)

    def test_row_shift_cubic_matches_xla_shear(self, rng):
        # the Pallas cubic row-shift must reproduce the XLA roll-accumulate
        # shear (same taps/weights; summation grouping differs -> ±1 on
        # rounding ties)
        b, h, w = 3, 48, 56
        imgs = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
        vm = jnp.asarray([-0.3, 0.05, 0.28], jnp.float32)
        ref = np.asarray(aa.batched_shear_x(jnp.asarray(imgs), vm))

        from imageretrievalresearch_tpu.ops.pallas_image import (
            pallas_row_shift_cubic,
        )
        ys = np.arange(h, dtype=np.float32)
        src0 = np.asarray(vm)[:, None] * (ys[None, :] + 0.5)
        planes = imgs.transpose(0, 3, 1, 2)
        rows = planes.reshape(-1, w)
        src_rows = np.broadcast_to(src0[:, None, :], (b, 3, h)).reshape(-1)
        smax = int(0.3 * h) + 1
        out = np.asarray(pallas_row_shift_cubic(
            jnp.asarray(rows), jnp.asarray(src_rows), smax=smax,
            interpret=True))
        out = out.reshape(b, 3, h, w).transpose(0, 2, 3, 1)
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert diff.max() <= 1, diff.max()

    def test_histogram_matches_bincount(self, rng):
        img = rng.integers(0, 256, (9, 16, 24), dtype=np.uint8)
        out = np.asarray(pallas_histogram(jnp.asarray(img), interpret=True))
        ref = np.stack([np.bincount(img[i].ravel(), minlength=256)
                        for i in range(9)])
        np.testing.assert_array_equal(out, ref)


class TestBatchedOps:
    def test_batched_equalize_matches_per_image(self, rng):
        imgs = rng.integers(0, 256, (5, 24, 32, 3), dtype=np.uint8)
        batched = np.asarray(aa.batched_equalize(jnp.asarray(imgs)))
        per = np.asarray(jax.vmap(aa.op_equalize)(
            jnp.asarray(imgs), jnp.zeros(5)))
        np.testing.assert_array_equal(batched, per)

    def test_batched_autocontrast_matches_per_image(self, rng):
        imgs = rng.integers(20, 200, (5, 24, 32, 3), dtype=np.uint8)
        batched = np.asarray(aa.batched_autocontrast(jnp.asarray(imgs)))
        per = np.asarray(jax.vmap(aa.op_autocontrast)(
            jnp.asarray(imgs), jnp.zeros(5)))
        np.testing.assert_array_equal(batched, per)

    def test_batched_shear_matches_per_image(self, rng):
        imgs = rng.integers(0, 256, (4, 48, 40, 3), dtype=np.uint8)
        for v in (0.25, -0.3, 0.05):
            vm = jnp.full((4,), v, jnp.float32)
            batched = np.asarray(aa.batched_shear_x(jnp.asarray(imgs), vm))
            per = np.asarray(jax.vmap(aa.op_shear_x)(jnp.asarray(imgs), vm))
            diff = np.abs(batched.astype(int) - per.astype(int))
            # accumulation-order rounding ties only
            assert diff.max() <= 1 and (diff > 0).mean() < 0.001

    def test_policy_still_deterministic(self, rng):
        imgs = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
        a = np.asarray(aa.imagenet_policy_batch(jnp.asarray(imgs),
                                                jax.random.key(5)))
        b = np.asarray(aa.imagenet_policy_batch(jnp.asarray(imgs),
                                                jax.random.key(5)))
        np.testing.assert_array_equal(a, b)
