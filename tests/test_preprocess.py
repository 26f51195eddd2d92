"""Preprocessing op tests: SquarePad parity vs PIL, resize/normalize pipelines."""

import numpy as np
import pytest
from PIL import Image, ImageOps

from imageretrievalresearch_tpu.ops import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    TransformSpec,
    build_batch_transform,
    square_pad,
)
from imageretrievalresearch_tpu.ops.preprocess import build_triplet_transform
import jax


class TestSquarePad:
    @pytest.mark.parametrize("h,w", [(30, 50), (50, 30), (31, 50), (40, 40)])
    def test_matches_reference_padding(self, rng, h, w):
        # reference utils/square_pad.py:29-36: left/top = (max-d)//2,
        # remainder to right/bottom, fill 255
        im = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        ours = np.asarray(square_pad(im[None]))[0]
        m = max(h, w)
        hp, hp_rem = (m - w) // 2, (m - w) % 2
        vp, vp_rem = (m - h) // 2, (m - h) % 2
        pil = ImageOps.expand(Image.fromarray(im),
                              border=(hp, vp, hp + hp_rem, vp + vp_rem),
                              fill=(255, 255, 255))
        theirs = np.asarray(pil)
        assert ours.shape == (m, m, 3)
        np.testing.assert_array_equal(ours, theirs)


class TestTransformSpecs:
    def test_train_plain_range_and_shape(self, rng):
        fn = build_batch_transform(TransformSpec.train_plain(32))
        x = rng.integers(0, 256, size=(4, 64, 48, 3), dtype=np.uint8)
        out = np.asarray(fn(x))
        assert out.shape == (4, 32, 32, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_eval_squarepad_normalize(self, rng):
        fn = build_batch_transform(TransformSpec.eval_squarepad())
        x = np.full((2, 20, 30, 3), 255, dtype=np.uint8)
        out = np.asarray(fn(x))
        assert out.shape == (2, 30, 30, 3)
        # all-white input + white pad -> (1 - mean) / std everywhere
        expect = (1.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        np.testing.assert_allclose(out[0, 0, 0], expect, rtol=1e-5)

    def test_resize_close_to_pil_bilinear(self, rng):
        im = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        fn = build_batch_transform(TransformSpec.train_plain(32))
        ours = np.asarray(fn(im[None]))[0]
        pil = np.asarray(Image.fromarray(im).resize((32, 32),
                                                    Image.BILINEAR),
                         dtype=np.float32) / 255.0
        # antialiased downscale: close but not bitwise (PIL uses a
        # triangle filter); tolerance per-pixel
        assert np.abs(ours - pil).mean() < 0.01

    def test_triplet_transform(self, rng):
        fn = build_triplet_transform(TransformSpec.train_plain(16),
                                     TransformSpec.train_plain(16),
                                     TransformSpec.train_plain(16))
        batch = {
            "qry": rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8),
            "pos": [rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)],
            "neg": [rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)],
            "cat_idx": np.array([0, 1], dtype=np.int32),
            "prod_idx": np.array([2, 3], dtype=np.int32),
        }
        out = fn(batch)
        assert out["qry"].shape == (2, 16, 16, 3)
        assert out["pos"][0].shape == (2, 16, 16, 3)
        np.testing.assert_array_equal(np.asarray(out["cat_idx"]), [0, 1])

    def test_bfloat16_output(self, rng):
        fn = build_batch_transform(
            TransformSpec(resize=(16, 16), dtype="bfloat16"))
        x = rng.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8)
        assert fn(x).dtype == jax.numpy.bfloat16
