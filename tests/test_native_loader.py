"""Native C++ loader tests: decode parity vs PIL, batch path determinism,
loader integration, and a decode-throughput sanity comparison."""

import os
import time

import numpy as np
import pytest
from PIL import Image

from imageretrievalresearch_tpu.data import SketchyImageDataset, TripletLoader
from imageretrievalresearch_tpu.data import native_loader
from imageretrievalresearch_tpu.data.synthetic import make_sketchy_tree

pytestmark = pytest.mark.skipif(not native_loader.native_available(),
                                reason="native loader not built")


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return make_sketchy_tree(str(tmp_path_factory.mktemp("sk")), n_cats=3,
                             n_prods=2, n_photos=4, n_sketches=4, size=64)


class TestDecode:
    def test_jpeg_and_png_decode_match_pil(self, tree):
        import glob
        jpgs = sorted(glob.glob(os.path.join(tree, "photo/**/*.jpg"),
                                recursive=True))[:4]
        pngs = sorted(glob.glob(os.path.join(tree, "sketch/**/*.png"),
                                recursive=True))[:4]
        paths = jpgs + pngs
        ours = native_loader.decode_resize_batch(paths, 64, 64)
        for i, p in enumerate(paths):
            with Image.open(p) as im:
                ref = np.asarray(im.convert("RGB"))
            diff = np.abs(ours[i].astype(int) - ref.astype(int))
            # PNG is lossless -> exact; JPEG decoders may differ by +-1
            assert diff.max() <= (1 if p.endswith(".jpg") else 0), p

    def test_resize_close_to_pil_bilinear(self, tree):
        import glob
        p = sorted(glob.glob(os.path.join(tree, "photo/**/*.jpg"),
                             recursive=True))[0]
        ours = native_loader.decode_resize_batch([p], 32, 32)[0]
        with Image.open(p) as im:
            ref = np.asarray(im.convert("RGB").resize((32, 32),
                                                      Image.BILINEAR))
        diff = np.abs(ours.astype(int) - ref.astype(int))
        # PIL BILINEAR downscale uses an antialiasing triangle filter; ours
        # is pure bilinear — close but not identical
        assert diff.mean() < 14, diff.mean()

    def test_missing_file_fills_gray(self, tree):
        out = native_loader.decode_resize_batch(
            ["/nonexistent/x.jpg"], 16, 16)
        assert (out == 128).all()

    def test_strict_raises_on_decode_failure(self, tree):
        """The training loader decodes with strict=True so a failed decode
        raises (parity with the PIL path's IOError) instead of silently
        training on a gray-filled slot."""
        with pytest.raises(IOError, match="failed to decode"):
            native_loader.decode_resize_batch(["/nonexistent/x.jpg"], 16, 16,
                                              strict=True)

    def test_interlaced_png_decodes_correctly(self, tree, tmp_path):
        """Adam7-interlaced PNGs (a common export option) must be
        de-interlaced — plain row-by-row libpng reads return scrambled
        interlace-pass rows that count as a successful decode. Pillow
        cannot WRITE interlaced PNGs, so the file is hand-assembled."""
        import struct
        import zlib

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)
        h, w = img.shape[:2]
        # Adam7 pass grid: (x_start, y_start, x_step, y_step)
        passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                  (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        raw = bytearray()
        for xs, ys, xt, yt in passes:
            sub = img[ys::yt, xs::xt]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for row in sub:
                raw.append(0)                    # filter: None
                raw.extend(row.tobytes())

        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # RGB8, Adam7
        p = str(tmp_path / "interlaced.png")
        with open(p, "wb") as f:
            f.write(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(bytes(raw)))
                    + chunk(b"IEND", b""))
        with Image.open(p) as im:       # sanity: a real decoder agrees
            np.testing.assert_array_equal(np.asarray(im.convert("RGB")), img)
        out = native_loader.decode_resize_batch([p], h, w, strict=True)
        np.testing.assert_array_equal(out[0], img)


class TestLoaderIntegration:
    def test_native_batches_match_layout(self, tree):
        ds = SketchyImageDataset(data_dir=tree)
        dl = TripletLoader(ds, batch_size=8, num_workers=2, seed=3,
                           host_size=32, use_native=True)
        assert dl.use_native
        b = next(iter(dl))
        assert b["qry"].shape == (8, 32, 32, 3)
        assert b["pos"][0].shape == (8, 32, 32, 3)
        assert b["cat_idx"].shape == (8,)

    def test_native_and_python_paths_agree_on_sampling(self, tree):
        """Same seed/epoch -> both paths pick the same triplets (images may
        differ in resize filter, labels must match exactly)."""
        ds = SketchyImageDataset(data_dir=tree)
        nat = TripletLoader(ds, batch_size=8, num_workers=2, seed=3,
                            host_size=32, use_native=True)
        py = TripletLoader(ds, batch_size=8, num_workers=2, seed=3,
                           host_size=32, use_native=False)
        bn = next(iter(nat))
        bp = next(iter(py))
        np.testing.assert_array_equal(bn["cat_idx"], bp["cat_idx"])
        np.testing.assert_array_equal(bn["prod_idx"], bp["prod_idx"])

    def test_falls_back_without_host_size(self, tree):
        ds = SketchyImageDataset(data_dir=tree)
        dl = TripletLoader(ds, batch_size=4, use_native=True)  # no host_size
        assert not dl.use_native
        b = next(iter(dl))
        assert b["qry"].shape[0] == 4
