"""Data-layer tests: split policies, candidate construction, loader batching."""

import json
import os

import numpy as np
import pytest

from imageretrievalresearch_tpu.data import (
    OriginalImageDataset,
    SketchyDataset,
    SketchyImageDataset,
    TripleDataset,
    TripletImageDataset,
    TripletLoader,
    data_split_original,
    data_split_sketchy,
    data_split_soft,
)
from imageretrievalresearch_tpu.data.original import OriginalDataset
from imageretrievalresearch_tpu.data.soft import TripletDataset
from imageretrievalresearch_tpu.data.synthetic import (
    make_classfolder_tree,
    make_original_tree,
    make_sketchy_tree,
    make_soft_tree,
)


@pytest.fixture(scope="module")
def sketchy_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sketchy")
    return make_sketchy_tree(str(root), n_cats=4, n_prods=2,
                             n_photos=4, n_sketches=3, size=32)


class TestDataSplit:
    def test_soft_split_has_all_classes_everywhere(self, sketchy_root, tmp_path):
        out = data_split_sketchy(sketchy_root, str(tmp_path / "s.json"),
                                 policy="cat", hard_split=False)
        d = json.load(open(out))
        def cats(paths):
            return {os.path.basename(os.path.dirname(p)) for p in paths}
        assert cats(d["train"]) == cats(d["val"]) == cats(d["test"])
        assert len(d["train"]) + len(d["val"]) + len(d["test"]) == 4 * 2 * 4

    def test_hard_split_classes_disjoint(self, sketchy_root, tmp_path):
        out = data_split_sketchy(sketchy_root, str(tmp_path / "h.json"),
                                 policy="cat", hard_split=True)
        d = json.load(open(out))
        def cats(paths):
            return {os.path.basename(os.path.dirname(p)) for p in paths}
        assert not (cats(d["train"]) & cats(d["val"]))
        assert not (cats(d["train"]) & cats(d["test"]))

    def test_split_deterministic(self, sketchy_root, tmp_path):
        a = json.load(open(data_split_sketchy(
            sketchy_root, str(tmp_path / "a.json"), hard_split=False, seed=7)))
        b = json.load(open(data_split_sketchy(
            sketchy_root, str(tmp_path / "b.json"), hard_split=False, seed=7)))
        assert a == b

    def test_original_split(self, tmp_path):
        root = make_original_tree(str(tmp_path / "orig"))
        out = data_split_original(root, str(tmp_path / "o.json"),
                                  policy="cat", hard_split=False)
        d = json.load(open(out))
        assert all("pdf_detail" not in p for k in d for p in d[k])

    def test_soft_layout_split(self, tmp_path):
        root = make_soft_tree(str(tmp_path / "soft"))
        out = data_split_soft(root, str(tmp_path / "sf.json"), policy="cat")
        d = json.load(open(out))
        assert set(d) == {"train", "val", "test"}
        assert all(p.split(root)[1].startswith("/real") for k in d for p in d[k])


class TestSketchyDataset:
    def test_candidate_policies(self, sketchy_root):
        ds = SketchyDataset(data_dir=sketchy_root, pos_policy="cat",
                            neg_policy="except_cat")
        assert ds.get_cat_length() == 4
        assert ds.get_prod_length() == 8
        assert len(ds) == 4 * 2 * 4  # all photos kept (all have candidates)
        item = ds[0]
        cat = ds.classify(ds.get_basepath(item["qry"]))[0]
        # positives: all sketches of same cat; negatives: none of same cat
        for p in item["pos"]:
            assert f"/sketch/tx_000000000000/{cat}/" in p
        for n in item["neg"]:
            assert f"/{cat}/" not in n

    def test_pos_prod_policy(self, sketchy_root):
        ds = SketchyDataset(data_dir=sketchy_root, pos_policy="prod",
                            neg_policy="except_prod")
        item = ds[0]
        prod = ds.classify(ds.get_basepath(item["qry"]))[1]
        for p in item["pos"]:
            assert os.path.basename(p).startswith(prod + "-")
        for n in item["neg"]:
            assert not os.path.basename(n).startswith(prod + "-")

    def test_in_cat_except_prod(self, sketchy_root):
        ds = SketchyDataset(data_dir=sketchy_root, pos_policy="prod",
                            neg_policy="in_cat_except_prod")
        item = ds[0]
        cat, prod = ds.classify(ds.get_basepath(item["qry"]))
        for n in item["neg"]:
            ncat, nprod = ds.classify(ds.get_basepath(n))
            assert ncat == cat and nprod != prod

    def test_sketch_qry_extends_queries(self, sketchy_root):
        base = SketchyDataset(data_dir=sketchy_root)
        ext = SketchyDataset(data_dir=sketchy_root, sketch_qry=True)
        assert len(ext) == len(base) + len(base.sketch_lst)

    def test_sketch_qry_candidates_unique_and_queries_deduped(
            self, sketchy_root, tmp_path):
        """The reference builds cat_dic BEFORE appending sketches to the
        query list (sketch_dataset.py:146-158), so positive-candidate
        lists hold each sketch ONCE (without-replacement sampling depends
        on it), and its final query list is pos_neg_dic.keys() — deduped
        even when a sketch_qry split json already contains sketches."""
        ext = SketchyDataset(data_dir=sketchy_root, sketch_qry=True)
        for cands in ext.index.pos_candidates:
            assert len(set(cands.tolist())) == len(cands)
        # split json produced with sketch_qry contains sketches; loading
        # it with sketch_qry=True must not double-count them as queries
        out = data_split_sketchy(sketchy_root, str(tmp_path / "sq.json"),
                                 hard_split=False, sketch_qry=True)
        ds = SketchyDataset(data_dir=sketchy_root, trainval_json=out,
                            trainval="train", sketch_qry=True)
        assert len(ds.image_lst) == len(set(ds.image_lst))

    def test_soft_two_way_split_actually_splits(self, sketchy_root,
                                                tmp_path):
        """A 2-way soft split must partition each bucket between train and
        val (the reference crashes on 2-way; a prior gate on the 3-way
        test slice silently made train == val == everything)."""
        out = data_split_sketchy(sketchy_root, str(tmp_path / "two.json"),
                                 policy="cat", hard_split=False,
                                 split=[0.8, 0.2])
        d = json.load(open(out))
        assert "test" not in d
        assert not (set(d["train"]) & set(d["val"]))
        assert len(d["train"]) + len(d["val"]) == 4 * 2 * 4
        assert len(d["train"]) > len(d["val"]) > 0

    def test_original_split_skips_stray_files(self, tmp_path):
        root = make_original_tree(str(tmp_path / "o"))
        # a stray root-level file and a previous run's split json must not
        # crash the (recursive-glob) parser
        with open(os.path.join(root, "README.txt"), "w") as f:
            f.write("stray")
        out = data_split_original(root, os.path.join(root, "split.json"),
                                  policy="prod", hard_split=False)
        d = json.load(open(out))
        assert all("README" not in p and "split.json" not in p
                   for part in d.values() for p in part)
        # re-running with the json present inside data_dir also works
        data_split_original(root, os.path.join(root, "split.json"),
                            policy="prod", hard_split=False)

    def test_trainval_json(self, sketchy_root, tmp_path):
        out = data_split_sketchy(sketchy_root, str(tmp_path / "tv.json"),
                                 hard_split=False)
        tr = SketchyDataset(data_dir=sketchy_root, trainval_json=out,
                            trainval="train")
        va = SketchyDataset(data_dir=sketchy_root, trainval_json=out,
                            trainval="val")
        assert len(tr) > len(va) > 0
        assert not (set(tr.image_lst) & set(va.image_lst))


class TestImageDatasets:
    def test_sketchy_image_sample(self, sketchy_root):
        ds = SketchyImageDataset(data_dir=sketchy_root, pos_return_num=2,
                                 neg_return_num=1)
        item = ds[0]
        assert item["qry"].shape == (32, 32, 3)
        assert len(item["pos"]) == 2 and len(item["neg"]) == 1
        assert isinstance(item["cat_idx"], int)

    def test_deterministic_given_rng(self, sketchy_root):
        ds = SketchyImageDataset(data_dir=sketchy_root)
        a = ds.__getitem__(3, rng=np.random.default_rng(5))
        b = ds.__getitem__(3, rng=np.random.default_rng(5))
        assert a["paths"] == b["paths"]

    def test_load_images_cache_size(self, sketchy_root):
        ds = SketchyImageDataset(data_dir=sketchy_root, load_images=True,
                                 cache_size=24)
        item = ds.__getitem__(0, rng=np.random.default_rng(0))
        assert item["qry"].shape == (24, 24, 3)
        assert item["pos"][0].shape == (24, 24, 3)

    def test_load_images_cache(self, sketchy_root):
        ds = SketchyImageDataset(data_dir=sketchy_root, load_images=True)
        assert len(ds._cache) == len(set(ds.sketch_lst) | set(ds.image_lst))
        item = ds[1]
        assert item["qry"].dtype == np.uint8

    def test_original_image_dataset(self, tmp_path):
        root = make_original_tree(str(tmp_path / "orig"))
        ds = OriginalImageDataset(data_dir=root, pos_policy="prod",
                                  neg_policy="except_cat")
        item = ds[0]
        assert item["qry"].shape == (64, 64, 3)
        for p in item["paths"]["pos"]:
            assert "pdf_detail" in p

    def test_soft_image_dataset(self, tmp_path):
        root = make_soft_tree(str(tmp_path / "soft"))
        ds = TripletImageDataset(data_dir=root, pos_policy="prod",
                                 neg_policy="except_cat")
        item = ds[0]
        assert item["qry"].shape == (64, 64, 3)

    def test_original_dataset_skips_stray_files(self, tmp_path):
        """Construction (not just data_split) must survive the recursive
        glob picking up a previous split json / root README — the same
        guard data_split_original carries."""
        from imageretrievalresearch_tpu.data.splits import data_split_original

        root = make_original_tree(str(tmp_path / "o"))
        data_split_original(root, os.path.join(root, "split.json"),
                            policy="prod", hard_split=False)
        with open(os.path.join(root, "README.txt"), "w") as f:
            f.write("stray")
        ds = OriginalDataset(data_dir=root)
        assert len(ds) > 0
        assert all("README" not in p and "split.json" not in p
                   for p in ds.image_lst)

    def test_original_labels_enumerate_photos_only(self, tmp_path):
        """cat_idx/prod_idx freeze after the photo walk (reference
        original_dataset.py:182-189): a sketch-only category must feed the
        candidate dicts but not grow the label space the classifier head
        is sized by."""
        root = make_original_tree(str(tmp_path / "o2"))
        n_cats = OriginalDataset(data_dir=root).get_cat_length()
        # add a category with ONLY pdf_detail sketches (no photos)
        extra = os.path.join(root, "zonly", "pdf_detail")
        os.makedirs(extra)
        from PIL import Image as _I
        _I.new("RGB", (64, 64), (1, 2, 3)).save(
            os.path.join(extra, "x_77_0.png"))
        ds = OriginalDataset(data_dir=root)
        assert ds.get_cat_length() == n_cats
        assert "zonly" not in ds.cat_idx

    def test_soft_dataset_skips_unparseable_files(self, tmp_path):
        root = make_soft_tree(str(tmp_path / "s2"))
        baseline = len(TripletDataset(data_dir=root).image_lst)
        from PIL import Image as _I
        # stray file directly under real/ and an underscore-less stem
        _I.new("RGB", (64, 64)).save(os.path.join(root, "real", "stray.jpg"))
        cat = next(d for d in os.listdir(os.path.join(root, "real"))
                   if os.path.isdir(os.path.join(root, "real", d)))
        _I.new("RGB", (64, 64)).save(
            os.path.join(root, "real", cat, "nounderscore.jpg"))
        ds = TripletDataset(data_dir=root)
        assert len(ds.image_lst) == baseline     # both skipped, no crash

    def test_image_mode_rejects_random_false_everywhere(self, tmp_path):
        """The random=True construction guard lives in the shared mixin, so
        all three families fail fast instead of after minutes of eager
        decoding (previously only SketchyImageDataset had it)."""
        for cls in (SketchyImageDataset, OriginalImageDataset,
                    TripletImageDataset):
            with pytest.raises(ValueError, match="random=True"):
                cls(data_dir=str(tmp_path), random=False, data_json="x")

    def test_triple_dataset(self, tmp_path):
        photo_root, sketch_root = make_classfolder_tree(str(tmp_path / "cf"))
        ds = TripleDataset(photo_root, sketch_root)
        item = ds.__getitem__(0, rng=np.random.default_rng(0))
        assert set(item) == {"P", "S", "N", "L"}
        assert item["P"].shape == (64, 64, 3)
        assert 0 <= item["L"] < len(ds.classes)

    def test_triple_dataset_ignores_stray_files_and_validates(self,
                                                              tmp_path):
        """Non-image files (.DS_Store etc.) must not enter the sampling
        universe, and class misalignment fails at construction, not deep
        inside a training step."""
        photo_root, sketch_root = make_classfolder_tree(str(tmp_path / "cf"))
        with open(os.path.join(photo_root, "class0", ".DS_Store"), "w") as f:
            f.write("junk")
        with open(os.path.join(sketch_root, "class1", "notes.txt"), "w") as f:
            f.write("junk")
        ds = TripleDataset(photo_root, sketch_root)
        assert all(p.lower().endswith((".jpg", ".png"))
                   for p in ds.photo_paths)
        for i in range(len(ds)):
            item = ds.__getitem__(i, rng=np.random.default_rng(i))
            assert item["P"].ndim == 3
        # photo class with no sketch folder -> constructor-time error
        os.makedirs(os.path.join(photo_root, "classX"))
        with open(os.path.join(photo_root, "classX", "p.jpg"), "wb") as f:
            from PIL import Image
            Image.new("RGB", (8, 8)).save(f, format="JPEG")
        with pytest.raises(ValueError, match="no sketches"):
            TripleDataset(photo_root, sketch_root)

    def test_triple_dataset_decode_cache(self, tmp_path):
        """--cache parity with the other families: load_images pre-decodes
        every photo AND sketch at cache_size."""
        photo_root, sketch_root = make_classfolder_tree(str(tmp_path / "cf"))
        ds = TripleDataset(photo_root, sketch_root, load_images=True,
                           cache_size=16)
        assert len(ds._cache) == len(ds.image_lst) + len(ds.sketch_lst)
        item = ds.__getitem__(0, rng=np.random.default_rng(0))
        assert item["P"].shape == (16, 16, 3)
        assert item["S"].shape == (16, 16, 3)

    def test_triple_dataset_shared_cache_store(self, tmp_path):
        """The train CLI's train/val TripleDataset pair shares one decode
        cache: the sketch universe is split-independent, so a second
        instance must reuse (not re-decode, not re-hold) the first's
        arrays."""
        photo_root, sketch_root = make_classfolder_tree(str(tmp_path / "cf"))
        store: dict = {}
        tr = TripleDataset(photo_root, sketch_root, split="train",
                           load_images=True, cache_size=16,
                           cache_store=store)
        n_after_train = len(store)
        decoded_by_train = {p: id(a) for p, a in store.items()}
        va = TripleDataset(photo_root, sketch_root, split="val",
                           load_images=True, cache_size=16,
                           cache_store=store)
        assert tr._cache is store and va._cache is store
        # every sketch was already decoded by the train instance; only
        # photos unseen by the train split could be new — on this tree the
        # splits cover the same photo universe, so nothing is re-decoded
        for p, aid in decoded_by_train.items():
            assert id(store[p]) == aid, f"re-decoded {p}"
        assert len(store) >= n_after_train
        item = va.__getitem__(0, rng=np.random.default_rng(0))
        assert item["S"].shape == (16, 16, 3)


class TestTripletLoader:
    def test_batches(self, sketchy_root):
        ds = SketchyImageDataset(data_dir=sketchy_root)
        dl = TripletLoader(ds, batch_size=8, num_workers=2, seed=1)
        batches = list(dl)
        assert len(batches) == len(ds) // 8
        b = batches[0]
        assert b["qry"].shape == (8, 32, 32, 3)
        assert b["pos"][0].shape == (8, 32, 32, 3)
        assert b["cat_idx"].shape == (8,)
        assert b["qry"].dtype == np.uint8

    def test_epoch_determinism_and_reshuffle(self, sketchy_root):
        ds = SketchyImageDataset(data_dir=sketchy_root)
        dl = TripletLoader(ds, batch_size=8, num_workers=2, seed=1)
        dl.set_epoch(0)
        a = next(iter(dl))
        dl.set_epoch(0)
        b = next(iter(dl))
        np.testing.assert_array_equal(a["qry"], b["qry"])
        dl.set_epoch(1)
        c = next(iter(dl))
        assert not np.array_equal(a["qry"], c["qry"])

    def test_host_resize(self, sketchy_root):
        ds = SketchyImageDataset(data_dir=sketchy_root)
        dl = TripletLoader(ds, batch_size=4, num_workers=1, host_size=24)
        b = next(iter(dl))
        assert b["qry"].shape == (4, 24, 24, 3)

    def test_multiprocess_partial_batch_even_slices(self, sketchy_root):
        """drop_last=False partial batches must split into EQUAL per-process
        slices (trailing remainder dropped identically everywhere): unequal
        local sizes would desynchronize the processes' run/skip decision for
        the collective eval step — some enter the SPMD program, others skip
        it, and the run deadlocks."""
        ds = SketchyImageDataset(data_dir=sketchy_root)
        n = len(ds)
        bs = 6  # even (divides process_count) and 32 % 6 == 2: partial batch
        assert n % bs != 0, "fixture must leave a partial final batch"
        single = list(TripletLoader(ds, bs, shuffle=False, drop_last=False,
                                    num_workers=1))
        parts = [list(TripletLoader(ds, bs, shuffle=False, drop_last=False,
                                    num_workers=1, process_index=r,
                                    process_count=2)) for r in range(2)]
        assert len(parts[0]) == len(parts[1])
        for b0, b1 in zip(*parts):
            # the collective-consistency invariant: identical local sizes
            assert b0["qry"].shape[0] == b1["qry"].shape[0] > 0
        # batches of fewer rows than the process count vanish entirely
        # (identically on every process); the rest keep 2*(m//2) rows and
        # reassemble the single-process composition exactly
        kept = [sb for sb in single if sb["qry"].shape[0] >= 2]
        assert len(parts[0]) == len(kept)
        saw_partial = False
        for i, sb in enumerate(kept):
            m = sb["qry"].shape[0]
            saw_partial |= m < bs
            glob = np.concatenate([parts[0][i]["qry"], parts[1][i]["qry"]])
            np.testing.assert_array_equal(glob, sb["qry"][: 2 * (m // 2)])
        assert saw_partial, "test never exercised a partial batch"

    def test_abandoned_iterator_releases_producer_thread(self, sketchy_root):
        """Breaking out of iteration mid-epoch must not leave the producer
        thread blocked forever on a full prefetch queue (ADVICE r1)."""
        import threading
        import time

        ds = SketchyImageDataset(data_dir=sketchy_root)
        dl = TripletLoader(ds, batch_size=2, num_workers=1, prefetch=1)
        before = {t.ident for t in threading.enumerate()}
        it = iter(dl)
        next(it)          # producer now filling/blocked on the tiny queue
        it.close()        # abandon mid-epoch -> generator finally sets stop
        deadline = time.time() + 10.0
        while time.time() < deadline:
            extra = [t for t in threading.enumerate()
                     if t.ident not in before and t.is_alive()
                     and t.name.startswith("Thread")]
            if not extra:
                break
            time.sleep(0.05)
        assert not extra, f"producer thread leaked: {extra}"


class TestImageFolderDataset:
    """T5's ImageFolder surface (train_vit_crossentropy.py:50,59):
    classes = sorted subfolders, seeded 80/20 train/val holdout."""

    @pytest.fixture(scope="class")
    def folder_root(self, tmp_path_factory):
        photo_root, _ = make_classfolder_tree(
            str(tmp_path_factory.mktemp("imf")), n_classes=3, n_photos=5,
            n_sketches=1, size=32)
        return photo_root

    def test_classes_and_items(self, folder_root):
        from imageretrievalresearch_tpu.data import ImageFolderDataset

        ds = ImageFolderDataset(folder_root)
        assert ds.classes == ["class0", "class1", "class2"]
        assert ds.get_cat_length() == 3
        assert len(ds) == 15
        item = ds[0]
        assert item["image"].dtype == np.uint8
        assert item["image"].shape == (32, 32, 3)
        assert item["label"] == 0
        # label matches the folder the path lives in
        for i in range(len(ds)):
            path, lbl = ds.samples[i]
            assert f"class{lbl}" in path

    def test_split_disjoint_seeded_and_complete(self, folder_root):
        from imageretrievalresearch_tpu.data import ImageFolderDataset

        tr = ImageFolderDataset(folder_root, split="train", seed=7)
        va = ImageFolderDataset(folder_root, split="val", seed=7)
        assert len(tr) == 12 and len(va) == 3   # int(15*0.8) = 12
        tr_paths = {p for p, _ in tr.samples}
        va_paths = {p for p, _ in va.samples}
        assert not (tr_paths & va_paths)
        assert len(tr_paths | va_paths) == 15
        # seeded: same seed reproduces, different seed differs
        tr2 = ImageFolderDataset(folder_root, split="train", seed=7)
        assert tr.samples == tr2.samples
        tr3 = ImageFolderDataset(folder_root, split="train", seed=8)
        assert tr.samples != tr3.samples

    def test_loader_collates_image_batches(self, folder_root):
        from imageretrievalresearch_tpu.data import ImageFolderDataset

        ds = ImageFolderDataset(folder_root)
        dl = TripletLoader(ds, batch_size=4, num_workers=2, host_size=24,
                           shuffle=False, drop_last=False)
        batches = list(dl)
        assert len(batches) == 4                 # 15 items -> 4,4,4,3
        b = batches[0]
        assert set(b) == {"image", "label"}
        assert b["image"].shape == (4, 24, 24, 3)
        assert b["image"].dtype == np.uint8
        assert b["label"].dtype == np.int32
        assert batches[-1]["image"].shape[0] == 3

    def test_cache_roundtrip(self, folder_root):
        from imageretrievalresearch_tpu.data import ImageFolderDataset

        ds = ImageFolderDataset(folder_root, load_images=True, cache_size=16)
        assert ds[0]["image"].shape == (16, 16, 3)
