"""gallery CLI: build/info/query/serve + micro-batcher concurrency.

Split from the original tests/test_cli.py so every CLI test file fits the
~590 s background-shell cap on this 1-core host (VERDICT r3 weak #6).
"""

import json
import os

import numpy as np
import pytest

from imageretrievalresearch_tpu.data.synthetic import make_sketchy_tree


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return make_sketchy_tree(str(tmp_path_factory.mktemp("sk")), n_cats=3,
                             n_prods=1, n_photos=8, n_sketches=4, size=32)


class TestGalleryCLI:
    def test_build_info_query_roundtrip(self, tree, tmp_path, capsys):
        """Serving flow: inference --save_gallery -> gallery info ->
        gallery query on photo files from the same tree."""
        import glob
        import json

        from imageretrievalresearch_tpu.cli.gallery import (
            build_parser,
            run,
        )
        from imageretrievalresearch_tpu.cli.inference import (
            build_parser as inf_parser,
            run as inf_run,
        )

        npz = str(tmp_path / "gal.npz")
        inf_run(inf_parser().parse_args([
            "-ip", tree, "-mn", "efficientnet_b0", "-is", "32", "-bs", "8",
            "--save_gallery", npz,
        ]))
        capsys.readouterr()

        run(build_parser().parse_args(["info", npz]))
        info = json.loads(capsys.readouterr().out)
        assert info["items"] > 0 and info["meta"]["model"] == "efficientnet_b0"

        photos = sorted(glob.glob(tree + "/photo/tx_000000000000/*/*"))[:3]
        run(build_parser().parse_args(
            ["query", npz, *photos, "-bs", "4", "-k", "24",
             "--num_unique", "2", "--matmul_dtype", "bfloat16"]))
        lines = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines()]
        assert len(lines) == 3
        for rec in lines:
            assert len(rec["indices"]) == 2          # num_unique dedup
            assert len(set(rec["classes"])) == 2     # distinct classes
            assert all(0 <= i < info["items"] for i in rec["indices"])
            assert all(np.isfinite(rec["scores"]))

        # the certified capacity mode + its knobs through the same CLI
        run(build_parser().parse_args(
            ["query", npz, *photos, "-bs", "4", "-k", "8",
             "--num_unique", "2", "--matmul_dtype", "int8_rerank",
             "--shortlist", "12"]))
        rr = [json.loads(l) for l in
              capsys.readouterr().out.strip().splitlines()]
        # the f32-parity path: --precision highest
        run(build_parser().parse_args(
            ["query", npz, *photos, "-bs", "4", "-k", "8",
             "--num_unique", "2", "--precision", "highest"]))
        hi = [json.loads(l) for l in
              capsys.readouterr().out.strip().splitlines()]
        assert len(rr) == 3 and len(hi) == 3
        for rec_r, rec_h in zip(rr, hi):
            assert len(rec_r["indices"]) == 2
            assert all(np.isfinite(rec_r["scores"]))
            # the refined re-rank and the true-f32 ranking agree on the
            # top hit (CPU scores are true f32; rerank error ~1e-5)
            assert rec_r["indices"][0] == rec_h["indices"][0]

    def test_artifact_records_architecture_and_load_stack_uses_it(
            self, tree, tmp_path, capsys, monkeypatch):
        """Checkpoint loading needs the trained classifier width: the
        artifact must record num_classes/conv_input and the gallery CLI
        must rebuild the model with them (a num_classes=1 head cannot
        load any real checkpoint)."""
        import json

        from imageretrievalresearch_tpu.cli import gallery as G
        from imageretrievalresearch_tpu.cli.inference import (
            build_parser as inf_parser,
            run as inf_run,
        )
        from imageretrievalresearch_tpu.retrieval import GalleryIndex

        npz = str(tmp_path / "gal.npz")
        inf_run(inf_parser().parse_args([
            "-ip", tree, "-mn", "efficientnet_b0", "-is", "32", "-bs", "8",
            "--save_gallery", npz,
        ]))
        capsys.readouterr()
        idx = GalleryIndex.load(npz)
        assert idx.meta["num_classes"] == 3       # synthetic tree classes
        assert idx.meta["conv_input"] is False

        import imageretrievalresearch_tpu.models as models_pkg
        real_create = models_pkg.create_model
        captured = {}

        def spy(name, **kw):
            captured.update(kw, model=name)
            return real_create(name, **kw)

        monkeypatch.setattr(models_pkg, "create_model", spy)
        args = G.build_parser().parse_args(["query", npz, "x.jpg",
                                            "-bs", "4"])
        G._load_stack(args, idx)
        assert captured["num_classes"] == 3
        assert captured["conv_input"] is False
        assert captured["model"] == "efficientnet_b0"

    def test_build_from_image_tree_records_paths_and_classes(
            self, tree, tmp_path, capsys):
        """`gallery build` on a class-per-subfolder tree: classes from the
        folder names, per-item paths recorded (so query results carry
        them), compact storage honored."""
        import json

        from imageretrievalresearch_tpu.cli.gallery import (
            build_parser,
            run,
        )

        photo_root = tree + "/photo/tx_000000000000"
        npz = str(tmp_path / "built.npz")
        run(build_parser().parse_args(
            ["build", npz, photo_root, "-mn", "efficientnet_b0",
             "-is", "32", "-bs", "8", "--gallery_dtype", "bfloat16"]))
        capsys.readouterr()

        run(build_parser().parse_args(["info", npz]))
        info = json.loads(capsys.readouterr().out)
        assert info["items"] == 24 and info["classes"] == 3
        assert info["meta"]["class_names"] == ["cat0", "cat1", "cat2"]
        assert info["meta"]["num_classes"] == 3

        import glob
        photos = sorted(glob.glob(photo_root + "/*/*"))[:2]
        run(build_parser().parse_args(
            ["query", npz, *photos, "-bs", "4", "-k", "24",
             "--num_unique", "2"]))
        lines = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines()]
        assert len(lines) == 2
        for rec in lines:
            assert rec["paths"] is not None
            assert all(p.startswith(photo_root) for p in rec["paths"])

    def test_serve_endpoint(self, tree, tmp_path, capsys):
        """HTTP serving flow: build artifact -> serve -> /healthz ->
        POST /search with a raw image body."""
        import glob
        import json
        import threading
        import urllib.request

        from imageretrievalresearch_tpu.cli.gallery import (
            _make_server,
            build_parser,
        )
        from imageretrievalresearch_tpu.cli.inference import (
            build_parser as inf_parser,
            run as inf_run,
        )

        npz = str(tmp_path / "gal.npz")
        inf_run(inf_parser().parse_args([
            "-ip", tree, "-mn", "efficientnet_b0", "-is", "32", "-bs", "8",
            "--save_gallery", npz, "--gallery_dtype", "int8",
        ]))
        capsys.readouterr()

        srv = _make_server(build_parser().parse_args(
            ["serve", npz, "--port", "0", "-k", "24", "--num_unique", "2",
             "--matmul_dtype", "int8"]))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{srv.server_address[1]}"
            with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
                health = json.loads(r.read())
            assert health["ok"] and health["items"] > 0

            photo = sorted(glob.glob(
                tree + "/photo/tx_000000000000/*/*"))[0]
            req = urllib.request.Request(
                base + "/search?num_unique=2", data=open(photo, "rb").read(),
                method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                rec = json.loads(r.read())
            assert len(rec["indices"]) == 2
            assert len(set(rec["classes"])) == 2
            assert all(0 <= i < health["items"] for i in rec["indices"])

            # client k/num_unique are CLAMPED to the server config (k is a
            # jit-static arg — honoring arbitrary client k would let one
            # client force unbounded recompiles); oversized values must not
            # change the compiled program, just the response
            big = urllib.request.Request(
                base + "/search?k=9999&num_unique=50",
                data=open(photo, "rb").read(), method="POST")
            with urllib.request.urlopen(big, timeout=120) as r:
                rec2 = json.loads(r.read())
            assert len(rec2["indices"]) <= 2   # clamped to server config

            # num_unique=0 selects the raw (non-dedup) ranking even though
            # the server default dedups; client k truncates the response
            raw = urllib.request.Request(
                base + "/search?num_unique=0&k=3",
                data=open(photo, "rb").read(), method="POST")
            with urllib.request.urlopen(raw, timeout=120) as r:
                rec3 = json.loads(r.read())
            assert len(rec3["indices"]) == 3
            assert rec3["scores"] == sorted(rec3["scores"], reverse=True)

            # oversized Content-Length -> 413 before the body is buffered
            import http.client
            conn = http.client.HTTPConnection(
                "127.0.0.1", srv.server_address[1], timeout=30)
            conn.putrequest("POST", "/search")
            conn.putheader("Content-Length", str(64 * 1024 * 1024))
            conn.endheaders()
            assert conn.getresponse().status == 413
            conn.close()

            # negative Content-Length -> 400, NOT read-until-EOF (a
            # negative n would make rfile.read(n) buffer the socket
            # unboundedly, bypassing the size cap)
            conn = http.client.HTTPConnection(
                "127.0.0.1", srv.server_address[1], timeout=30)
            conn.putrequest("POST", "/search", skip_accept_encoding=True)
            conn.putheader("Content-Length", "-1")
            conn.endheaders()
            assert conn.getresponse().status == 400
            conn.close()

            # malformed body -> structured 400, server stays up
            bad = urllib.request.Request(base + "/search", data=b"not-an-img",
                                         method="POST")
            try:
                urllib.request.urlopen(bad, timeout=30)
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400 and "error" in json.loads(e.read())
            with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
                assert json.loads(r.read())["ok"]
        finally:
            srv.shutdown()
            srv.server_close()

        # the default (float32) serving dtype takes a different resident
        # form — (gallery, norms) with build-time norms — through the
        # same fused one-dispatch search; same artifact, fresh server
        srv2 = _make_server(build_parser().parse_args(
            ["serve", npz, "--port", "0", "-k", "8", "--num_unique", "2"]))
        t2 = threading.Thread(target=srv2.serve_forever, daemon=True)
        t2.start()
        try:
            base = f"http://127.0.0.1:{srv2.server_address[1]}"
            photo = sorted(glob.glob(
                tree + "/photo/tx_000000000000/*/*"))[0]
            req = urllib.request.Request(
                base + "/search?num_unique=2",
                data=open(photo, "rb").read(), method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                rec = json.loads(r.read())
            assert len(rec["indices"]) == 2
            assert all(np.isfinite(rec["scores"]))
        finally:
            srv2.shutdown()
            srv2.server_close()

    def test_serve_rejects_empty_gallery(self, tmp_path):
        """An empty artifact must fail at server startup, not answer 200
        with empty rankings."""
        from imageretrievalresearch_tpu.cli.gallery import (
            _make_server,
            build_parser,
        )
        from imageretrievalresearch_tpu.retrieval import GalleryIndex

        art = str(tmp_path / "empty.npz")
        GalleryIndex(8).save(art)
        with pytest.raises(SystemExit, match="empty"):
            _make_server(build_parser().parse_args(
                ["serve", art, "--port", "0"]))

    def test_microbatcher_coalesces_concurrent_requests(self):
        """Concurrent submits drain into fewer device dispatches; results
        route back to the right request; num_unique groups rank
        separately."""
        import threading
        import time

        import numpy as np

        from imageretrievalresearch_tpu.cli.gallery import _MicroBatcher

        def slow_search(xs, nu):
            time.sleep(0.15)           # hold the worker so requests pile up
            return [{"marker": float(x[0, 0, 0]), "nu": nu} for x in xs]

        b = _MicroBatcher(slow_search, max_batch=8)
        results = {}

        def post(i):
            x = np.full((1, 2, 2, 3), i, np.uint8)
            results[i] = b.submit(x, 1 if i % 2 else 0)

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert len(results) == 6
        for i, rec in results.items():
            assert rec["marker"] == float(i)
            assert rec["nu"] == (1 if i % 2 else 0)
        assert b.requests == 6
        # first request dispatches alone (worker idle); the rest coalesce
        # while the slow embed holds the worker
        assert b.dispatches < 6
        # stop() terminates the worker thread; later submits fail fast
        b.stop()
        assert not b._thread.is_alive()
        with pytest.raises(RuntimeError, match="stopped"):
            b.submit(np.zeros((1, 2, 2, 3), np.uint8), 0)

    def test_submit_relays_worker_errors(self):
        import numpy as np

        from imageretrievalresearch_tpu.cli.gallery import _MicroBatcher

        def bad_search(xs, nu):
            raise RuntimeError("boom")

        b = _MicroBatcher(bad_search, max_batch=4)
        with pytest.raises(RuntimeError, match="boom"):
            b.submit(np.zeros((1, 2, 2, 3), np.uint8), 0)
        b.stop()

    def test_worker_death_releases_inflight_and_future_submits(self):
        """A non-Exception escaping search_fn (SystemExit: e.g. a wedged
        device call aborting) kills the worker thread; the in-flight
        request must get an error (not hang forever) and later submits
        must fail fast instead of queueing onto a dead worker."""
        import numpy as np

        from imageretrievalresearch_tpu.cli.gallery import _MicroBatcher

        def dying_search(xs, nu):
            raise SystemExit(3)

        b = _MicroBatcher(dying_search, max_batch=4)
        with pytest.raises(RuntimeError, match="died"):
            b.submit(np.zeros((1, 2, 2, 3), np.uint8), 0)
        b._thread.join(timeout=10)
        assert not b._thread.is_alive()
        with pytest.raises(RuntimeError, match="stopped"):
            b.submit(np.zeros((1, 2, 2, 3), np.uint8), 0)

    def test_release_pending_preserves_stop_sentinel(self):
        """A submit racing stop() drains the queue while the worker is
        still busy in search_fn; if that drain swallowed the stop()
        sentinel, the worker would block in Queue.get forever — the exact
        thread leak stop() exists to prevent."""
        import threading
        import time

        import numpy as np

        from imageretrievalresearch_tpu.cli.gallery import _MicroBatcher

        gate = threading.Event()

        def gated_search(xs, nu):
            gate.wait(timeout=30)      # worker held "compiling"
            return [{"ok": True} for _ in xs]

        b = _MicroBatcher(gated_search, max_batch=4)
        t = threading.Thread(
            target=lambda: b.submit(np.zeros((1, 2, 2, 3), np.uint8), 0))
        t.start()
        deadline = time.time() + 5.0   # wait until the worker dequeued the
        while not b._q.empty() and time.time() < deadline:  # submit's slot
            time.sleep(0.01)
        time.sleep(0.05)               # ...and entered gated_search
        # stop()'s sentinel lands while the worker is busy; a racing
        # submit's drain runs next (the interleaving under test)
        b._stopped = True
        b._q.put(None)
        slot = {"x": np.zeros((1, 2, 2, 3), np.uint8), "nu": 0,
                "ev": threading.Event()}
        b._q.put(slot)
        b._release_pending()
        # the raced slot is errored out, the sentinel survives
        assert isinstance(slot.get("err"), RuntimeError)
        assert slot["ev"].is_set()
        gate.set()                     # worker finishes, must see the
        t.join(timeout=10)             # sentinel and exit
        b._thread.join(timeout=10)
        assert not b._thread.is_alive(), "worker leaked: sentinel swallowed"
        b.stop()                       # idempotent

    def test_concurrent_posts_all_answered(self, tree, tmp_path, capsys):
        """e2e: concurrent POSTs against the live endpoint all return
        correct rankings and are counted by the batcher."""
        import glob
        import json
        import threading
        import urllib.request

        from imageretrievalresearch_tpu.cli.gallery import (
            _make_server,
            build_parser,
        )
        from imageretrievalresearch_tpu.cli.inference import (
            build_parser as inf_parser,
            run as inf_run,
        )

        npz = str(tmp_path / "gal.npz")
        inf_run(inf_parser().parse_args([
            "-ip", tree, "-mn", "efficientnet_b0", "-is", "32", "-bs", "8",
            "--save_gallery", npz,
        ]))
        capsys.readouterr()
        srv = _make_server(build_parser().parse_args(
            ["serve", npz, "--port", "0", "-k", "24", "--num_unique", "2"]))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            base = f"http://127.0.0.1:{srv.server_address[1]}"
            photo = sorted(glob.glob(
                tree + "/photo/tx_000000000000/*/*"))[0]
            body = open(photo, "rb").read()
            out, errs = {}, []

            def post(i):
                try:
                    req = urllib.request.Request(base + "/search",
                                                 data=body, method="POST")
                    with urllib.request.urlopen(req, timeout=180) as r:
                        out[i] = json.loads(r.read())
                except Exception as e:  # noqa: BLE001
                    errs.append(e)

            threads = [threading.Thread(target=post, args=(i,))
                       for i in range(5)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=180)
            assert not errs, errs
            assert len(out) == 5
            for rec in out.values():
                assert len(rec["indices"]) == 2
            assert srv.batcher.requests == 5
        finally:
            srv.shutdown()
            srv.server_close()
            assert not srv.batcher._thread.is_alive()

    def test_query_rejects_mixed_resolutions(self, tree, tmp_path, capsys):
        import glob

        import numpy as np
        import pytest
        from PIL import Image

        from imageretrievalresearch_tpu.cli.gallery import (
            _collect_images,
            _decode,
        )
        big = tmp_path / "big.png"
        Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(big)
        photos = sorted(glob.glob(tree + "/photo/tx_000000000000/*/*"))[:1]
        paths = _collect_images([photos[0], str(big)])
        with pytest.raises(SystemExit, match="mixed resolutions"):
            _decode(paths, None)
        assert _decode(paths, 32).shape == (2, 32, 32, 3)
