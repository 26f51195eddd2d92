"""Published-checkpoint drill (VERDICT r3 task 2): a byte-realistic
pytorch-lightning ``.ckpt`` at FULL published size driven through the
complete user journey — convert -> cli/inference eval -> --save_gallery ->
cli/gallery query -> reverse converter -> torch forward equality.

The checkpoint bytes come from tools/make_published_ckpt.py: torch.save
zip serialization, ``model.``-prefixed state dict with the full buffer
set, PL 1.6.4 metadata + hparams (reference train/train.py:114-135,
checkpoints/checkpoints_path.txt:1-6). rexnet_150 uses the FULL Trainer
layout (optimizer/scheduler/callback states present — the converter must
tolerate the extra keys); efficientnet_b3a uses the weights-only layout
every reference ModelCheckpoint actually shipped (train.py:448).

Slow-marked: each test compiles a full-size backbone twice on this 1-core
CPU host (~4-6 min each). Query images run at 64 px to bound compile
time; the MODEL is full published size (that is what the drill is about).
"""

import glob
import json

import numpy as np
import pytest
import torch

from imageretrievalresearch_tpu.data.synthetic import make_sketchy_tree

pytestmark = pytest.mark.slow

INPUT_SIZE = 64
PUBLISHED_CLASSES = 125


def _drill(model_name: str, weights_only: bool, tmp_path, capsys):
    import jax.numpy as jnp

    from tools.make_published_ckpt import (
        build_torch_replica,
        make_lightning_ckpt,
    )
    from imageretrievalresearch_tpu.checkpoints import load_published
    from imageretrievalresearch_tpu.cli.gallery import (
        build_parser as gal_parser,
        run as gal_run,
    )
    from imageretrievalresearch_tpu.cli.inference import (
        build_parser as inf_parser,
        run as inf_run,
    )
    from imageretrievalresearch_tpu.models.convert import (
        export_torch_state_dict,
        strip_model_prefix,
    )

    # 1. the published artifact (full model size, tiny opt-step count)
    ckpt = str(tmp_path / f"{model_name}.ckpt")
    make_lightning_ckpt(model_name, ckpt, seed=1, weights_only=weights_only)

    tree = make_sketchy_tree(str(tmp_path / "sk"), n_cats=3, n_prods=1,
                             n_photos=4, n_sketches=2, size=48)

    # 2. the user's first stop: cli/inference eval on their image tree,
    #    persisting the serving artifact. --num_classes 125 = the trained
    #    head (reference Sketchy class count) on a 3-class query tree.
    npz = str(tmp_path / "gal.npz")
    inf_run(inf_parser().parse_args([
        "-ip", tree, "-cp", ckpt, "-mn", model_name,
        "-is", str(INPUT_SIZE), "-bs", "8",
        "--num_classes", str(PUBLISHED_CLASSES),
        "--save_gallery", npz,
    ]))
    out = capsys.readouterr().out
    assert "successfully converted" in out     # torch->Flax took the ckpt
    assert "Test top1:" in out and "Test top3:" in out

    # the artifact records the checkpoint + trained architecture so the
    # gallery CLI can rebuild the exact model
    from imageretrievalresearch_tpu.retrieval import GalleryIndex
    meta = GalleryIndex.load(npz).meta
    assert meta["checkpoint"] == ckpt
    assert meta["num_classes"] == PUBLISHED_CLASSES
    assert meta["model"] == model_name

    # 3. serving: query the persisted gallery with fresh images — the CLI
    #    reloads the checkpoint from the recorded meta
    photos = sorted(glob.glob(tree + "/photo/tx_000000000000/*/*"))[:2]
    gal_run(gal_parser().parse_args(["query", npz, *photos, "-k", "6",
                                     "--num_unique", "2"]))
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2
    for rec in lines:
        assert len(rec["indices"]) == 2
        assert all(np.isfinite(rec["scores"]))

    # 4. registry glue: load_published builds the right backbone and
    #    converts the same artifact
    reg_name = ("rexnet_150_base" if model_name == "rexnet_150"
                else "efficientnet_b3a_base")
    backbone, variables = load_published(
        reg_name, ckpt, num_classes=PUBLISHED_CLASSES)

    # 5. reverse converter: export back to a Lightning-shaped state dict
    #    and load it into a fresh torch replica with strict=True
    tmodel = build_torch_replica(model_name, PUBLISHED_CLASSES)
    sd = export_torch_state_dict(backbone, variables, lightning=True,
                                 template=tmodel.state_dict())
    tmodel.load_state_dict(strip_model_prefix(sd), strict=True)
    tmodel.eval()

    # 6. torch forward equality on the round-tripped weights
    x = np.random.default_rng(0).random(
        (2, INPUT_SIZE, INPUT_SIZE, 3)).astype(np.float32)
    with torch.no_grad():
        tlogits = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    flogits = np.asarray(backbone(variables, jnp.asarray(x)))
    np.testing.assert_allclose(flogits, tlogits, rtol=1e-3, atol=1e-3)


def test_published_drill_rexnet_150_full_layout(tmp_path, capsys):
    _drill("rexnet_150", weights_only=False, tmp_path=tmp_path,
           capsys=capsys)


def test_published_drill_efficientnet_b3a_weights_only(tmp_path, capsys):
    _drill("efficientnet_b3a", weights_only=True, tmp_path=tmp_path,
           capsys=capsys)
