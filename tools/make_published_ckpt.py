"""Byte-realistic published-checkpoint builder (VERDICT r3 task 2).

The reference publishes six pytorch-lightning checkpoints
(reference checkpoints/checkpoints_path.txt:1-6) trained with
pytorch-lightning 1.6.4 (requirements.txt:127). This environment has no
egress, so the real files cannot be fetched; this tool manufactures a
checkpoint with the exact on-disk layout and FULL published tensor sizes
so the converter + CLI journey can be drilled end-to-end on realistic
bytes:

- torch.save zip serialization (the modern default — real torch storages,
  not pickled numpy),
- ``state_dict`` with every key under the ``model.`` prefix — the
  reference LightningModule holds the timm model at ``self.model``
  (reference train/train.py:114-135) and the loss modules
  (CosineEmbeddingLoss/CrossEntropyLoss) carry no parameters,
- the full non-parameter buffer set (BN ``num_batches_tracked``),
- PL 1.6 metadata: ``epoch`` / ``global_step`` /
  ``pytorch-lightning_version`` / ``loops``,
- ``save_hyperparameters()`` payload: ``hparams_name`` +
  ``hyper_parameters`` = {model_name, optimizer_name, optimizer_hparams}
  (train.py:129-132,159-161; lr 4.7863e-03 "from find_lr", wd 1e-5 —
  train.py:490-491). Stored as a plain dict rather than PL's
  AttributeDict so torch.load works without pytorch-lightning installed.

Two layouts:

- ``weights_only=True`` (default) — what the reference actually shipped:
  every ModelCheckpoint in the reference passes ``save_weights_only=True``
  (train/train.py:448, train_efficient_cos_con_ce_loss.py:481), which
  drops optimizer_states / lr_schedulers / callbacks.
- ``weights_only=False`` — the full Trainer.save_checkpoint layout with
  REAL AdamW optimizer state (exp_avg/exp_avg_sq populated by genuine
  optimizer steps, train.py:161), MultiStepLR scheduler state
  (milestones [6,12,20,30,35,40], gamma 0.1 — train.py:168), and
  ModelCheckpoint callback state, exercising the converter's tolerance
  for the extra top-level keys.

The torch models are the in-repo full-size replicas whose state dicts are
pinned key-for-key/shape-for-shape against the hand-audited golden
manifests (tests/golden/*.keys.json, tests/test_golden_manifests.py).
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import OrderedDict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

PL_VERSION = "1.6.4"            # reference requirements.txt:127
MILESTONES = [6, 12, 20, 30, 35, 40]   # reference train/train.py:168
GAMMA = 0.1

# reference CLI defaults the published runs used (train.py:490-491,
# train_efficientnet.py:542; optimizer_name "Adam" maps to AdamW,
# train.py:159-161)
OPTIMIZER_HPARAMS = {"lr": 4.7863e-03, "weight_decay": 1e-5}

PUBLISHED_NUM_CLASSES = 125     # Sketchy category count the reference trains on


def build_torch_replica(model_name: str, num_classes: int = PUBLISHED_NUM_CLASSES):
    """Full-size torch replica with a timm-named state dict."""
    import numpy as np
    import torch

    from test_convert import _randomize_bn_stats
    from test_convert_fullsize import TorchEffNet
    from test_convert_rexnet import TorchRexNet

    if model_name == "efficientnet_b3a":
        model = TorchEffNet(width_mult=1.2, depth_mult=1.4,
                            num_classes=num_classes)
    elif model_name == "efficientnet_b0":
        model = TorchEffNet(num_classes=num_classes)
    elif model_name == "rexnet_150":
        model = TorchRexNet(width_mult=1.5, num_classes=num_classes)
    elif model_name == "rexnet_200":
        model = TorchRexNet(width_mult=2.0, num_classes=num_classes)
    else:
        raise ValueError(f"no torch replica wired for {model_name!r}")
    with torch.no_grad():
        _randomize_bn_stats(model, np.random.default_rng(3))
    return model


def make_lightning_ckpt(model_name: str, out_path: str, *,
                        num_classes: int = PUBLISHED_NUM_CLASSES,
                        seed: int = 0, opt_steps: int = 2, epoch: int = 35,
                        weights_only: bool = True, model=None) -> str:
    """Build the checkpoint file; returns ``out_path``.

    ``model`` overrides the full-size replica (e.g. a shrunken-width
    torch model for the fast, every-round ingestion drill in
    tests/test_published_fast.py); the on-disk LAYOUT — torch.save zip,
    ``model.`` prefixes, PL metadata, optimizer/scheduler/callback
    states — is identical either way.
    """
    import torch

    torch.manual_seed(seed)
    if model is None:
        model = build_torch_replica(model_name, num_classes)

    optimizer = torch.optim.AdamW(model.parameters(), **OPTIMIZER_HPARAMS)
    scheduler = torch.optim.lr_scheduler.MultiStepLR(
        optimizer, milestones=MILESTONES, gamma=GAMMA)
    # real optimizer steps (train mode, so BN running stats move too):
    # populates exp_avg / exp_avg_sq / step for EVERY parameter, exactly
    # what a mid-training Lightning checkpoint carries
    model.train()
    for _ in range(opt_steps):
        optimizer.zero_grad()
        x = torch.randn(2, 3, 64, 64)
        model(x).square().mean().backward()
        optimizer.step()
    for _ in range(epoch):
        scheduler.step()
    model.eval()

    global_step = epoch * 273 + opt_steps  # plausible steps-per-epoch
    state_dict = OrderedDict(
        (f"model.{k}", v.detach().clone()) for k, v in
        model.state_dict().items())

    ckpt = {
        "epoch": epoch,
        "global_step": global_step,
        "pytorch-lightning_version": PL_VERSION,
        "state_dict": state_dict,
        "loops": {
            "fit_loop": {
                "state_dict": {},
                "epoch_loop.state_dict": {},
                "epoch_progress": {
                    "total": {"ready": epoch + 1, "started": epoch + 1,
                              "processed": epoch, "completed": epoch},
                    "current": {"ready": epoch + 1, "started": epoch + 1,
                                "processed": epoch, "completed": epoch},
                },
            },
            "validate_loop": {"state_dict": {}},
            "test_loop": {"state_dict": {}},
            "predict_loop": {"state_dict": {}},
        },
        "hparams_name": "kwargs",
        "hyper_parameters": {
            "model_name": model_name,
            "optimizer_name": "Adam",
            "optimizer_hparams": dict(OPTIMIZER_HPARAMS),
        },
    }
    if not weights_only:
        ckpt["optimizer_states"] = [optimizer.state_dict()]
        ckpt["lr_schedulers"] = [scheduler.state_dict()]
        ckpt["callbacks"] = {
            "ModelCheckpoint{'monitor': 'cos_sims', 'mode': 'max'}": {
                "monitor": "cos_sims",
                "best_model_score": torch.tensor(0.9431),
                "best_model_path": os.path.basename(out_path),
                "current_score": torch.tensor(0.9380),
                "dirpath": os.path.dirname(out_path) or ".",
            },
        }
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    torch.save(ckpt, out_path)
    return out_path


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("model_name",
                   choices=["rexnet_150", "rexnet_200",
                            "efficientnet_b0", "efficientnet_b3a"])
    p.add_argument("out_path")
    p.add_argument("--num_classes", type=int,
                   default=PUBLISHED_NUM_CLASSES)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--full", action="store_true",
                   help="full Trainer layout (optimizer/scheduler/callback "
                        "states) instead of the published weights-only one")
    args = p.parse_args()
    path = make_lightning_ckpt(args.model_name, args.out_path,
                               num_classes=args.num_classes, seed=args.seed,
                               weights_only=not args.full)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
