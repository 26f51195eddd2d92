"""Single typed configuration for training/inference — the reference's argparse
surface (duplicated across its five train scripts) unified into one dataclass.

CLI parity (SURVEY.md §5 config row): every reference flag keeps its name and
default (train/train.py:483-495, inference/inference.py:266-272). The
reference's ``type=bool`` flags are always-truthy strings — the effective
behavior gate is the (True, True) / (True, None) / (None, True) triad at
train/train.py:105-111, reproduced by ``loss_mode``.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

LOSS_MODES = ("cos_ce", "cos_con_ce", "cos_only", "ce_only")


@dataclasses.dataclass
class TrainConfig:
    # --- reference train.py CLI flags (names preserved) ---
    expdir: str | None = None                 # -ed
    save_path: str = "saved_models"           # -sp
    batch_size: int = 64                      # -bs
    device: str = "tpu"                       # -d (reference: 'cuda:1')
    ims_path: str = "path/to/your/data"       # -ip
    model_name: str = "rexnet_150"            # -mn
    optimizer_name: str = "Adam"              # -on (Adam -> AdamW, or SGD)
    learning_rate: float = 4.7863e-03         # -lr ("from find_lr")
    weight_decay: float = 1e-5                # -wd
    only_feature_embeddings: bool | None = True   # -ofm
    only_target_labels: bool | None = True        # -otl

    # --- recipe knobs that were hardcoded per script ---
    cos_margin: float = 0.5        # CosineEmbeddingLoss margin (T1/T2: 0.5,
                                   # T3: 0.3, T4: 0.2)
    con_margin: float = 0.3        # ContrastiveLoss margin (T3)
    use_contrastive: bool = False  # T3 recipe adds ContrastiveLoss
    milestones: Sequence[int] = (6, 12, 20, 30, 35, 40)  # MultiStepLR epochs
    # (T3 uses [6,15,22,30,35,40], T4/T5 use [10,20,30,40,50])
    lr_gamma: float = 0.1
    max_epochs: int = 300
    early_stop_patience: int = 10
    monitor: str = "cos_sims"      # checkpoint/early-stop metric, mode max
    monitor_mode: str = "max"
    seed: int = 42                 # pl.seed_everything(42)
    log_every_n_steps: int = 15
    save_top_k: int = 1

    # --- data ---
    split_json: str | None = None  # trainval json (train/train.py:53)
    dataset: str = "sketchy"       # sketchy | original | soft | triple |
                                   # imagefolder (T5: class-per-subfolder
                                   # tree, train/train_vit_crossentropy.py:50)
    val_fraction: float = 0.2      # imagefolder train/val holdout
                                   # (reference random_split 80/20, :59)
    task: str | None = None        # "triplet" | "classification"; None =
                                   # inferred from `dataset` (imagefolder
                                   # trains the single-image CE classifier,
                                   # everything else the triplet embedder).
                                   # Set explicitly to drive a custom loader
                                   # through either step family.
    pos_policy: str = "cat"
    neg_policy: str = "except_cat"
    num_workers: int = 8
    image_size: int = 224
    autoaugment: bool = False      # T2/T3 train transforms

    # --- TPU-native knobs (no reference counterpart) ---
    compute_dtype: str = "bfloat16"   # reference used fp16 AMP
    num_devices: int | None = None    # data-parallel width (None = all)
    param_sharding: str = "replicated"  # replicated (DDP-style) | fsdp
                                      # (ZeRO-3: params+optimizer sharded
                                      # over the data axis, ~1/n_devices
                                      # state bytes per chip)
    checkpoint_dir: str | None = None
    wandb: bool = False               # observability is pluggable; no
                                      # hardcoded keys (cf. train/train.py:43)
    profile_dir: str | None = None    # jax.profiler trace of early steps

    @property
    def effective_task(self) -> str:
        """Explicit ``task`` wins; otherwise the dataset family implies it
        (imagefolder = the reference's single-image CE classifier,
        train/train_vit_crossentropy.py:50; all others = triplet)."""
        if self.task is not None:
            if self.task not in ("triplet", "classification"):
                # a real raise, not assert: python -O strips asserts and a
                # typo'd task would silently fall through
                raise ValueError(f"task must be 'triplet' or "
                                 f"'classification', got {self.task!r}")
            return self.task
        return ("classification" if self.dataset == "imagefolder"
                else "triplet")

    @property
    def loss_mode(self) -> str:
        """The reference's only_features/only_labels triad
        (train/train.py:105-111) + the T3 contrastive recipe."""
        of, ol = self.only_feature_embeddings, self.only_target_labels
        if not (of or ol):
            # the reference's loud error (train/train.py:105); a raise, not
            # assert, so python -O cannot misroute (None, None) to ce_only
            raise ValueError(
                "Please choose at least one loss function to train the "
                "model (triplet loss or crossentropy loss)")
        if of and ol:
            return "cos_con_ce" if self.use_contrastive else "cos_ce"
        if of:
            return "cos_only"
        return "ce_only"


@dataclasses.dataclass
class InferenceConfig:
    # reference inference.py CLI flags (inference/inference.py:266-272)
    im_path: str = "data"                     # -ip
    checkpoint_path: str = ""                 # -cp
    model_name: str = "rexnet_150"            # -mn
    input_size: int = 224                     # -is
    batch_size: int = 256                     # -bs
    device: str = "tpu"                       # -d
    cache: bool = True                        # -c
    conv_input: bool = False                  # load_checkpoint conv stem
    num_classes: int = 0
    topk_variant: str = "class_dedup"         # class_dedup | index_match
    split_json: str | None = None
