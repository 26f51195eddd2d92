"""Published-checkpoint registry — the reference's checkpoints_path.txt.

The reference ships 6 Google-Drive links to trained Lightning checkpoints
(reference checkpoints/checkpoints_path.txt:1-6). This environment has no
egress, so the registry records the metadata; a downloaded ``.ckpt`` feeds
straight into :func:`models.convert.load_checkpoint` (torch->Flax).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PublishedCheckpoint:
    name: str
    model_name: str
    recipe: str
    note: str


REGISTRY: dict[str, PublishedCheckpoint] = {
    "rexnet_150_base": PublishedCheckpoint(
        "rexnet_150_base", "rexnet_150", "train",
        "reference checkpoints_path.txt:1"),
    "efficientnet_b3a_base": PublishedCheckpoint(
        "efficientnet_b3a_base", "efficientnet_b3a", "train_efficientnet",
        "reference checkpoints_path.txt:2"),
    "efficientnet_b3a_cos_ce": PublishedCheckpoint(
        "efficientnet_b3a_cos_ce", "efficientnet_b3a", "train_efficientnet",
        "cosine-embedding + CE; reference checkpoints_path.txt:3"),
    "efficientnet_b3a_cos_con_ce_m05": PublishedCheckpoint(
        "efficientnet_b3a_cos_con_ce_m05", "efficientnet_b3a",
        "train_efficient_cos_con_ce_loss",
        "margin 0.5; reference checkpoints_path.txt:4"),
    "efficientnet_b3a_cos_con_ce_m03": PublishedCheckpoint(
        "efficientnet_b3a_cos_con_ce_m03", "efficientnet_b3a",
        "train_efficient_cos_con_ce_loss",
        "margin 0.3; reference checkpoints_path.txt:5"),
    "efficientnet_b3a_cos_con_ce_m02": PublishedCheckpoint(
        "efficientnet_b3a_cos_con_ce_m02", "efficientnet_b3a",
        "train_efficient_cos_con_ce_loss",
        "margin 0.2; reference checkpoints_path.txt:6"),
}


def load_published(name: str, ckpt_path: str, **model_kwargs):
    """Build the right backbone for a published checkpoint and convert it."""
    from imageretrievalresearch_tpu.models import create_model
    from imageretrievalresearch_tpu.models.convert import load_checkpoint

    meta = REGISTRY[name]
    backbone = create_model(meta.model_name, **model_kwargs)
    variables = load_checkpoint(ckpt_path, backbone)
    return backbone, variables
