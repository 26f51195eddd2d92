"""Training layer: optimizer/schedule, loss-combination steps, the Trainer.

One composable trainer replaces the reference's five near-duplicate Lightning
scripts (SURVEY.md §7 design stance); each recipe (T1-T5) is a TrainConfig.
"""

from imageretrievalresearch_tpu.train.train_state import (
    EmbedTrainState,
    make_optimizer,
    multistep_lr,
)
from imageretrievalresearch_tpu.train.steps import (
    build_classifier_eval_step,
    build_classifier_train_step,
    build_eval_step,
    build_train_step,
)
from imageretrievalresearch_tpu.train.trainer import Trainer

__all__ = [
    "EmbedTrainState",
    "make_optimizer",
    "multistep_lr",
    "build_train_step",
    "build_eval_step",
    "build_classifier_train_step",
    "build_classifier_eval_step",
    "Trainer",
]
