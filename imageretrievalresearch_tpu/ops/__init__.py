"""Device-side ops: fused preprocessing, pooling, retrieval kernels.

These are the performance-critical paths the reference leaves to eager
per-sample host loops (SURVEY.md §2 native-code note): batched image
preprocessing (torchvision Compose pipelines) and the gallery cosine-sim +
top-k ranking (eager Python loops at train/train.py:249-255 and
training_analysis.ipynb cell 2).
"""

from imageretrievalresearch_tpu.ops.preprocess import (
    TransformSpec,
    IMAGENET_MEAN,
    IMAGENET_STD,
    build_batch_transform,
    build_triplet_transform,
    square_pad,
)
from imageretrievalresearch_tpu.ops.pooling import get_fm
from imageretrievalresearch_tpu.ops.retrieval import (
    cosine_scores,
    cosine_topk,
    fused_cosine_topk_pallas,
    l2_normalize,
)
from imageretrievalresearch_tpu.ops.autoaugment import imagenet_policy_batch

__all__ = [
    "TransformSpec",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "build_batch_transform",
    "build_triplet_transform",
    "square_pad",
    "get_fm",
    "cosine_scores",
    "cosine_topk",
    "fused_cosine_topk_pallas",
    "l2_normalize",
    "imagenet_policy_batch",
]
