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
    square_pad,
)
from imageretrievalresearch_tpu.ops.pooling import get_fm

__all__ = [
    "TransformSpec",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "build_batch_transform",
    "square_pad",
    "get_fm",
]
