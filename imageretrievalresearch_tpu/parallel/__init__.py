"""Parallelism: device mesh, data-parallel sharding, distributed gallery.

The reference's only strategy is Lightning DDP over 3 GPUs
(train/train.py:439). The TPU-native mapping (SURVEY.md §2 checklist) is a
``jax.sharding.Mesh`` with a ``data`` axis: batches sharded over ICI, state
replicated, gradient reduction inserted by XLA from the sharded-loss mean —
plus a sharded-gallery retrieval path with an all-gather top-k merge.
"""

from imageretrievalresearch_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    put_replicated,
    data_sharding,
)
from imageretrievalresearch_tpu.parallel.fsdp import (
    check_model_axis_safety,
    constrain_fsdp,
    fsdp_sharding,
    fsdp_spec,
    put_fsdp,
)
from imageretrievalresearch_tpu.parallel.gallery import sharded_cosine_topk

__all__ = ["make_mesh", "shard_batch", "replicate", "put_replicated",
           "data_sharding", "sharded_cosine_topk",
           "fsdp_spec", "fsdp_sharding", "put_fsdp", "constrain_fsdp",
           "check_model_axis_safety"]
