"""imageretrievalresearch_tpu — a TPU-native (JAX/XLA/Pallas) sketch-retrieval framework.

A ground-up re-design of the capabilities of vitasoftAI/ImageRetrievalResearch
(PyTorch + PyTorch-Lightning) as an idiomatic JAX framework:

- triplet (query-photo, positive-sketch, negative-sketch) datasets over the
  Sketchy / "original" (spec) / soft / class-folder directory layouts,
- fused JAX image preprocessing (resize / square-pad / normalize / AutoAugment),
- Flax embedding backbones (EfficientNet, RexNet, Swin) with a
  ``forward_features`` / ``head`` split mirroring the timm API surface,
- cosine-embedding / contrastive / cross-entropy loss combinations,
- a jit-compiled data-parallel training loop over a ``jax.sharding.Mesh``
  (the reference's Lightning DDP equivalent),
- a fused Pallas cosine-similarity + top-k retrieval engine, and
- Grad-CAM saliency, ROC/score-booster analysis utilities.

Reference behaviors are cited by ``file:line`` into the upstream tree
(mounted read-only at /root/reference) in the docstrings of each module.
"""

from imageretrievalresearch_tpu.version import __version__

__all__ = ["__version__"]
