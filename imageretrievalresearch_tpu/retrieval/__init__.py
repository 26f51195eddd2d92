"""Retrieval layer: gallery engine, Grad-CAM saliency, visualization."""

from imageretrievalresearch_tpu.retrieval.engine import RetrievalEngine
from imageretrievalresearch_tpu.retrieval.gradcam import grad_cam, grad_cam_pair
from imageretrievalresearch_tpu.retrieval.index import GalleryIndex
from imageretrievalresearch_tpu.retrieval.visualize import retrieval_grid

__all__ = ["RetrievalEngine", "GalleryIndex", "grad_cam", "grad_cam_pair",
           "retrieval_grid"]
