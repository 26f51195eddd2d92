"""Data layer: dataset indexing, split policies, and host-side loading.

Pure-Python indexing (globbing directory layouts, building pos/neg candidate
lists) feeding a JAX-side preprocessing pipeline. Mirrors the reference's
four dataset families:

- Sketchy DB-256 layout (reference data/sketch_dataset.py)
- "original"/spec layout (reference data/original_dataset.py)
- soft real/+sketch/ layout (reference data/softdataset.py)
- simple class-folder photo/sketch layout (reference data/triplet_dataset.py)
- ImageFolder classification tree (reference train/train_vit_crossentropy.py:50)
"""

from imageretrievalresearch_tpu.data.splits import (
    data_split_sketchy,
    data_split_original,
    data_split_soft,
)
from imageretrievalresearch_tpu.data.index import TripletIndex
from imageretrievalresearch_tpu.data.sketchy import SketchyDataset, SketchyImageDataset
from imageretrievalresearch_tpu.data.original import OriginalDataset, OriginalImageDataset
from imageretrievalresearch_tpu.data.soft import TripletDataset, TripletImageDataset
from imageretrievalresearch_tpu.data.triple import TripleDataset
from imageretrievalresearch_tpu.data.imagefolder import ImageFolderDataset
from imageretrievalresearch_tpu.data.loader import TripletLoader

__all__ = [
    "data_split_sketchy",
    "data_split_original",
    "data_split_soft",
    "TripletIndex",
    "SketchyDataset",
    "SketchyImageDataset",
    "OriginalDataset",
    "OriginalImageDataset",
    "TripletDataset",
    "TripletImageDataset",
    "TripleDataset",
    "ImageFolderDataset",
    "TripletLoader",
]
