from .voc import VOC_CLASSES, VOCTaskDataset
from .coco import CocoTaskDataset
from .dior import DIOR_CLASSES, DIORTaskDataset
from .loader import DetLoader
from .prefetch import PrefetchLoader

__all__ = [
    "PrefetchLoader",
    "VOCTaskDataset",
    "VOC_CLASSES",
    "CocoTaskDataset",
    "DIORTaskDataset",
    "DIOR_CLASSES",
    "DetLoader",
]
