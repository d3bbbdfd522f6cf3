from .boxes import (
    bbox_area,
    bbox_clip,
    bbox_flip,
    bbox_overlaps,
    delta2bbox,
    bbox2delta,
)
from .sample import DetBatch, InstanceArray, pad_instances

__all__ = [
    "bbox_area",
    "bbox_clip",
    "bbox_flip",
    "bbox_overlaps",
    "delta2bbox",
    "bbox2delta",
    "DetBatch",
    "InstanceArray",
    "pad_instances",
]
