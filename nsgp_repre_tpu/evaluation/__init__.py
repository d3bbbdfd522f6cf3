from .voc_map import eval_voc_map
from .coco_map import eval_coco_map

__all__ = ["eval_voc_map", "eval_coco_map"]
