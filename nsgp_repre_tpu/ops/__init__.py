from .anchors import AnchorGenerator
from .nms import batched_nms, nms
from .roi_align import multilevel_roi_align, roi_align
from .roi_pool import roi_pool

__all__ = [
    "AnchorGenerator",
    "nms",
    "batched_nms",
    "roi_align",
    "multilevel_roi_align",
    "roi_pool",
]
