from .bbox_head import Shared2FCBBoxHeadTask
from .detector import DetectorConfig, FasterRCNN
from .fpn import FPN
from .layers import CovConv, CovDense, FrozenBatchNorm
from .resnet import ResNet50
from .rpn_head import RPNHead

__all__ = [
    "DetectorConfig",
    "FasterRCNN",
    "ResNet50",
    "FPN",
    "RPNHead",
    "Shared2FCBBoxHeadTask",
    "CovConv",
    "CovDense",
    "FrozenBatchNorm",
]
