from .anchor3d_head import Anchor3DHead
from .free_anchor3d_head import FreeAnchor3DHead
from .shape_aware_head import BaseShapeHead, ShapeAwareHead
from .h3d_heads import H3DBboxHead, PrimitiveHead
from .ssd3d_head import SSD3DHead
from .centerpoint_head import CenterHead, SeparateHead
from .parta2_roi_head import PartAggregationROIHead
from .parta2_rpn_head import PartA2RPNHead
from .transfusion_head import TransFusionHead
from .vote_head import VoteHead

__all__ = ['Anchor3DHead', 'CenterHead', 'SeparateHead', 'PartAggregationROIHead', 'TransFusionHead', 'VoteHead']
