from .anchor3d_head import Anchor3DHead
from .h3d_heads import H3DBboxHead, PrimitiveHead
from .ssd3d_head import SSD3DHead
from .centerpoint_head import CenterHead, SeparateHead
from .parta2_roi_head import PartAggregationROIHead
from .transfusion_head import TransFusionHead
from .vote_head import VoteHead

__all__ = ['Anchor3DHead', 'CenterHead', 'SeparateHead', 'PartAggregationROIHead', 'TransFusionHead', 'VoteHead']
