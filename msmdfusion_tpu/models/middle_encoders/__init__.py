from .gma_encoder import SparseMultiModalEncoderPaint
from .pillar_scatter import PointPillarsScatter
from .sparse_encoder import SparseEncoder
from .sparse_unet import SparseUNet

__all__ = ['SparseMultiModalEncoderPaint', 'PointPillarsScatter',
           'SparseEncoder', 'SparseUNet']
