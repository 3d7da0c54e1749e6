from .msmdfusion import MSMDFusionDetector, SPPModule
from .parta2 import PartA2
from .transfusion import TransFusionDetector
from .votenet import VoteNet
from .voxelnet import CenterPoint, DynamicVoxelNet, VoxelNet

__all__ = ['CenterPoint', 'DynamicVoxelNet', 'MSMDFusionDetector', 'PartA2',
           'SPPModule', 'TransFusionDetector', 'VoteNet', 'VoxelNet']
