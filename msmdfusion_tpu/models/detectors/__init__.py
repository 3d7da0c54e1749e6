from .msmdfusion import MSMDFusionDetector, SPPModule
from .transfusion import TransFusionDetector
from .votenet import VoteNet
from .voxelnet import CenterPoint, DynamicVoxelNet, VoxelNet

__all__ = ['CenterPoint', 'DynamicVoxelNet', 'MSMDFusionDetector',
           'SPPModule', 'TransFusionDetector', 'VoteNet', 'VoxelNet']
