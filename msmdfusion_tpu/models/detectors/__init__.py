from .msmdfusion import MSMDFusionDetector, SPPModule
from .indoor_zoo import H3DNet, ImVoteNet, MVXFasterRCNN, SSD3DNet
from .parta2 import PartA2
from .transfusion import TransFusionDetector
from .votenet import VoteNet
from .voxelnet import CenterPoint, DynamicVoxelNet, VoxelNet

__all__ = ['CenterPoint', 'DynamicVoxelNet', 'H3DNet', 'ImVoteNet',
           'MSMDFusionDetector', 'MVXFasterRCNN', 'PartA2', 'SSD3DNet',
           'SPPModule', 'TransFusionDetector', 'VoteNet', 'VoxelNet']
from .mvx_two_stage import MVXTwoStageDetector, aug_test_detector  # noqa: F401,E501
