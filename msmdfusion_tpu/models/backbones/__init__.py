from .pointnet2 import PointNet2SASSG
from .resnet import ResNet
from .second import SECOND

__all__ = ['PointNet2SASSG', 'ResNet', 'SECOND']
