from .resnet import ResNet
from .second import SECOND

__all__ = ['ResNet', 'SECOND']
