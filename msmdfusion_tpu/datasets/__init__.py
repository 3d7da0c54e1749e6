from .custom_3d import CBGSDataset, Custom3DDataset
from .loader import DataLoader, collate
from .kitti import KittiDataset
from .nuscenes import NuScenesDataset
from . import pipelines  # noqa: F401

__all__ = ['CBGSDataset', 'Custom3DDataset', 'DataLoader', 'KittiDataset', 'NuScenesDataset',
           'collate']
