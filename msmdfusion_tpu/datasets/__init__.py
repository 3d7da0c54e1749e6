from .custom_3d import CBGSDataset, Custom3DDataset
from .loader import DataLoader, collate
from .kitti import KittiDataset
from .nuscenes import NuScenesDataset
from .other_datasets import (LyftDataset, ScanNetDataset, SUNRGBDDataset,
                             WaymoDataset)
from . import pipelines  # noqa: F401

__all__ = ['CBGSDataset', 'Custom3DDataset', 'DataLoader', 'KittiDataset', 'NuScenesDataset',
           'LyftDataset', 'ScanNetDataset', 'SUNRGBDDataset', 'WaymoDataset',
           'collate']
