from .voxel_encoder import HardSimpleVFE, PillarFeatureNet, hard_simple_vfe

__all__ = ['HardSimpleVFE', 'PillarFeatureNet', 'hard_simple_vfe']
