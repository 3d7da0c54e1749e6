"""Model zoo: importing this package populates the registries."""
from . import (backbones, detectors, fusion_layers, heads, middle_encoders,  # noqa: F401
               necks, voxel_encoders)
