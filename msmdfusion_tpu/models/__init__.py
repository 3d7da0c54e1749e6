"""Model zoo: importing this package populates the registries."""
from . import backbones, detectors, heads, middle_encoders, necks, voxel_encoders  # noqa: F401
