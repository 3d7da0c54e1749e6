"""msmdfusion_tpu: TPU-native multi-modal 3D detection framework.

A from-scratch JAX/XLA/Pallas re-design of the MSMDFusion
(LiDAR+camera 3D detection) capability stack for TPU hardware.
"""
__version__ = '0.1.0'

from . import config, registry  # noqa: F401
