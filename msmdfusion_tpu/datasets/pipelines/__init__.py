from . import (dbsampler, foreground, indoor, loading, test_time_aug,
               transforms_3d)  # noqa: F401
from .loading import Compose

__all__ = ['Compose']
