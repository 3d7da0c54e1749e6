from .fpn import FPN
from .second_fpn import SECONDFPN

__all__ = ['FPN', 'SECONDFPN']
from . import extra_necks  # noqa: F401
