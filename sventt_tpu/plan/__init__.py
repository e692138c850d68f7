"""Transform planning: static configs, plan trees, the public NTT wrapper."""

from . import planner
from .autotune import tune
from .config import NttConfig
from .wrapper import NTT

__all__ = ["NttConfig", "NTT", "planner", "tune"]
