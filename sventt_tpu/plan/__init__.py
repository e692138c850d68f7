"""Transform planning: static configs and the public NTT wrapper."""

from .config import NttConfig
from .wrapper import NTT

__all__ = ["NttConfig", "NTT"]
