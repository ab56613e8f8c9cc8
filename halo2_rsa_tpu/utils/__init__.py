from .profiling import Phases
from . import serialization

__all__ = ["Phases", "serialization"]
