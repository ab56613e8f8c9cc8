from .profiling import Phases
from .xjit import fjit

__all__ = ["Phases", "fjit", "serialization"]


def __getattr__(name):
    # serialization imports the prover package, which imports the field
    # layer; importing it lazily keeps `utils` usable from low layers.
    if name == "serialization":
        import importlib

        return importlib.import_module(".serialization", __name__)
    raise AttributeError(name)
