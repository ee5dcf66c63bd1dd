from .checkpointer import Checkpointer
from .torch_import import load_reference_weights

__all__ = ["Checkpointer", "load_reference_weights"]
