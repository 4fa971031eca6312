"""Model families built on the attention engine."""

from . import llama, moe, quantized  # noqa: F401
from .io import load_params, save_params  # noqa: F401
