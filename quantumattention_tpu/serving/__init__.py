"""Serving: quantized KV caches, paged memory, continuous batching."""

from .engine import Engine, Request  # noqa: F401
from .kv_cache import KVCache, init_cache  # noqa: F401
from .sampling import SamplingParams, sample  # noqa: F401
