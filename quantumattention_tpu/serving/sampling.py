"""Token sampling for the serving engine (functional RNG, jit-stable)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0  # 0 => greedy
    top_k: Optional[int] = None
    top_p: Optional[float] = None

    def __post_init__(self):
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if self.top_k is not None and self.top_k < 1:
            raise ValueError("top_k must be >= 1")
        if self.top_p is not None and not (0 < self.top_p <= 1):
            raise ValueError("top_p must be in (0, 1]")


def filtered_logits(logits: jax.Array, params: SamplingParams) -> jax.Array:
    """Apply temperature / top-k / top-p to (B, V) fp32 logits.

    The resulting distribution is what both plain sampling and the
    speculative rejection scheme draw from (the draft's q and the
    target's p must use the SAME filtering for the accept ratio to be
    exact — Leviathan et al. §2)."""
    if params.temperature == 0.0:
        raise ValueError("filtered_logits requires temperature > 0")
    logits = logits / params.temperature
    if params.top_k is not None:
        top_k = min(params.top_k, logits.shape[-1])
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if params.top_p is not None:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep the smallest prefix with cumulative mass >= top_p.
        cutoff_idx = jnp.argmax(cum >= params.top_p, axis=-1)
        cutoff = jnp.take_along_axis(
            sorted_logits, cutoff_idx[:, None], axis=-1
        )
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits


def filtered_probs(logits: jax.Array, params: SamplingParams) -> jax.Array:
    """(B, V) fp32 logits -> the post-filter probability distribution."""
    return jax.nn.softmax(filtered_logits(logits, params), axis=-1)


def sample(
    logits: jax.Array, params: SamplingParams, key: Optional[jax.Array] = None
) -> jax.Array:
    """(B, V) fp32 logits -> (B,) int32 token ids."""
    if params.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if key is None:
        raise ValueError("stochastic sampling requires a PRNG key")
    return jax.random.categorical(
        key, filtered_logits(logits, params), axis=-1
    ).astype(jnp.int32)


def sample_with_logprob(
    logits: jax.Array, params: SamplingParams, key: Optional[jax.Array] = None
) -> tuple:
    """(B, V) fp32 logits -> ((B,) int32 tokens, (B,) fp32 logprobs).

    The logprob is taken under the SAME distribution the token was drawn
    from: the raw softmax for greedy decoding, the post-filter
    (temperature / top-k / top-p) distribution otherwise — the number a
    serving API reports next to each generated token.
    """
    toks = sample(logits, params, key)
    if params.temperature == 0.0:
        dist = jax.nn.log_softmax(logits, axis=-1)
    else:
        dist = jax.nn.log_softmax(filtered_logits(logits, params), axis=-1)
    lps = jnp.take_along_axis(dist, toks[:, None], axis=-1)[:, 0]
    return toks, lps
