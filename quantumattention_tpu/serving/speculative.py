"""Speculative-decoding rejection sampling (Leviathan et al. 2023, §2).

Beyond the reference (prefill-only kernels) — the stochastic half of the
engine's speculative decoding: greedy rounds accept by argmax equality;
stochastic rounds accept proposal x with probability min(1, p(x)/q(x))
and, on rejection, resample from the residual norm(max(p - q, 0)).  That
scheme provably leaves every emitted token exactly distributed as the
target's p — the draft only changes HOW MANY target passes it takes,
never the distribution (the statistical test in tests/test_speculative.py
checks this property end to end over the vectorized implementation).

Pure functions of (key, probs, proposals): the engine owns cache
bookkeeping and emission; everything here jits and vmaps.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def speculative_accept(
    key: jax.Array,
    q_probs: jax.Array,
    p_probs: jax.Array,
    proposals: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Vectorized accept/resample for one speculative round.

    Args:
      key: PRNG key (consumed for gamma uniforms + one categorical).
      q_probs: (B, gamma, V) draft distributions each proposal was drawn
        from (post temperature/top-k/top-p filtering).
      p_probs: (B, gamma+1, V) target distributions at the same positions
        (same filtering), plus the bonus position.
      proposals: (B, gamma) int32 proposed tokens.

    Returns:
      (n_acc, final): (B,) int32 number of accepted proposals per row and
      (B,) int32 final token — the residual resample at the first
      rejection, or a draw from the bonus distribution when everything
      was accepted.  A round emits proposals[:n_acc] ++ [final].
    """
    batch, gamma = proposals.shape
    ku, kf = jax.random.split(key)

    # Accept proposal i iff u_i < p_i(x_i) / q_i(x_i).
    u = jax.random.uniform(ku, (batch, gamma))
    p_at = jnp.take_along_axis(
        p_probs[:, :gamma], proposals[..., None], axis=-1
    )[..., 0]
    q_at = jnp.take_along_axis(q_probs, proposals[..., None], axis=-1)[..., 0]
    ratio = p_at / jnp.maximum(q_at, 1e-20)
    accept = u < jnp.minimum(ratio, 1.0)

    # Longest accepted prefix; cumprod makes later accepts irrelevant
    # after the first rejection.
    acc_prefix = jnp.cumprod(accept.astype(jnp.int32), axis=-1)
    n_acc = jnp.sum(acc_prefix, axis=-1)  # (B,) in [0, gamma]

    # Final-token distribution: the residual norm(max(p - q, 0)) at the
    # first rejected position, or the untouched bonus p at position gamma
    # when everything was accepted (the residual of "nothing rejected").
    idx = jnp.minimum(n_acc, gamma - 1) if gamma > 0 else n_acc
    p_rej = jnp.take_along_axis(
        p_probs, idx[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    q_rej = jnp.take_along_axis(
        q_probs, idx[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    residual = jnp.maximum(p_rej - q_rej, 0.0)
    # Degenerate guard: q == p exactly makes the residual all-zero, but
    # then rejection has probability 0 — normalize safely anyway.
    residual = residual / jnp.maximum(
        jnp.sum(residual, axis=-1, keepdims=True), 1e-20
    )
    final_dist = jnp.where(
        (n_acc == gamma)[:, None], p_probs[:, gamma], residual
    )
    final = jax.random.categorical(
        kf, jnp.log(jnp.maximum(final_dist, 1e-30)), axis=-1
    ).astype(jnp.int32)
    return n_acc.astype(jnp.int32), final
