"""Ulysses (DeepSpeed-style) sequence parallelism via all-to-all.

The alternative to ring attention (parallel/ring.py) for sequence-sharded
inputs: instead of rotating KV blocks, two ``all_to_all`` collectives swap
the sharded dimension — sequence-sharded activations become head-sharded for
the attention itself, which then runs entirely locally with the fused kernel.

Trade-off vs ring (documented per SURVEY.md §2.3):
  * Ulysses moves Q, K, V, and O once each (4 all-to-alls of the full local
    activation) regardless of sequence length; ring moves K and V (N-1)
    times but overlaps the transfers with compute.
  * Ulysses needs num_heads % axis_size == 0 (heads become the sharded
    dim); ring has no head-count constraint.
  * Ulysses keeps the kernel's causal masking untouched (full sequence per
    chip); ring needs position offsets.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.flash import flash_attention


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis_name: str = "sp",
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    window: Optional[Tuple[Optional[int], Optional[int]]] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
) -> jax.Array:
    """Fused attention over sequence-sharded (B, H, S, D) tensors.

    S is sharded over ``mesh[axis_name]``; requires Hq and Hkv divisible by
    the axis size.  Returns output with the same sequence sharding.
    """
    n = mesh.shape[axis_name]
    if q.shape[1] % n or k.shape[1] % n:
        raise ValueError(
            f"Ulysses needs q heads ({q.shape[1]}) and kv heads "
            f"({k.shape[1]}) divisible by the '{axis_name}' axis size ({n})"
        )

    def body(q, k, v):
        # (B, H, S/n, D) -> (B, H/n, S, D): scatter heads, gather sequence.
        swap = lambda t: jax.lax.all_to_all(
            t, axis_name, split_axis=1, concat_axis=2, tiled=True
        )
        unswap = lambda t: jax.lax.all_to_all(
            t, axis_name, split_axis=2, concat_axis=1, tiled=True
        )
        out = flash_attention(
            swap(q),
            swap(k),
            swap(v),
            is_causal=is_causal,
            sm_scale=sm_scale,
            window=window,
            block_q=block_q,
            block_kv=block_kv,
        )
        return unswap(out)

    spec = P(None, None, axis_name, None)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v)
