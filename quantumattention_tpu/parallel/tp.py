"""Head-sharded tensor-parallel attention via shard_map.

Under plain jit, a ``pallas_call`` is opaque to GSPMD, so sharded operands
would be gathered onto every chip.  This wrapper makes the head sharding
explicit: each chip runs the fused kernel on its local heads — zero
communication during attention (the scaling-book recipe; GQA co-location
keeps each KV head on the chip that owns its Q-head group).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.flash import flash_attention


def head_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis_name: str = "tp",
    scale_q: Optional[jax.Array] = None,
    scale_k: Optional[jax.Array] = None,
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    window: Optional[Tuple[Optional[int], Optional[int]]] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
) -> jax.Array:
    """Fused attention with heads sharded over ``mesh[axis_name]``.

    q: (B, Hq, S, D) with Hq sharded; k/v: (B, Hkv, S, D) with Hkv sharded
    (requires Hkv % axis_size == 0 so each chip keeps whole GQA groups).
    Head-wise/token-wise scales shard along their head dim too.
    """
    n = mesh.shape[axis_name]
    if q.shape[1] % n or k.shape[1] % n:
        raise ValueError(
            f"q heads ({q.shape[1]}) and kv heads ({k.shape[1]}) must both "
            f"be divisible by the '{axis_name}' axis size ({n}); replicate "
            "KV instead for finer Q-head sharding"
        )

    hspec = P(None, axis_name, None, None)
    kwargs = dict(
        is_causal=is_causal,
        sm_scale=sm_scale,
        window=window,
        block_q=block_q,
        block_kv=block_kv,
    )

    if scale_q is None:

        def body(q, k, v):
            return flash_attention(q, k, v, **kwargs)

        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(hspec, hspec, hspec),
            out_specs=hspec,
            check_vma=False,
        )(q, k, v)

    scale_spec = (
        P(None, axis_name)
        if scale_q.ndim == 2
        else P(None, axis_name, None)
    )

    def body_scaled(q, k, v, sq, sk):
        return flash_attention(q, k, v, scale_q=sq, scale_k=sk, **kwargs)

    return jax.shard_map(
        body_scaled,
        mesh=mesh,
        in_specs=(hspec, hspec, hspec, scale_spec, scale_spec),
        out_specs=hspec,
        check_vma=False,
    )(q, k, v, scale_q, scale_k)
