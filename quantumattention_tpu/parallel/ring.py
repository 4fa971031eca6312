"""Ring sequence-parallel attention over a mesh axis.

The reference has no cross-device story at all (SURVEY.md §2.3); this module
is the TPU build's long-context scale-out. KV shards rotate around the mesh
axis with ``jax.lax.ppermute`` (point-to-point over ICI) while each chip runs
the fused flash kernel on the shard currently in front of it; partial
(out, m, l) triples merge with the same online-softmax rescale math the
kernel uses between KV tiles (reference merge operator:
tk/attention.py:274-313 — here applied across chips instead of tiles).

XLA's latency-hiding scheduler overlaps each step's ppermute with the next
step's kernel; after N-1 rotations every chip has seen every KV block.

Causal masking stays correct during rotation because the kernel takes
explicit q/kv position offsets (flash.py q_offset/kv_offset): chip r holds
Q rows [r*Sq_local, ...) forever, while the KV block that arrived at step t
originated on chip (r - t) mod N and carries that chip's global offset.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import config
from ..ops.flash import flash_attention

#: The kernel's online-softmax stats are lane-replicated over 128 lanes.
NUM_LANES = 128


def _merge(o_a, m_a, l_a, o_b, m_b, l_b):
    """Merge two partial attention results with online-softmax rescaling.

    All stats fp32, (B, H, Sq, 128) lane-replicated; outputs fp32
    unnormalized-accumulator convention is NOT used — both inputs are
    normalized outputs with their own (m, l); the merge renormalizes:

      m = max(m_a, m_b); l = l_a*e^(m_a-m) + l_b*e^(m_b-m)
      o = (o_a*l_a*e^(m_a-m) + o_b*l_b*e^(m_b-m)) / l

    The exponent base must match the kernel's softmax domain
    (config.kernel.use_exp2), read at trace time like the kernel does.
    """
    exp = jnp.exp2 if config.kernel.use_exp2 else jnp.exp
    m = jnp.maximum(m_a, m_b)
    a = exp(m_a - m) * l_a
    b = exp(m_b - m) * l_b
    l = a + b
    l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
    o = (
        o_a.astype(jnp.float32) * a[..., :1]
        + o_b.astype(jnp.float32) * b[..., :1]
    ) * l_inv[..., :1]
    return o, m, l


def _ring_body(
    q,
    k,
    v,
    *args,
    axis_name: str,
    is_causal: bool,
    sm_scale: Optional[float],
    window: Optional[Tuple[Optional[int], Optional[int]]],
    block_q: Optional[int],
    block_kv: Optional[int],
    has_scales: bool,
):
    """shard_map body: q/k/v are the local (B, H, S_local, D) shards;
    args carries replicated head-wise (scale_q, scale_k) when quantized."""
    scale_q, scale_k = args if has_scales else (None, None)
    n = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    q_len = q.shape[2]
    kv_len = k.shape[2]
    q_off = rank * q_len

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, t):
        o, m, l, k_blk, v_blk = carry
        src = (rank - t) % n
        kv_off = src * kv_len
        o_t, (m_t, l_t) = flash_attention(
            q,
            k_blk,
            v_blk,
            scale_q=scale_q,
            scale_k=scale_k,
            is_causal=is_causal,
            sm_scale=sm_scale,
            window=window,
            q_offset=q_off,
            kv_offset=kv_off,
            block_q=block_q,
            block_kv=block_kv,
            return_residuals=True,
        )
        o_new, m_new, l_new = _merge(o, m, l, o_t.astype(jnp.float32), m_t, l_t)
        # Rotate KV to the next chip (skipped semantically on the last step,
        # but keeping it unconditional lets XLA pipeline the loop; the extra
        # rotation returns KV to its home chip).
        k_nxt = jax.lax.ppermute(k_blk, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_blk, axis_name, perm)
        return (o_new, m_new, l_new, k_nxt, v_nxt), None

    batch, heads, _, head_dim = q.shape
    o0 = jnp.zeros((batch, heads, q_len, head_dim), jnp.float32)
    m0 = jnp.full((batch, heads, q_len, NUM_LANES), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((batch, heads, q_len, NUM_LANES), jnp.float32)

    (o, _, _, _, _), _ = jax.lax.scan(
        step, (o0, m0, l0, k, v), jnp.arange(n), unroll=True
    )
    # Match flash_attention's output contract: 8-bit value dtypes promote
    # to bf16 (casting the merged fp32 result to fp8 would silently
    # saturate/quantize it).
    out_dtype = v.dtype
    if jnp.dtype(out_dtype).itemsize == 1:
        out_dtype = jnp.bfloat16
    return o.astype(out_dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis_name: str = "sp",
    scale_q: Optional[jax.Array] = None,
    scale_k: Optional[jax.Array] = None,
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    window: Optional[Tuple[Optional[int], Optional[int]]] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
) -> jax.Array:
    """Sequence-parallel fused attention over ``mesh[axis_name]``.

    Args:
      q/k/v: (B, H, S, D) global arrays; S is sharded over ``axis_name``
        (other dims may be sharded over other mesh axes by the caller's jit).
      scale_q/scale_k: optional head-wise (B, H)/(B, Hkv) dequantization
        scales for pre-quantized fp8/int8 q/k — head-wise granularity is
        position-independent, so the scales replicate across the ring while
        the quantized KV payload rotates (half the ICI traffic of bf16).

    Returns (B, H, S, D) with the same sequence sharding as q.
    """
    has_scales = scale_q is not None
    if has_scales and scale_q.ndim != 2:
        raise ValueError(
            "ring_attention supports head-wise (B, H) scales only; "
            "token-wise scales would need to rotate with the KV shards"
        )
    body = functools.partial(
        _ring_body,
        axis_name=axis_name,
        is_causal=is_causal,
        sm_scale=sm_scale if sm_scale is not None else 1.0 / math.sqrt(q.shape[-1]),
        window=window,
        block_q=block_q,
        block_kv=block_kv,
        has_scales=has_scales,
    )
    spec = P(None, None, axis_name, None)
    if has_scales:
        scale_spec = P(None, None)
        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(spec, spec, spec, scale_spec, scale_spec),
            out_specs=spec,
            check_vma=False,
        )(q, k, v, scale_q, scale_k)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v)
