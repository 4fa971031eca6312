"""Fused GQA decode attention over a ragged (quantized) KV cache.

The reference has no decode path at all — its kernels are prefill-only
(SURVEY.md §0: "no KV cache or decode path").  This kernel is the TPU
build's north-star extension (BASELINE.md config: FP8/int8 KV-cache decode at
Llama-3-8B shapes).

Shape model (one new token per sequence):
  q:        (B, Hq, D)       current-step queries
  k_cache:  (B, Hkv, Smax, D)  ragged cache, only lengths[b] rows valid
  v_cache:  (B, Hkv, Smax, D)
  k_scale/v_scale: (B, Hkv, Smax) fp32 token-wise dequant scales when the
  cache is 8-bit (int8 container preferred: 2x MXU rate on v5e+, and the
  DMA halving is the real win — decode is bandwidth-bound).
  lengths:  (B,) int32 valid lengths (entries may be 0 for empty slots)

TPU mapping:
  * grid (B, Hkv, Smax/block_kv), KV dim innermost/"arbitrary" so Mosaic
    double-buffers the cache stream from HBM;
  * the GQA group (G = Hq/Hkv queries sharing one KV head) forms the matmul
    M dim — the "commute sum and matmul" trick: one (G, D) x (D, bkv) MXU op
    serves all queries of the group;
  * lengths live in SMEM via PrefetchScalarGridSpec so fully-invalid KV
    blocks are skipped before their DMA is issued;
  * online softmax in fp32, exp2 domain, identical math to the prefill
    kernel (reference merge operator tk/attention.py:274-313).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config
from ..utils import checks
from ..utils.shapes import round_up

LOG2E = math.log2(math.e)
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NUM_LANES = 128


def _decode_kernel(
    # scalar prefetch
    lengths_ref,
    # inputs
    *refs,
    quantized: bool,
    sm_scale: float,
    block_kv: int,
    group_pad: int,
):
    if quantized:
        q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref = refs[:6]
        m_scr, l_scr, acc_scr = refs[6:]
    else:
        q_ref, k_ref, v_ref, o_ref = refs[:4]
        m_scr, l_scr, acc_scr = refs[4:]

    b = pl.program_id(0)
    h = pl.program_id(1)
    j = pl.program_id(2)
    num_kv_blocks = pl.num_programs(2)
    length = lengths_ref[b]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(j * block_kv < length)
    def _run():
        q = q_ref[0, 0]  # (group_pad, D) float
        k = k_ref[0, 0]  # (block_kv, D)
        kc = k.astype(jnp.bfloat16) if checks.is_8bit_dtype(k.dtype) else k
        s = jax.lax.dot_general(
            q, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        s = s * (sm_scale * LOG2E)
        if quantized:
            # Scale blocks cover all KV heads (Mosaic sublane rule); pick
            # this program's head row, apply per KV token (columns).
            s = s * ks_ref[0, h, :].reshape(1, block_kv)

        # Ragged tail mask.
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_kv
        s = jnp.where(col < length, s, MASK_VALUE)

        m_prev = m_scr[:]
        l_prev = l_scr[:]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        l_scr[:] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[:] = m_next

        v = v_ref[0, 0]
        if quantized:
            # Dequantize V columns (token-wise) into bf16 before the PV
            # matmul; p is fp32 -> cast to bf16 for the MXU.
            vf = v.astype(jnp.float32) * vs_ref[0, h, :].reshape(block_kv, 1)
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16),
                vf.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            vc = v.astype(jnp.bfloat16) if checks.is_8bit_dtype(v.dtype) else v
            pv = jax.lax.dot_general(
                p.astype(vc.dtype), vc,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_scr[:] = acc_scr[:] * alpha[:, :1] + pv

    @pl.when(j == num_kv_blocks - 1)
    def _epilogue():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[:] * l_inv).astype(o_ref.dtype)


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    lengths: jax.Array,
    *,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    sm_scale: Optional[float] = None,
    block_kv: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Single-step GQA decode attention; returns (B, Hq, D) in bf16.

    ``k_scale``/``v_scale`` must both be given iff the cache is 8-bit
    token-wise quantized (shape (B, Hkv, Smax) fp32).

    ``block_kv`` defaults to the largest measured-good block (2048; v5e
    sweep at Llama-3-8B shapes: 2048 streams ~187 GB/s vs 140 at 512 —
    decode is per-step-overhead-bound, so fewer, larger blocks win).
    """
    if block_kv is None:
        block_kv = 2048
    batch, num_q_heads, head_dim = q.shape
    _, num_kv_heads, s_max, _ = k_cache.shape
    if num_q_heads % num_kv_heads != 0:
        raise ValueError("num_q_heads must be divisible by num_kv_heads")
    if checks.is_8bit_dtype(q.dtype):
        raise ValueError(
            "decode_attention expects float queries (the cache may be "
            "8-bit, but q has no dequant-scale path)"
        )
    group = num_q_heads // num_kv_heads
    quantized = k_scale is not None
    if quantized != (v_scale is not None):
        raise ValueError("k_scale and v_scale must be given together")
    if checks.is_8bit_dtype(k_cache.dtype) and not quantized:
        raise ValueError("8-bit KV cache requires k_scale/v_scale")
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    if interpret is None:
        interpret = checks.resolve_interpret(config.interpret)

    block_kv = min(block_kv, round_up(s_max, 128))
    s_pad = round_up(s_max, block_kv)
    if s_pad != s_max:
        pad4 = [(0, 0), (0, 0), (0, s_pad - s_max), (0, 0)]
        k_cache = jnp.pad(k_cache, pad4)
        v_cache = jnp.pad(v_cache, pad4)
        if quantized:
            pad3 = [(0, 0), (0, 0), (0, s_pad - s_max)]
            k_scale = jnp.pad(k_scale, pad3)
            v_scale = jnp.pad(v_scale, pad3)

    # The GQA group is the matmul M dim; pad to the fp32 sublane width.
    group_pad = max(8, round_up(group, 8))
    qg = q.reshape(batch, num_kv_heads, group, head_dim)
    if group_pad != group:
        qg = jnp.pad(qg, [(0, 0), (0, 0), (0, group_pad - group), (0, 0)])

    grid = (batch, num_kv_heads, s_pad // block_kv)

    in_specs = [
        pl.BlockSpec(
            (1, 1, group_pad, head_dim), lambda b, h, j, *_: (b, h, 0, 0)
        ),
        pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, h, j, *_: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, h, j, *_: (b, h, j, 0)),
    ]
    args = [qg, k_cache, v_cache]
    if quantized:
        scale_spec = pl.BlockSpec(
            (1, num_kv_heads, block_kv), lambda b, h, j, *_: (b, 0, j)
        )
        in_specs += [scale_spec, scale_spec]
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]

    kernel = functools.partial(
        _decode_kernel,
        quantized=quantized,
        sm_scale=float(sm_scale),
        block_kv=block_kv,
        group_pad=group_pad,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, group_pad, head_dim), lambda b, h, j, *_: (b, h, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((group_pad, NUM_LANES), jnp.float32),
            pltpu.VMEM((group_pad, NUM_LANES), jnp.float32),
            pltpu.VMEM((group_pad, head_dim), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_kv_heads, group_pad, head_dim), jnp.bfloat16
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), *args)

    out = out[:, :, :group, :].reshape(batch, num_q_heads, head_dim)
    return out
