"""Blockwise flash-attention backward kernels (dq and dk/dv).

The reference is forward-only; this gives the TPU build a memory-efficient
training path: neither kernel ever materializes the (Sq, Skv) probability
matrix in HBM — P is recomputed per tile from the forward's saved
online-softmax stats (m, l), exactly the standard flash backward
decomposition:

    D  = rowsum(dO ∘ O)                      (precomputed, one fused pass)
    P  = exp2(q̃·Kᵀ − m) / l                  (q̃ = Q·sm_scale·log2e)
    dV = Pᵀ·dO
    dP = dO·Vᵀ
    dS = P ∘ (dP − D)
    dQ = sm_scale · dS·K        (dq kernel: grid over Q blocks, KV inner)
    dK = sm_scale · dSᵀ·Q       (dkv kernel: grid over KV blocks, Q inner)

Kernel-shape notes:
  * m/l arrive lane-replicated (B, H, S, 128) straight from the forward's
    ``return_residuals=True`` output; D uses the same layout (Mosaic's
    block-shape rules make (B, H, S) blocks awkward, and the replication
    keeps every read a clean (bq, 128) tile);
  * GQA: gradients are computed per Q head and reduced over the sharing
    group outside the kernel (one jnp reshape-sum);
  * masking mirrors the forward: whole-block skip for causal/window tiles,
    iota masks on boundary tiles.
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
NUM_LANES = 128


def _block_mask(
    shape,
    q_start,
    kv_start,
    *,
    causal: bool,
    window: Optional[Tuple[Optional[int], Optional[int]]],
    kv_valid: int,
    q_valid: int,
):
    """Boolean keep-mask for one (bq, bkv) tile; None if nothing to mask."""
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + q_start
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + kv_start
    mask = None

    def _and(m, new):
        return new if m is None else jnp.logical_and(m, new)

    if causal:
        mask = _and(mask, col <= row)
    if window is not None:
        left, right = window
        if left is not None:
            mask = _and(mask, col >= row - left)
        if right is not None and not causal:
            mask = _and(mask, col <= row + right)
    if kv_valid is not None:
        mask = _and(mask, col < kv_valid)
    if q_valid is not None:
        mask = _and(mask, row < q_valid)
    return mask


def _should_run(i, j, block_q, block_kv, *, causal, window):
    """Whole-tile skip predicate (mirrors the forward kernel)."""
    run = True
    q_min = i * block_q
    q_max = q_min + block_q - 1
    kv_min = j * block_kv
    kv_max = kv_min + block_kv - 1
    if causal:
        run = jnp.logical_and(run, kv_min <= q_max)
    if window is not None:
        left, right = window
        if left is not None:
            run = jnp.logical_and(run, kv_max >= q_min - left)
        if right is not None and not causal:
            run = jnp.logical_and(run, kv_min <= q_max + right)
    return run


def _recompute_p(q_s, k, m, l, mask, use_exp2):
    """P tile from prescaled q and saved stats; masked entries -> 0."""
    s = jax.lax.dot_general(
        q_s, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    exp = jnp.exp2 if use_exp2 else jnp.exp
    p = exp(s - m[:, :1])
    l_inv = jnp.where(l[:, :1] == 0.0, 0.0, 1.0 / l[:, :1])
    p = p * l_inv
    if mask is not None:
        p = jnp.where(mask, p, 0.0)
    return p


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, d_ref, dq_ref, dq_acc,
    *, causal, window, sm_scale, block_q, block_kv, kv_valid, q_valid,
    use_exp2,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    nj = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    @pl.when(_should_run(i, j, block_q, block_kv, causal=causal, window=window))
    def _():
        k = k_ref[0, 0].astype(jnp.bfloat16)
        v = v_ref[0, 0].astype(jnp.bfloat16)
        q_s = q_ref[0, 0].astype(jnp.bfloat16)
        do = do_ref[0, 0].astype(jnp.bfloat16)
        mask = _block_mask(
            (block_q, block_kv), i * block_q, j * block_kv,
            causal=causal, window=window, kv_valid=kv_valid, q_valid=None,
        )
        p = _recompute_p(q_s, k, m_ref[0, 0], l_ref[0, 0], mask, use_exp2)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - d_ref[0, 0][:, :1])
        dq_acc[:] += jax.lax.dot_general(
            ds.astype(jnp.bfloat16), k,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    @pl.when(j == nj - 1)
    def _():
        dq_ref[0, 0] = (dq_acc[:] * sm_scale).astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, d_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, causal, window, sm_scale, block_q, block_kv, kv_valid, q_valid,
    use_exp2, inv_fold,
):
    j = pl.program_id(2)  # kv block (outer)
    i = pl.program_id(3)  # q block (inner)
    ni = pl.num_programs(3)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    @pl.when(_should_run(i, j, block_q, block_kv, causal=causal, window=window))
    def _():
        k = k_ref[0, 0].astype(jnp.bfloat16)
        v = v_ref[0, 0].astype(jnp.bfloat16)
        q_s = q_ref[0, 0].astype(jnp.bfloat16)
        do = do_ref[0, 0].astype(jnp.bfloat16)
        mask = _block_mask(
            (block_q, block_kv), i * block_q, j * block_kv,
            causal=causal, window=window, kv_valid=kv_valid, q_valid=q_valid,
        )
        p = _recompute_p(q_s, k, m_ref[0, 0], l_ref[0, 0], mask, use_exp2)
        p16 = p.astype(jnp.bfloat16)
        dv_acc[:] += jax.lax.dot_general(
            p16, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - d_ref[0, 0][:, :1])
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(jnp.bfloat16), q_s,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    @pl.when(i == ni - 1)
    def _():
        # q_s carries sm_scale*fold; dK needs sm_scale -> undo the fold.
        dk_ref[0, 0] = (dk_acc[:] * inv_fold).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def flash_attention_bwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    o: jax.Array,
    do: jax.Array,
    m: jax.Array,
    l: jax.Array,
    *,
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    window: Optional[Tuple[Optional[int], Optional[int]]] = None,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: Optional[bool] = None,
):
    """Blockwise backward; returns (dq, dk, dv) in the input dtypes.

    q/k/v/o/do: (B, Hq|Hkv, S, D) float tensors; m/l: the forward's
    lane-replicated (B, Hq, Sq, 128) fp32 residuals.
    """
    batch, num_q_heads, q_len, head_dim = q.shape
    _, num_kv_heads, kv_len, _ = k.shape
    group = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    if interpret is None:
        interpret = checks.resolve_interpret(config.interpret)
    if is_causal and window is not None:
        window = (window[0], None)

    bq = min(block_q, round_up(q_len, 128))
    bkv = min(block_kv, round_up(kv_len, 128))
    q_len_p = round_up(q_len, bq)
    kv_len_p = round_up(kv_len, bkv)

    def pad_seq(t, target):
        if t.shape[2] == target:
            return t
        pad = [(0, 0), (0, 0), (0, target - t.shape[2]), (0, 0)]
        return jnp.pad(t, pad)

    # D = rowsum(dO*O), lane-replicated like m/l.
    d_stat = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )
    d_stat = jnp.broadcast_to(
        d_stat, (batch, num_q_heads, q_len, NUM_LANES)
    )

    # Prescale q once (same fold as the forward kernel; base follows the
    # configured softmax exponent domain, matching the saved m/l stats).
    use_exp2 = config.kernel.use_exp2
    fold = LOG2E if use_exp2 else 1.0
    q_s = (q.astype(jnp.float32) * (sm_scale * fold)).astype(q.dtype)

    qp = pad_seq(q_s, q_len_p)
    dop = pad_seq(do, q_len_p)
    kp = pad_seq(k, kv_len_p)
    vp = pad_seq(v, kv_len_p)
    mp = pad_seq(m, q_len_p)
    lp = pad_seq(l, q_len_p)
    dp_stat = pad_seq(d_stat, q_len_p)

    qspec = pl.BlockSpec((1, 1, bq, head_dim), lambda b, h, x, y: (b, h, x, 0))
    statspec = pl.BlockSpec(
        (1, 1, bq, NUM_LANES), lambda b, h, x, y: (b, h, x, 0)
    )
    # dq reads the GQA-shared KV head directly (no write conflict there).
    kvspec = pl.BlockSpec(
        (1, 1, bkv, head_dim), lambda b, h, x, y: (b, h // group, y, 0)
    )

    common = dict(
        causal=is_causal,
        window=window,
        sm_scale=float(sm_scale),
        block_q=bq,
        block_kv=bkv,
        use_exp2=use_exp2,
        kv_valid=kv_len if kv_len != kv_len_p else None,
        q_valid=q_len if q_len != q_len_p else None,
    )

    vmem = dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        grid=(batch, num_q_heads, q_len_p // bq, kv_len_p // bkv),
        in_specs=[qspec, kvspec, kvspec, qspec, statspec, statspec, statspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_q_heads, q_len_p, head_dim), q.dtype
        ),
        scratch_shapes=[pltpu.VMEM((bq, head_dim), jnp.float32)],
        **vmem,
    )(qp, kp, vp, dop, mp, lp, dp_stat)

    # dkv: swap grid roles — kv outer ("x" indexes kv), q inner ("y").
    # Each q head accumulates into its own dk/dv slice (kv heads read via
    # h//group to avoid write conflicts); the group is reduced afterwards.
    qspec_i = pl.BlockSpec((1, 1, bq, head_dim), lambda b, h, x, y: (b, h, y, 0))
    statspec_i = pl.BlockSpec(
        (1, 1, bq, NUM_LANES), lambda b, h, x, y: (b, h, y, 0)
    )
    kvspec_i = pl.BlockSpec(
        (1, 1, bkv, head_dim), lambda b, h, x, y: (b, h // group, x, 0)
    )
    kvspec_o = pl.BlockSpec(
        (1, 1, bkv, head_dim), lambda b, h, x, y: (b, h, x, 0)
    )

    def _dkv(kern):
        return pl.pallas_call(
            functools.partial(kern, inv_fold=1.0 / fold, **common),
            grid=(batch, num_q_heads, kv_len_p // bkv, q_len_p // bq),
            in_specs=[
                qspec_i, kvspec_i, kvspec_i, qspec_i,
                statspec_i, statspec_i, statspec_i,
            ],
            out_specs=[kvspec_o, kvspec_o],
            out_shape=[
                jax.ShapeDtypeStruct(
                    (batch, num_q_heads, kv_len_p, head_dim), k.dtype
                ),
                jax.ShapeDtypeStruct(
                    (batch, num_q_heads, kv_len_p, head_dim), v.dtype
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((bkv, head_dim), jnp.float32),
                pltpu.VMEM((bkv, head_dim), jnp.float32),
            ],
            **vmem,
        )(qp, kp, vp, dop, mp, lp, dp_stat)

    # _dkv_kernel's mask needs (i, j) as (q, kv): its program ids are
    # (b, h, x=kv, y=q); the kernel body maps them accordingly.
    dk, dv = _dkv(_dkv_kernel)

    dq = dq[:, :, :q_len, :]
    dk = dk[:, :, :kv_len, :]
    dv = dv[:, :, :kv_len, :]
    if group > 1:
        dk = dk.reshape(
            batch, num_kv_heads, group, kv_len, head_dim
        ).sum(axis=2).astype(k.dtype)
        dv = dv.reshape(
            batch, num_kv_heads, group, kv_len, head_dim
        ).sum(axis=2).astype(v.dtype)
    return dq, dk, dv
