"""Fused flash-attention forward kernel (Pallas / Mosaic, TPU-native).

This is the TPU re-design of the reference's two hot kernels — the
ThunderKittens warp-specialized TMA pipeline (reference:
src/quantum_attn/tk/attention.py:97-349) and the Triton persistent TMA
template (reference: src/quantum_attn/inductor/kernels/attention.py:147-670).
None of their CUDA machinery survives here; the same *capability* is
expressed the Pallas way:

  * producer/consumer warpgroups + 2-stage TMA pipeline  ->  a Pallas grid
    ``(batch, q_heads, q_blocks, kv_blocks)`` whose HBM->VMEM block streaming
    is automatically double-buffered by Mosaic;
  * WGMMA fp8 matmuls  ->  MXU ``dot_general`` (8-bit operands run through
    the int8 MXU path at 2x bf16 rate on v5e+; fp8 e4m3 operands are exact
    in bf16 so the bf16 MXU path is bit-faithful);
  * exp2-domain online softmax with folded ``scale_q*scale_k*sm_scale*log2e``
    (reference tk/attention.py:204-210,238-240)  ->  identical math on fp32
    accumulators in VMEM scratch;
  * causal two-stage decomposition + ragged-tail masks (reference
    inductor/kernels/attention.py:592-641, tk/attention.py:252-272)  ->
    block-level ``@pl.when`` skipping plus iota masks on boundary blocks;
  * grid z/y = batch/head (reference tk/attention.py:502-504)  ->  grid
    dims marked "parallel" so Mosaic may split them across megacores.

Capabilities beyond the reference (per BASELINE.json north star): GQA in the
fast path (the reference's Python validators disallow it, nn.py:101-104,
even though its C++ host supports it), sliding-window masking, position
offsets for ring/sequence-parallel composition, and residual (m, l) outputs
for cross-device online-softmax merging.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config
from ..utils import checks
from ..utils.shapes import round_up

LOG2E = math.log2(math.e)

#: Large negative logit for masked positions; avoids NaN from (-inf) - (-inf)
#: while still flushing exp2/exp to exactly 0.
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

#: Lane width of the residual (m, l) output layout.
NUM_LANES = 128

#: Scoped-VMEM budgets for the per-block path's resident KV caches: below
#: KV_CACHE_BUDGET_BYTES both the quantized K and the raw V stay cached
#: across Q rows; up to K_CACHE_BUDGET_BYTES only the (8-bit) K cache
#: survives and V streams from HBM — this keeps the quantized fast path
#: alive out to ~256K context (32 MiB of int8 K at D=128) instead of
#: degrading at 16 MiB total.
KV_CACHE_BUDGET_BYTES = 16 * 1024 * 1024
K_CACHE_BUDGET_BYTES = 32 * 1024 * 1024

#: Granule (in tokens, both axes) of the block-sparse attention bitmap.
#: Fixed so mask semantics do not depend on tuned kernel block sizes.
MASK_GRANULE = 128


def _heuristic_blocks(
    q_len: int, kv_len: int, head_dim: int
) -> Tuple[int, int]:
    """Default (block_q, block_kv).

    The analogue of the reference's per-head-dim config table + short-seq
    shrink (inductor/kernels/attention.py:673-785): larger KV blocks amortize
    HBM reads, smaller blocks keep VMEM within budget for big head dims.
    """
    if head_dim >= 256:
        bq_t, bkv_t = 512, 1024
    else:
        # Measured on v5e at B=16,H=16,S=8192,D=128 (prescaled q, 64 MiB
        # scoped VMEM): (1024, 2048) reaches 144-147 TFLOP/s bf16; smaller
        # blocks lose to KV re-reads, larger ones exhaust scoped VMEM.
        bq_t, bkv_t = 1024, 2048
    bq = min(bq_t, round_up(q_len, 128))
    bkv = min(bkv_t, round_up(kv_len, 128))
    return bq, bkv


def _vmem_limit_bytes():
    """Scoped-VMEM budget for the kernel.

    The Mosaic default (16 MiB on v5e) caps score tiles at ~512x1024; the
    measured-optimal (1024, 2048) blocks need ~24 MiB of scoped scratch, so
    raise the limit to 64 MiB on generations with >= 128 MiB physical VMEM.
    """
    if config.kernel.vmem_limit_mb:
        return int(config.kernel.vmem_limit_mb) * 1024 * 1024
    if checks.tpu_generation() >= 5:
        # v5e/v5p/v6e carry 128 MiB physical VMEM; v4 and earlier have far
        # less (v4: 32 MiB VMEM + CMEM), where a 64 MiB scoped request would
        # fail Mosaic compilation outright instead of degrading.
        return 64 * 1024 * 1024
    return None


def _compute_cast(x: jax.Array) -> jax.Array:
    """Upcast 8-bit operands for the bf16 MXU path.

    float8_e4m3fn and int8 embed exactly in bfloat16, so these casts are
    value-preserving; the fp32 accumulation then matches the reference's
    ``QK_ACC_TYPE = tl.float32`` (inductor/kernels/attention.py:856-858).
    int8 must be upcast here because Mosaic rejects int operands with a
    float accumulator (the dedicated int8 path keeps an int32 accumulator).
    """
    if checks.is_8bit_dtype(x.dtype) or x.dtype == jnp.float16:
        return x.astype(jnp.bfloat16)
    return x


def _flash_kernel(
    # --- dynamically assembled ref list (see _build_specs) ---
    *refs,
    # --- static parameters ---
    has_offsets: bool,
    has_segments: bool,
    scaling: str,  # "none" | "head" | "token" | "block"
    causal: bool,
    window: Optional[Tuple[Optional[int], Optional[int]]],
    sm_scale: float,
    kv_valid: int,
    kv_len_padded: int,
    block_q: int,
    block_kv: int,
    use_exp2: bool,
    softmax_bf16: bool,
    return_residuals: bool,
    use_int8_dot: bool,
    use_int8_pv: bool,
    use_fp8_dot: bool,
    fast_accum: bool,
    gqa_group: int,
    prescaled: bool,
    k_cached: bool,
    v_cached: bool,
    has_block_mask: bool = False,
    compact: bool = False,
    block_qdtype: Any = jnp.int8,
    causal_two_stage: bool = False,
    single_kv_block: bool = False,
):
    # With a block mask the call runs under PrefetchScalarGridSpec and the
    # kernel receives a scalar-prefetched KV block table as refs[0]:
    #   * compact grid (concrete mask): jmap[i, s] = s-th active KV block of
    #     row i — the grid's last dim only spans active blocks, skipped
    #     steps do not exist at all;
    #   * full grid (traced mask): ft[i, j] = last active block <= j, so
    #     consecutive skipped steps re-reference the resident block and
    #     Mosaic elides their DMAs.
    # The same ref also supplies the kernel-body block position (j_pos).
    if has_block_mask:
        fetch_ref = refs[0]
    idx = 1 if has_block_mask else 0
    if has_offsets:
        q_off_ref, kv_off_ref = refs[idx], refs[idx + 1]
        idx += 2
    if has_block_mask:
        block_any_ref, mask_ref = refs[idx], refs[idx + 1]
        idx += 2
    if scaling in ("head", "token"):
        scale_q_ref, scale_k_ref = refs[idx], refs[idx + 1]
        idx += 2
    if use_int8_pv:
        scale_v_ref = refs[idx]
        idx += 1
    if has_segments:
        q_seg_ref, kv_seg_ref = refs[idx], refs[idx + 1]
        idx += 2
    q_ref, k_ref, v_ref = refs[idx : idx + 3]
    idx += 3
    o_ref = refs[idx]
    idx += 1
    if return_residuals:
        m_out_ref, l_out_ref = refs[idx], refs[idx + 1]
        idx += 2
    m_scr, l_scr, acc_scr = refs[idx : idx + 3]
    idx += 3
    if scaling == "block":
        q8_scr, sq_scr = refs[idx], refs[idx + 1]
        idx += 2
    if k_cached:
        k_cache_ref = refs[idx]
        idx += 1
        if scaling == "block":
            sk_cache = refs[idx]
            idx += 1
        if v_cached:
            v_cache_ref = refs[idx]
            idx += 1

    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
    j = pl.program_id(3)
    num_kv_blocks = pl.num_programs(3)
    # Block POSITION for masking/position math.  With a block mask the grid
    # index j enumerates table slots, and the actual KV block comes from the
    # prefetched table (on the full grid the table is the identity on active
    # steps, and skipped steps never read positions).
    j_pos = fetch_ref[i, j] if has_block_mask else j

    if has_offsets:
        q_off = q_off_ref[0]
        kv_off = kv_off_ref[0]
    else:
        q_off = 0
        kv_off = 0

    # Per-block quantization container: int8 rides the 2x 8-bit MXU path on
    # v5e; fp8 e4m3 rides the native fp8 MXU on v6e+ (the analogue of the
    # reference's fp8 WGMMA, tk/attention.py:233).
    _block_int = jnp.issubdtype(jnp.dtype(block_qdtype), jnp.integer)
    _block_qmax = 127.0 if _block_int else 448.0

    def _quantize_tile(xf):
        """amax/qmax per-tile dynamic quantization (reference nn.py:14-19
        math at per-block granularity)."""
        s = jnp.maximum(jnp.max(jnp.abs(xf)) / _block_qmax, 1e-12)
        scaled = xf * (1.0 / s)
        if _block_int:
            scaled = jnp.round(scaled)
        return scaled.astype(block_qdtype), s

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        if scaling == "block":
            # In-kernel per-block dynamic quantization of the Q tile (the
            # north-star improvement over the reference, which quantizes
            # outside the kernel — nn.py:410-418): one amax + scale + cast
            # per Q block, reused across every KV step.
            qf = q_ref[0, 0].astype(jnp.float32)
            q8, sq = _quantize_tile(qf)
            q8_scr[:] = q8
            sq_scr[0] = sq

    # ---- block-level skip (reference: causal two-stage decomposition and
    # the official flash pattern of skipping above-diagonal KV tiles) ----
    should_run = True
    q_blk_min = q_off + i * block_q
    q_blk_max = q_blk_min + block_q - 1
    kv_blk_min = kv_off + j_pos * block_kv
    kv_blk_max = kv_blk_min + block_kv - 1
    if causal:
        should_run = jnp.logical_and(should_run, kv_blk_min <= q_blk_max)
    if window is not None:
        left, right = window
        if left is not None:
            should_run = jnp.logical_and(
                should_run, kv_blk_max >= q_blk_min - left
            )
        if right is not None and not causal:
            should_run = jnp.logical_and(
                should_run, kv_blk_min <= q_blk_max + right
            )
    if kv_valid < kv_len_padded:
        should_run = jnp.logical_and(should_run, j_pos * block_kv < kv_valid)
    if has_block_mask:
        if compact:
            # Compact grid: slots past this row's active count repeat the
            # last active block (DMA elided) and skip the body.
            should_run = jnp.logical_and(should_run, j < block_any_ref[i])
        else:
            # Splash-style block-sparse skip: a kernel block whose every
            # mask granule is zero never launches its matmuls or
            # DMA-consuming compute (the bitmap's OR-reduction per kernel
            # block lives in SMEM, precomputed on the host).
            should_run = jnp.logical_and(
                should_run, block_any_ref[i, j] > 0
            )

    @pl.when(should_run)
    def _run():
        # ---- KV source: fresh HBM block refs, or the VMEM-resident cache
        # filled on the first Q row that touches each block (the host index
        # map elides the HBM re-fetch for every later row, so K and V are
        # each read from HBM exactly once per (batch, head)) ----
        if k_cached:
            first_i = jax.lax.div(j * block_kv, block_q) if causal else 0
            ds = pl.ds(j * block_kv, block_kv)

            @pl.when(i == first_i)
            def _fill():
                if scaling == "block":
                    k8, skv_ = _quantize_tile(k_ref[0, 0].astype(jnp.float32))
                    k_cache_ref[ds] = k8
                    sk_cache[j] = skv_
                else:
                    k_cache_ref[ds] = k_ref[0, 0]
                if v_cached:
                    v_cache_ref[ds] = v_ref[0, 0]

            k_blk = k_cache_ref[ds]
            v_blk = v_cache_ref[ds] if v_cached else v_ref[0, 0]
            if scaling == "block":
                sk = sk_cache[j]
        else:
            k_blk = k_ref[0, 0]
            v_blk = v_ref[0, 0]
            if scaling == "block":
                k_blk, sk = _quantize_tile(k_blk.astype(jnp.float32))

        if scaling == "block":
            # 8-bit MXU path on the in-kernel-quantized tiles; both dequant
            # scalars fold into the multiply below together with sm_scale.
            # int8 container goes through the int32 accumulator Mosaic
            # requires; the fp8 container (v6e+) accumulates fp32 natively.
            s = jax.lax.dot_general(
                q8_scr[:],
                k_blk,
                (((1,), (1,)), ((), ())),
                preferred_element_type=(
                    jnp.int32 if _block_int else jnp.float32
                ),
            ).astype(jnp.float32)
        elif use_int8_dot:
            # Mosaic requires an int accumulator for int8 operands; the
            # int32->f32 convert fuses with the scale multiply below.
            s = jax.lax.dot_general(
                q_ref[0, 0],
                k_blk,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        elif use_fp8_dot:
            # Generation-gated fp8-native MXU matmul: e4m3 operands feed the
            # MXU directly with fp32 accumulation — the TPU analogue of the
            # reference's fp8 WGMMA (tk/attention.py:233).  Reached on v6e+
            # (or when config.attention.fp8_dot is forced on).
            s = jax.lax.dot_general(
                q_ref[0, 0],
                k_blk,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            s = jax.lax.dot_general(
                _compute_cast(q_ref[0, 0]),
                _compute_cast(k_blk),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # ---- scale folding (reference tk/attention.py:204-210 for
        # head-wise, inductor/kernels/attention.py:391-395 for token-wise;
        # log2e fold per attention.py:400) ----
        # NOTE (measured v5e): deferring the scalar dequant scale into the
        # exp2 argument (raw-int32 row max; scale folded into the
        # elementwise chain) was tried and REGRESSED per-block 138.7 ->
        # 130.3 TFLOP/s — Mosaic fuses the convert+scale into the softmax
        # pass just fine, and the int-domain max breaks that fusion.  Keep
        # the straightforward scaled-f32 structure.
        base = sm_scale * (LOG2E if use_exp2 else 1.0)
        if scaling == "block":
            s = s * (sq_scr[0] * sk * base)
        elif scaling == "head":
            # Whole (B, H)/(B, Hkv) scale tables live in SMEM; index by
            # grid position (blocked SMEM specs are not supported).
            s = s * (scale_q_ref[b, h] * scale_k_ref[b, h // gqa_group] * base)
        elif scaling == "token":
            qs = scale_q_ref[0, h, :].reshape(block_q, 1)
            ks = scale_k_ref[0, h // gqa_group, :].reshape(1, block_kv)
            s = s * (qs * base) * ks
        elif not prescaled:
            s = s * base

        # ---- masking (causal / window / segments / ragged KV tail) ----
        need_mask = (
            causal
            or window is not None
            or kv_valid < kv_len_padded
            or has_segments
            or has_block_mask
        )
        if need_mask:
            def apply_mask(s):
                shape = (block_q, block_kv)
                row = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + q_blk_min
                col = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + kv_blk_min
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
                        # Right extents are inactive under causal masking —
                        # keep in sync with the block-skip predicate, the
                        # backward kernels, and the oracle VJP.
                        mask = _and(mask, col <= row + right)
                if kv_valid < kv_len_padded:
                    local_col = col - kv_blk_min + j_pos * block_kv
                    mask = _and(mask, local_col < kv_valid)
                if has_segments:
                    # q ids lane-replicated (bq, 128), kv ids sublane-
                    # replicated (8, bkv) — the production TPU flash layout
                    # that satisfies Mosaic's (8, 128) block-shape rules.
                    q_seg = q_seg_ref[0][:, :1]  # (bq, 1)
                    kv_seg = kv_seg_ref[0][:1, :]  # (1, bkv)
                    mask = _and(mask, q_seg == kv_seg)
                if has_block_mask:
                    # The granule bitmap arrives lane-pre-expanded by the
                    # host to (bq/G, bkv) int8 and block-indexed by (i, j),
                    # so the only in-kernel work is a static sublane
                    # broadcast of each granule row to its G query rows
                    # plus one compare folded into the shared where().
                    # (The earlier iota/selection-matmul expansion was
                    # measured at +40% kernel time: its K=8 element-select
                    # matmul costs as many MXU tile-passes as the QK
                    # product itself.  Gathers and sublane-expanding
                    # reshapes stay off the table — layout-hostile in
                    # Mosaic — but broadcast+concat of static row slices
                    # lowers cleanly.)
                    # Upcast the tiny granule block before comparing:
                    # compiled Mosaic has no int8 vector compare ("Target
                    # does not support this comparison"; interpret mode is
                    # laxer and lets it through).
                    sub = mask_ref[0, 0].astype(jnp.float32)  # (bq//G, bkv)
                    rows = [
                        jnp.broadcast_to(
                            sub[a : a + 1, :], (MASK_GRANULE, block_kv)
                        )
                        for a in range(block_q // MASK_GRANULE)
                    ]
                    elem = (
                        jnp.concatenate(rows, axis=0)
                        if len(rows) > 1
                        else rows[0]
                    )
                    mask = _and(mask, elem > 0.5)
                return jnp.where(mask, s, MASK_VALUE)

            pass  # apply_mask defined; application site depends on the split

        # ---- online softmax + PV (fp32; reference tk/attention.py:274-313),
        # factored so the causal two-stage split below can instantiate a
        # masked and an unmasked arm from the same code ----
        def _softmax_pv(s):
            exp = jnp.exp2 if use_exp2 else jnp.exp
            if single_kv_block:
                # FAST_SOFTMAX (reference attention.py:419-425,859): one KV
                # block covers the whole row — single-pass softmax, no
                # running-state merge, no accumulator rescale.
                m_curr = jnp.max(s, axis=-1, keepdims=True)
                if softmax_bf16:
                    p = exp((s - m_curr).astype(jnp.bfloat16))
                    l_next = jnp.sum(
                        p, axis=-1, keepdims=True, dtype=jnp.float32
                    )
                else:
                    p = exp(s - m_curr)
                    l_next = jnp.sum(p, axis=-1, keepdims=True)
                m_scr[:] = m_curr + jnp.zeros_like(m_scr)
                l_scr[:] = l_next + jnp.zeros_like(l_scr)
                alpha = None
            else:
                m_prev = m_scr[:]  # (block_q, NUM_LANES), lane-replicated
                l_prev = l_scr[:]
                m_curr = jnp.max(s, axis=-1, keepdims=True)  # (block_q, 1)
                m_next = jnp.maximum(m_prev, m_curr)  # -> lane-replicated
                alpha = exp(m_prev - m_next)
                if softmax_bf16:
                    # Reduced-precision probability tile: the max-subtract
                    # stays fp32, the exp2 + row-sum run on bf16 vectors
                    # (the score-tile elementwise passes are the kernel's
                    # VPU bottleneck once the matmuls run at the 8-bit MXU
                    # rate).  exp2 outputs live in (0, 1], where bf16's
                    # 8-bit mantissa keeps the attention output comfortably
                    # inside the 1e-2 RMSE bar.
                    p = exp((s - m_next[:, :1]).astype(jnp.bfloat16))
                    l_next = alpha * l_prev + jnp.sum(
                        p, axis=-1, keepdims=True, dtype=jnp.float32
                    )
                else:
                    p = exp(s - m_next[:, :1])
                    l_next = alpha * l_prev + jnp.sum(
                        p, axis=-1, keepdims=True
                    )
                m_scr[:] = m_next
                l_scr[:] = l_next

            if use_int8_pv:
                # P in (0, 1] has a known scale: round(p * 127) is exact
                # int8.  V is per-channel quantized, so its scale factors
                # out of the KV sum and both dequants collapse into one
                # epilogue row-multiply (SageAttention-style 8-bit PV; the
                # int8 MXU runs 2x bf16).
                p8 = jnp.round(p * 127.0).astype(jnp.int8)
                pv = jax.lax.dot_general(
                    p8,
                    v_blk,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
            else:
                v = _compute_cast(v_blk)  # (block_kv, D)
                # NOTE on use_fast_accum: the reference maps it to a
                # reduced-precision tl.dot accumulator (mm_common.py:79);
                # the TPU MXU has no such mode — Mosaic rejects non-32-bit
                # matmul accumulators outright ('Expected matmul acc to be
                # 32-bit'), because fp32 accumulation is the hardware's
                # only path.  The flag therefore maps to the epilogue's
                # approximate reciprocal (see _epilogue), the TPU fast-math
                # knob that actually exists.
                pv = jax.lax.dot_general(
                    p.astype(v.dtype),
                    v,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            if single_kv_block:
                acc_scr[:] = pv
            else:
                acc_scr[:] = acc_scr[:] * alpha[:, :1] + pv

        if causal_two_stage:
            # Causal two-stage decomposition (reference inductor/kernels/
            # attention.py:592-641) as PREDICATED REGIONS: strictly-below-
            # diagonal blocks execute an arm containing no mask code at
            # all; only diagonal-crossing blocks pay the iota/compare/
            # select VPU passes.  This differs from the measured-slower
            # per-block lax.cond over the mask alone (note in git history):
            # here the whole softmax+PV body is duplicated at trace time
            # and Mosaic predicates entire regions, rather than inserting
            # value-level control flow into one fused elementwise chain.
            interior = kv_blk_max <= q_blk_min  # every col <= every row

            @pl.when(interior)
            def _off_band():
                _softmax_pv(s)

            @pl.when(jnp.logical_not(interior))
            def _on_band():
                _softmax_pv(apply_mask(s))
        else:
            # Note: branching per block with lax.cond to spare interior
            # blocks the mask passes was measured SLOWER on v5e (85 -> 55
            # TFLOP/s causal) — Mosaic value-level control flow costs more
            # than the VPU selects it avoids — so masking is unconditional
            # on this path.
            _softmax_pv(apply_mask(s) if need_mask else s)

    @pl.when(j == num_kv_blocks - 1)
    def _epilogue():
        l = l_scr[:, :1]
        # fast_accum -> approximate reciprocal for the softmax
        # normalization (the TPU analogue of the reference's fast-math
        # epilogue division, attention.py:158-324 'div' PTX micro-op).
        if fast_accum:
            recip = pl.reciprocal(l, approx=True)
        else:
            recip = 1.0 / l
        l_inv = jnp.where(l == 0.0, 0.0, recip)
        o = acc_scr[:] * l_inv
        # A row whose every KV position was masked (e.g. a segment id with
        # no counterpart) never sees a logit above MASK_VALUE: its p values
        # degenerate to exp(MASK-MASK)=1 and o would be mean(V).  Such rows
        # are defined to output zeros; detect them by the running max.
        o = jnp.where(m_scr[:, :1] > 0.5 * MASK_VALUE, o, 0.0)
        if use_int8_pv:
            # Undo the P (1/127) and per-channel V scales in one pass.
            # The block covers all KV heads ((1, Hkv, D) — Mosaic's sublane
            # rule); pick this program's row dynamically.
            sv = scale_v_ref[0, h // gqa_group, :].reshape(1, -1)
            o = o * (sv * (1.0 / 127.0))
        o_ref[0, 0] = o.astype(o_ref.dtype)
        if return_residuals:
            m_out_ref[0, 0] = m_scr[:]
            l_out_ref[0, 0] = l_scr[:]


def _autotuned_blocks(
    q, k, v, scale_q, scale_k, scale_v, is_causal, sm_scale, window,
    fused_block_quant,
):
    """Consult (and populate) the autotune cache.

    The Inductor analogue (reference attention.py:1034) benchmarks its
    choice list at compile time.  JAX has no compile-time hook, so eager
    calls time the real inputs directly, and calls *inside* ``jax.jit``
    synthesize concrete device buffers of the same shape class at trace
    time and time those — either way the winner lands in the disk cache
    and every later trace takes the cache hit.
    """
    from .. import autotune

    batch, hq, q_len, head_dim = q.shape
    hkv, kv_len = k.shape[1], k.shape[2]
    # The quantization mode changes the kernel (int8 dots, VMEM KV cache),
    # so it is part of the shape class.
    if fused_block_quant:
        kind = "flash-block"
    elif scale_q is not None:
        kind = f"flash-q{scale_q.ndim}"
    else:
        kind = "flash"
    if scale_v is not None:
        kind += "-pv8"
    if window is not None:
        # Window extents change the block-skip fraction and thus the
        # optimal blocks; fold them into the shape class.
        kind += f"-w{window[0]}_{window[1]}"
    key = autotune.shape_key(
        kind, batch, hq, hkv, q_len, kv_len, head_dim, is_causal, q.dtype
    )
    hit = autotune.lookup(key)
    if hit is not None:
        return hit

    def _sweep(q, k, v, scale_q, scale_k, scale_v):
        candidates = autotune.prune_candidates(q_len, kv_len, head_dim)

        def run_with_blocks(bq, bkv):
            fn = jax.jit(
                functools.partial(
                    flash_attention,
                    is_causal=is_causal,
                    sm_scale=sm_scale,
                    window=window,
                    block_q=bq,
                    block_kv=bkv,
                    fused_block_quant=fused_block_quant,
                )
            )
            # (fn, args) runner pair -> autotune chains iterations through
            # eps (the fixed ~33 ms dispatch+fetch roundtrip would drown
            # sub-ms candidate deltas) with the buffers passed as jit
            # PARAMETERS — closing over them would embed them as program
            # constants and overflow the remote compiler (HTTP 413).
            has_q = scale_q is not None
            has_v = scale_v is not None
            extra = (
                ((scale_q, scale_k) if has_q else ())
                + ((scale_v,) if has_v else ())
            )

            def runner(eps, q, k, v, *s):
                kwargs = {}
                if has_q:
                    kwargs.update(scale_q=s[0], scale_k=s[1])
                if has_v:
                    kwargs["scale_v"] = s[2 if has_q else 0]
                return fn(q + eps.astype(q.dtype), k, v, **kwargs)

            return runner, (q, k, v) + extra

        return autotune.tune(key, run_with_blocks, candidates)

    if isinstance(q, jax.core.Tracer):
        if not config.kernel.autotune_in_jit:
            return None, None  # heuristic fallback
        if jax.process_count() > 1:
            # Multi-host SPMD programs must be bit-identical across hosts;
            # independently-timed winners could diverge (and hang the pod).
            # Pre-populate the disk cache offline instead.
            return None, None
        try:
            # Pre-tune from inside the trace on synthesized inputs (see
            # autotune.synth_like).  EVERYTHING — synthesis, the candidate
            # kernels, and the timing fetches — must escape the ambient
            # trace; a fresh thread does that (trace state is thread-local;
            # autotune.run_outside_trace explains why ensure_compile_time_
            # eval cannot).  The timed runs pass explicit blocks, so they
            # bypass this function — no recursion.
            def _synth_and_sweep():
                sq, sk, sv = scale_q, scale_k, scale_v
                qq, kk, vv = (autotune.synth_like(t) for t in (q, k, v))
                if sq is not None:
                    sq = autotune.synth_like(sq)
                    sk = autotune.synth_like(sk)
                if sv is not None:
                    sv = autotune.synth_like(sv)
                return _sweep(qq, kk, vv, sq, sk, sv)

            return autotune.run_outside_trace(_synth_and_sweep)
        except Exception:
            return None, None  # synthesis/timing failed: heuristic fallback

    return _sweep(q, k, v, scale_q, scale_k, scale_v)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale_q: Optional[jax.Array] = None,
    scale_k: Optional[jax.Array] = None,
    scale_v: Optional[jax.Array] = None,
    fused_block_quant: bool = False,
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    window: Optional[Tuple[Optional[int], Optional[int]]] = None,
    q_offset: Optional[jax.Array] = None,
    kv_offset: Optional[jax.Array] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    block_mask: Optional[jax.Array] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    return_residuals: bool = False,
    interpret: Optional[bool] = None,
):
    """Fused attention forward over (B, H, S, D) tensors.

    Args:
      q: (B, Hq, Sq, D); bf16/fp16, fp8 e4m3, or int8 (with scales).
      k: (B, Hkv, Skv, D); same dtype family as q. Hq % Hkv == 0 (GQA).
      v: (B, Hkv, Skv, D); bf16/fp16 (reference dtype rule nn.py:83-105) or
        fp8 e4m3.
      scale_q/scale_k: dequantization scales; (B, H) = head-wise or
        (B, H, S) = token-wise (reference nn.py:410-418). Both or neither.
      is_causal: lower-triangular masking.
      sm_scale: softmax scale; defaults to 1/sqrt(D).
      window: optional (left, right) sliding-window extents.
      q_offset/kv_offset: optional int32 scalars giving the global position
        of row/col 0 — used by ring/sequence-parallel attention to keep
        causal masks correct as KV blocks rotate between chips.
      return_residuals: also return lane-replicated online-softmax stats
        (m, l), each (B, Hq, Sq, 128) fp32, for cross-device merging.

    Returns:
      out with q's (B, Hq, Sq, D) shape in v's float dtype
      (and (m, l) when return_residuals).
    """
    batch, num_q_heads, q_len, head_dim = q.shape
    _, num_kv_heads, kv_len, _ = k.shape
    if num_q_heads % num_kv_heads != 0:
        raise ValueError("num_q_heads must be divisible by num_kv_heads")
    group = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    if interpret is None:
        interpret = checks.resolve_interpret(config.interpret)

    # Scaling granularity from scale shapes.
    if (scale_q is None) != (scale_k is None):
        raise ValueError("scale_q and scale_k must be given together")
    if fused_block_quant:
        if scale_q is not None:
            raise ValueError(
                "fused_block_quant quantizes in-kernel; do not pass scales"
            )
        if checks.is_8bit_dtype(q.dtype) or checks.is_8bit_dtype(k.dtype):
            raise ValueError("fused_block_quant expects float q/k")
        scaling = "block"
    elif scale_q is None:
        scaling = "none"
    elif scale_q.ndim == 2:
        scaling = "head"
    elif scale_q.ndim == 3:
        scaling = "token"
    else:
        raise ValueError(f"bad scale rank: {scale_q.ndim}")

    use_int8_dot = (
        q.dtype == jnp.int8
        and k.dtype == jnp.int8
        and scaling != "none"
        and config.attention.enable_int8_qk
    )
    # Generation-gated fp8-native matmul path (reference fp8 WGMMA,
    # tk/attention.py:233; gate mirror of checks.py:61-64).
    fp8_native = checks.fp8_dot_enabled()
    use_fp8_dot = (
        checks.is_fp8_dtype(q.dtype)
        and checks.is_fp8_dtype(k.dtype)
        and scaling != "none"
        and fp8_native
    )
    block_qdtype = (
        jnp.float8_e4m3fn if (scaling == "block" and fp8_native) else jnp.int8
    )
    if q.dtype == jnp.int8 and scaling == "none":
        raise ValueError("int8 q/k require scales")
    use_int8_pv = v.dtype == jnp.int8 and scale_v is not None
    if v.dtype == jnp.int8 and scale_v is None:
        raise ValueError("int8 v requires per-channel scale_v (B, Hkv, D)")
    if scale_v is not None and scale_v.shape != (
        v.shape[0], v.shape[1], v.shape[3],
    ):
        raise ValueError(
            f"scale_v must be (B, Hkv, D), got {scale_v.shape}"
        )

    bq = block_q or config.kernel.block_q
    bkv = block_kv or config.kernel.block_kv
    if (
        bq is None and bkv is None and config.kernel.autotune
        and not interpret and block_mask is None
    ):
        bq, bkv = _autotuned_blocks(
            q, k, v, scale_q, scale_k, scale_v, is_causal, sm_scale, window,
            fused_block_quant,
        )
    if bq is None or bkv is None:
        hq, hkv = _heuristic_blocks(q_len, kv_len, head_dim)
        bq = bq or hq
        bkv = bkv or hkv
    if block_mask is not None:
        # Kernel blocks must be granule multiples, but ANY multiple works:
        # the mask block's sublane dim (bq/G) equals its array dim, which
        # satisfies Mosaic's sublane rule outright.  Smaller blocks give
        # the whole-block skip finer resolution on structured masks —
        # a (1024, 2048) block only skips when all 128 of its granules are
        # masked, which a fine-grained mask essentially never is.
        if not (block_kv or config.kernel.block_kv):
            # Measured v5e (documents mask, S=8192): bkv=1024 beats 2048
            # (2.24x vs 1.80x vs dense) — finer skip resolution outweighs
            # the per-step cost; 512 loses it again.
            bkv = min(bkv, 1024)
        bq = round_up(min(bq, max(q_len, MASK_GRANULE)), MASK_GRANULE)
        bkv = round_up(min(bkv, max(kv_len, MASK_GRANULE)), MASK_GRANULE)

    # Fold sm_scale (and the exp2-domain log2(e)) into q ahead of the kernel:
    # one elementwise pass over Q in HBM (XLA fuses it with the producer)
    # instead of a pass over every (block_q, block_kv) score tile per KV step.
    # Measured +17 TFLOP/s on v5e. Only for float q without dequant scales —
    # quantized paths keep the scalar fold in-kernel (it rides the int32->
    # fp32 conversion of the QK product).
    prescaled = scaling == "none" and not checks.is_8bit_dtype(q.dtype)
    if prescaled:
        base = sm_scale * (LOG2E if config.kernel.use_exp2 else 1.0)
        q = q * jnp.asarray(base, q.dtype)

    # Pad sequence dims to block multiples (zero padding keeps the PV matmul
    # NaN-free; padded KV columns are masked, padded Q rows are sliced off).
    q_len_p = round_up(q_len, bq)
    kv_len_p = round_up(kv_len, bkv)

    def _pad_seq(t, target):
        if t is None or t.shape[2] == target:
            return t
        pad = [(0, 0), (0, 0), (0, target - t.shape[2]), (0, 0)][: t.ndim]
        return jnp.pad(t, pad)

    qp = _pad_seq(q, q_len_p)
    kp = _pad_seq(k, kv_len_p)
    vp = _pad_seq(v, kv_len_p)
    sqp = _pad_seq(scale_q, q_len_p) if scaling == "token" else scale_q
    skp = _pad_seq(scale_k, kv_len_p) if scaling == "token" else scale_k

    has_offsets = q_offset is not None or kv_offset is not None
    grid = (batch, num_q_heads, q_len_p // bq, kv_len_p // bkv)

    in_specs = []
    args = []
    if has_offsets:
        zero = jnp.zeros((1,), jnp.int32)
        q_off = zero if q_offset is None else jnp.asarray(
            q_offset, jnp.int32
        ).reshape(1)
        kv_off = zero if kv_offset is None else jnp.asarray(
            kv_offset, jnp.int32
        ).reshape(1)
        off_spec = pl.BlockSpec(
            (1,), lambda b, h, i, j, *_: (0,), memory_space=pltpu.SMEM
        )
        in_specs += [off_spec, off_spec]
        args += [q_off, kv_off]
    if block_mask is not None:
        if has_offsets:
            raise ValueError(
                "block_mask with ring position offsets is not supported"
            )
        g = MASK_GRANULE
        nq_g, nkv_g = q_len_p // g, kv_len_p // g
        expected = (-(-q_len // g), -(-kv_len // g))
        bm = jnp.asarray(block_mask).astype(jnp.int32)
        if bm.shape != expected:
            raise ValueError(
                f"block_mask must be (ceil(Sq/{g}), ceil(Skv/{g})) = "
                f"{expected}, got {bm.shape}"
            )
        bm = jnp.pad(
            bm,
            [(0, nq_g - bm.shape[0]), (0, nkv_g - bm.shape[1])],
        )
        # Per-kernel-block OR-reduction drives the whole-block skip (SMEM,
        # scalar-indexed); the granule bitmap itself feeds the in-kernel
        # element expansion.
        nqB, nkvB = q_len_p // bq, kv_len_p // bkv
        nqb = bq // g
        block_any = bm.reshape(nqB, nqb, nkvB, bkv // g).max(axis=(1, 3))
        # Lane-pre-expanded granule mask, block-indexed by (i, j_pos): int8
        # (nqB, nkvB, bq/G, bkv).  ~bkv bytes per Q row of extra DMA
        # (<2% of a K block) buys the kernel a matmul-free element mask.
        mask_lane = jnp.repeat(bm.astype(jnp.int8), g, axis=1)
        mask4 = mask_lane.reshape(nqB, nqb, nkvB, bkv).transpose(0, 2, 1, 3)
        try:
            ba_np = np.asarray(block_any) > 0
        except jax.errors.TracerArrayConversionError:
            ba_np = None
        if ba_np is not None:
            # COMPACT grid (mask concrete at trace time — the usual case):
            # the last grid dim enumerates only active blocks per Q row via
            # jmap[i, s]; skipped steps do not exist, so wall-clock scales
            # with density instead of paying ~1.4us per predicated-off step
            # (measured v5e; full-grid skip left documents at 2.3x where
            # compute alone predicts ~6x).  Causal/ragged-inactive blocks
            # are compacted away too.
            act = ba_np.copy()
            ii = np.arange(nqB)[:, None]
            jj = np.arange(nkvB)[None, :]
            if is_causal:
                act &= (jj * bkv) <= (ii * bq + bq - 1)
            act &= (jj * bkv) < kv_len
            cnt = act.sum(axis=1).astype(np.int32)
            max_cnt = max(1, int(cnt.max()))
            jmap = np.zeros((nqB, max_cnt), np.int32)
            for r in range(nqB):
                idxs = np.flatnonzero(act[r])
                if idxs.size:
                    jmap[r, : idxs.size] = idxs
                    # Trailing slots repeat the last active block: their
                    # K/V DMAs are elided and the body is skipped.
                    jmap[r, idxs.size:] = idxs[-1]
            compact_mask = True
            fetch_table = jnp.asarray(jmap)
            smem_arg = jnp.asarray(cnt)
            grid = grid[:3] + (max_cnt,)
        else:
            # FULL grid fallback (mask is a traced value): predicated skip
            # via block_any; ft[i, j] = last active block <= j so skipped
            # steps re-reference the resident block and Mosaic elides
            # their DMAs (splash-attention data-next pattern).
            compact_mask = False
            jidx = jnp.broadcast_to(
                jnp.arange(nkvB, dtype=jnp.int32)[None, :], (nqB, nkvB)
            )
            fetch_table = jnp.maximum(
                jax.lax.cummax(jnp.where(block_any > 0, jidx, -1), axis=1),
                0,
            ).astype(jnp.int32)
            smem_arg = block_any.astype(jnp.int32)
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, nqb, bkv), lambda b, h, i, j, ft: (i, ft[i, j], 0, 0)
            ),
        ]
        args += [smem_arg, mask4]
    else:
        fetch_table = None
        compact_mask = False
    # KV-indexed blocks must follow the prefetched block table when a mask
    # is present (under the compact grid the last grid dim enumerates table
    # slots, not block positions).
    if block_mask is not None:
        def kv_pos_idx(mk):
            return lambda b, h, i, j, ft: mk(b, ft[i, j])
    else:
        def kv_pos_idx(mk):
            return lambda b, h, i, j, *_: mk(b, j)

    if scaling == "head":
        smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        in_specs += [smem_spec, smem_spec]
        args += [scale_q.astype(jnp.float32), scale_k.astype(jnp.float32)]
    elif scaling == "token":
        # Mosaic requires block dim -2 to be 8-divisible or equal to the
        # array dim, so the scale block covers all heads (tiny: H*block*4B).
        in_specs += [
            pl.BlockSpec((1, num_q_heads, bq), lambda b, h, i, j, *_: (b, 0, i)),
            pl.BlockSpec(
                (1, num_kv_heads, bkv), kv_pos_idx(lambda b, j: (b, 0, j))
            ),
        ]
        args += [sqp.astype(jnp.float32), skp.astype(jnp.float32)]
    if use_int8_pv:
        in_specs += [
            pl.BlockSpec(
                (1, num_kv_heads, head_dim), lambda b, h, i, j, *_: (b, 0, 0)
            )
        ]
        args += [scale_v.astype(jnp.float32)]
    has_segments = q_segment_ids is not None or kv_segment_ids is not None
    if has_segments:
        if q_segment_ids is None or kv_segment_ids is None:
            raise ValueError("both q/kv segment ids must be provided")
        if q_segment_ids.shape != (batch, q_len) or kv_segment_ids.shape != (
            batch, kv_len,
        ):
            raise ValueError(
                "segment ids must be (B, Sq) / (B, Skv), got "
                f"{q_segment_ids.shape} / {kv_segment_ids.shape}"
            )
        # Pad with -1 (matches no real segment) then replicate into the
        # Mosaic-friendly layouts: q ids over lanes, kv ids over sublanes.
        qseg = jnp.pad(
            q_segment_ids.astype(jnp.int32),
            [(0, 0), (0, q_len_p - q_len)],
            constant_values=-1,
        )
        kvseg = jnp.pad(
            kv_segment_ids.astype(jnp.int32),
            [(0, 0), (0, kv_len_p - kv_len)],
            constant_values=-1,
        )
        qseg = jnp.broadcast_to(qseg[:, :, None], (batch, q_len_p, NUM_LANES))
        kvseg = jnp.broadcast_to(kvseg[:, None, :], (batch, 8, kv_len_p))
        in_specs += [
            pl.BlockSpec((1, bq, NUM_LANES), lambda b, h, i, j, *_: (b, i, 0)),
            pl.BlockSpec((1, 8, bkv), kv_pos_idx(lambda b, j: (b, 0, j))),
        ]
        args += [qseg, kvseg]
    # Per-block path only: cache quantized K (8-bit) and V in VMEM scratch
    # across Q-block rows, so each is fetched from HBM exactly once per
    # (batch, head) and K is quantized exactly once.  Measured on v5e this
    # helps only here — the raw bf16/int8 paths' HBM streams were already
    # fully pipelined by Mosaic, and routing them through the cache cost
    # 3-5 TFLOP/s — so the raw paths keep their plain block specs.
    #
    # Long-context degradation ladder: when K+V no longer fit the scoped
    # budget together, keep the quantized K cache (the part that also saves
    # requantization work) and stream V fresh from HBM; past the K-only
    # budget fall back to plain streaming.  This keeps the fastest/most-
    # accurate quantized path alive at 32K-256K contexts instead of
    # silently degrading at 16 MiB.
    k_cache_dtype = block_qdtype
    _k_bytes = kv_len_p * head_dim  # 8-bit container
    _kv_bytes = _k_bytes * (1 + v.dtype.itemsize)
    _cacheable = (
        scaling == "block"
        and not has_offsets
        and window is None
        and not return_residuals
        # A mask-skipped (i, j) block would skip the K-cache fill its later
        # Q rows rely on, so the cache is incompatible with sparsity.
        and block_mask is None
    )
    v_cached = _cacheable and _kv_bytes <= KV_CACHE_BUDGET_BYTES
    k_cached = v_cached or (_cacheable and _k_bytes <= K_CACHE_BUDGET_BYTES)

    if block_mask is not None:
        # Mask-skipped steps re-reference the last fetched (mask-active)
        # block via the scalar-prefetched table, so Mosaic elides their
        # DMAs; under causal masking the diagonal clamp composes on top.
        if is_causal:
            def kv_index(b, h, i, j, ft):
                jmax = jax.lax.div(i * bq + (bq - 1), bkv)
                return (b, h // group, jnp.minimum(ft[i, j], jmax), 0)
        else:
            def kv_index(b, h, i, j, ft):
                return (b, h // group, ft[i, j], 0)
    elif is_causal and not has_offsets:
        # Clamp the KV block index at the diagonal: skipped above-diagonal
        # steps re-reference the block already in VMEM, so Mosaic elides
        # their DMA — halving causal KV traffic (the fetch-side analogue of
        # the reference's two-stage causal decomposition).
        def kv_index(b, h, i, j, *_):
            jmax = jax.lax.div(i * bq + (bq - 1), bkv)
            return (b, h // group, jnp.minimum(j, jmax), 0)
    else:
        def kv_index(b, h, i, j, *_):
            return (b, h // group, j, 0)

    if k_cached:
        # K/V only need their fresh fetch on the fill step (the first Q row
        # that touches block j); every other step maps to a constant block
        # index, which Mosaic recognizes as unchanged and skips the DMA.
        if is_causal:
            def k_index(b, h, i, j, *_):
                first_i = jax.lax.div(j * bkv, bq)
                return (b, h // group, jnp.where(i == first_i, j, 0), 0)
        else:
            def k_index(b, h, i, j, *_):
                return (b, h // group, jnp.where(i == 0, j, 0), 0)
        v_index = k_index if v_cached else kv_index
    else:
        k_index = kv_index
        v_index = kv_index

    in_specs += [
        pl.BlockSpec((1, 1, bq, head_dim), lambda b, h, i, j, *_: (b, h, i, 0)),
        pl.BlockSpec((1, 1, bkv, head_dim), k_index),
        pl.BlockSpec((1, 1, bkv, head_dim), v_index),
    ]
    args += [qp, kp, vp]

    out_dtype = v.dtype if v.dtype != jnp.float8_e4m3fn else jnp.bfloat16
    if checks.is_8bit_dtype(out_dtype):
        out_dtype = jnp.bfloat16
    out_shapes = [
        jax.ShapeDtypeStruct((batch, num_q_heads, q_len_p, head_dim), out_dtype)
    ]
    out_specs = [
        pl.BlockSpec((1, 1, bq, head_dim), lambda b, h, i, j, *_: (b, h, i, 0))
    ]
    if return_residuals:
        res_shape = jax.ShapeDtypeStruct(
            (batch, num_q_heads, q_len_p, NUM_LANES), jnp.float32
        )
        res_spec = pl.BlockSpec(
            (1, 1, bq, NUM_LANES), lambda b, h, i, j, *_: (b, h, i, 0)
        )
        out_shapes += [res_shape, res_shape]
        out_specs += [res_spec, res_spec]

    kernel = functools.partial(
        _flash_kernel,
        has_offsets=has_offsets,
        has_segments=has_segments,
        scaling=scaling,
        causal=is_causal,
        window=window,
        sm_scale=float(sm_scale),
        kv_valid=kv_len,
        kv_len_padded=kv_len_p,
        block_q=bq,
        block_kv=bkv,
        use_exp2=config.kernel.use_exp2,
        softmax_bf16=config.kernel.softmax_bf16,
        return_residuals=return_residuals,
        use_int8_dot=use_int8_dot,
        use_int8_pv=use_int8_pv,
        use_fp8_dot=use_fp8_dot,
        fast_accum=config.use_fast_accum,
        gqa_group=group,
        prescaled=prescaled,
        k_cached=k_cached,
        v_cached=v_cached,
        has_block_mask=block_mask is not None,
        compact=compact_mask,
        block_qdtype=block_qdtype,
        # Two-stage split only when causal masking is the ONLY mask source
        # (window/segments/block-mask/ragged tails keep the single-arm
        # path, whose mask handles them all) AND the kernel runs the
        # per-block VMEM-K-cache path.  Measured v5e @ B16/H16/S8192/D128
        # (benchmarks/exp_causal_twostage.py + exp_causal_blocks.py):
        # per-block 110.3 -> 117.6 TFLOP/s (+6.6%, best over 6 block
        # configs), but bf16 REGRESSES 108.5 -> 99.8 at every block size —
        # with K/V streaming fresh from HBM each Q row the predicated
        # regions cost more than the skipped mask passes, while the
        # VMEM-resident K cache decouples the DMA stream and lets the
        # mask-free arm win.
        causal_two_stage=(
            bool(config.kernel.causal_two_stage)
            and is_causal
            and scaling == "block"
            and window is None
            and not has_segments
            and block_mask is None
            and kv_len == kv_len_p
        ),
        # FAST_SOFTMAX (reference attention.py:419-425,859): one KV block
        # covers the whole row — single-pass softmax specialization.
        single_kv_block=(kv_len_p == bkv and block_mask is None),
    )

    # FLOP estimate for XLA's latency-hiding scheduler.
    flops = 4 * batch * num_q_heads * q_len_p * kv_len_p * head_dim
    if is_causal:
        flops //= 2

    scratch_shapes = (
        [
            pltpu.VMEM((bq, NUM_LANES), jnp.float32),
            pltpu.VMEM((bq, NUM_LANES), jnp.float32),
            pltpu.VMEM((bq, head_dim), jnp.float32),
        ]
        + (
            [
                pltpu.VMEM((bq, head_dim), block_qdtype),
                pltpu.SMEM((1,), jnp.float32),
            ]
            if scaling == "block"
            else []
        )
        + (
            [pltpu.VMEM((kv_len_p, head_dim), k_cache_dtype)]
            + (
                [pltpu.SMEM((kv_len_p // bkv,), jnp.float32)]
                if scaling == "block"
                else []
            )
            + (
                [pltpu.VMEM((kv_len_p, head_dim), v.dtype)]
                if v_cached
                else []
            )
            if k_cached
            else []
        )
    )
    common = dict(
        compiler_params=pltpu.CompilerParams(
            # The K-cache fill depends on Q-row order within a (b, h), so
            # the i dim must stay sequential in that mode.
            dimension_semantics=(
                ("parallel", "parallel", "arbitrary", "arbitrary")
                if k_cached
                else ("parallel", "parallel", "parallel", "arbitrary")
            ),
            vmem_limit_bytes=_vmem_limit_bytes(),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=sum(t.size * t.dtype.itemsize for t in (qp, kp, vp)),
            transcendentals=batch * num_q_heads * q_len_p * kv_len_p,
        ),
        interpret=interpret,
    )
    if block_mask is not None:
        # Scalar-prefetched grid: the KV fetch table rides in SMEM ahead of
        # the pipeline so the K/V index maps can consult it (DMA elision
        # for mask-skipped blocks).
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        outs = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shapes, **common
        )(fetch_table, *args)
    else:
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=scratch_shapes,
            **common,
        )(*args)

    out = outs[0]
    if q_len_p != q_len:
        out = out[:, :, :q_len, :]
    if return_residuals:
        m, l = outs[1], outs[2]
        if q_len_p != q_len:
            m = m[:, :, :q_len, :]
            l = l[:, :, :q_len, :]
        return out, (m, l)
    return out
