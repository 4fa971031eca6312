"""w8a16 quantized-weight matmul: int8 weights dequantized in VMEM on the
way into the MXU.

The reference has no weight quantization (it is an attention kernel
library — SURVEY.md §0); this kernel serves the repo's serving stack
(``models/quantized``), where 8B-class weights must be stored int8 to fit
one 16 GB chip and decode is weight-bandwidth bound.

Why a kernel at all: XLA does not fuse the ``int8 -> bf16`` weight convert
into its dot.  Measured on v5e (benchmarks/exp_w8a16.py, K=4096 N=14336):

  * decode (M=16):   convert+dot 0.204 ms (291 GB/s of int8 bytes) vs a
    plain bf16 dot at 0.123 ms — the convert costs more than the halved
    weight stream saves;
  * prefill (M=4096): convert+dot 3.0 ms vs bf16 dot 0.44 ms (6.9x) —
    XLA materializes the converted weight matrix through HBM;
  * w8a8 (int8 MXU + dynamic activation quant) does not help either
    (0.203 ms decode / 1.8 ms prefill — the int32->f32 epilogue convert
    eats the 2x MXU rate, same physics as the attention kernels).

Here each grid step DMAs an int8 weight tile into VMEM, converts it
in-register, and feeds the MXU directly — the weight stream is int8 bytes
end to end, so the bandwidth-bound regime runs at the halved-byte roof and
the compute-bound regime never touches HBM with bf16 weights.

Layout contract (matches ``models/quantized.quantize_matrix``):
  x: (M, K) float (bf16 in production; fp32 in tests)
  w: (K, N) int8, per-output-channel symmetric
  scale: (1, N) or (N,) fp32
  out: (M, N) in x.dtype — bitwise the same math as the einsum path
  (convert to x.dtype, fp32 accumulate, fp32 scale, cast back).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config
from ..utils import checks
from ..utils.shapes import round_up


def _qmm_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...].astype(x_ref.dtype)  # int8 tile -> compute dtype, in VMEM
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _store():
        o_ref[...] = (
            acc_ref[...] * s_ref[...].astype(jnp.float32)
        ).astype(o_ref.dtype)


def _qmm_kernel_ms(*refs, n_k_s: int, n_streams: int):
    """Multi-stream variant: ``n_streams`` disjoint k-range weight inputs
    per grid step.  A single weight stream bottoms out at the ~293 GB/s
    single-stream DMA floor regardless of layout (CLAUDE.md op-cost
    model); concurrent streams aggregate toward ~440-500 GB/s — the
    decode-regime lever for one-big-matmul calls like the LM head."""
    xs = refs[:n_streams]
    ws = refs[n_streams : 2 * n_streams]
    s_ref, o_ref, acc_ref = refs[2 * n_streams : 2 * n_streams + 3]
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for t in range(n_streams):
        acc_ref[...] += jax.lax.dot_general(
            xs[t][...], ws[t][...].astype(xs[t].dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == n_k_s - 1)
    def _store():
        o_ref[...] = (
            acc_ref[...] * s_ref[...].astype(jnp.float32)
        ).astype(o_ref.dtype)


def dequant4_tile(packed: jax.Array, scales: jax.Array, dt) -> jax.Array:
    """In-VMEM w4a16 tile dequant: (R/2, C) packed int8 + (R/128, C) fp32
    group scales -> (R, C) ``dt``.

    Layout matches ``models/quantized.pack_int4_rows``: rows pair
    split-halves within 256-row blocks, so every 128-packed-row group
    unpacks to its 256 original rows in order; scale groups are 128 rows.
    All reshapes move the SUBLANE axis only (Mosaic-cheap); the scale
    multiply folds into the unpack pass, so the dot needs no epilogue
    scale (unlike the int8 kernel's per-channel output scale)."""
    r2, c = packed.shape
    g = packed.astype(jnp.int32).reshape(r2 // 128, 128, c)
    lo = (g << 28) >> 28
    hi = g >> 4  # byte sign == high-nibble sign
    w = jnp.concatenate([lo, hi], axis=1)  # (r2/128, 256, c), rows in order
    w = w.reshape(r2 // 64, 128, c).astype(jnp.float32) * scales[:, None, :]
    return w.reshape(2 * r2, c).astype(dt)


def _qmm4_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = dequant4_tile(w_ref[...], s_ref[...], x_ref.dtype)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _pick_block(dim: int, candidates) -> Optional[int]:
    for c in candidates:
        if dim % c == 0:
            return c
    return None


#: Weight-tile byte budget: tiles double-buffer under the 64 MiB scoped
#: VMEM limit next to the fp32 accumulator and the activation block.
_TILE_BUDGET = 16 * 1024 * 1024
_VMEM_BUDGET = 48 * 1024 * 1024


def _auto_blocks(m_blocks: int, block_m: int, k_dim: int, n: int):
    """(block_k, block_n) for the auto path.

    Decode regime (ONE row-block, so weights stream exactly once): make
    the tile FULL-WIDTH — a (bk, bn) tile of a row-major (K, N) int8
    matrix with bn < N is a strided DMA (bn-byte chunks, N-byte stride),
    measured at 291 GB/s = the no-compute floor over the same blocks
    (benchmarks/qmm_floor_probe.py: the convert is free, the DMA is the
    wall); bn = N makes every k-step one contiguous slab.

    Prefill regime (several row-blocks): full-width tiles would re-stream
    the whole matrix once per row-block — use square-ish tiles instead;
    that path is MXU-bound (~144 TFLOP/s measured), not DMA-bound.
    """
    if m_blocks == 1 and n % 128 == 0:
        acc_bytes = block_m * n * 4
        tile_cap = min(_TILE_BUDGET, (_VMEM_BUDGET - acc_bytes) // 2)
        bk = min(k_dim, (tile_cap // n) // 128 * 128)
        while bk >= 128 and k_dim % bk:
            bk -= 128
        if bk >= 128:
            return bk, n
    return (
        _pick_block(k_dim, (2048, 1024, 512, 256, 128)),
        _pick_block(n, (512, 256, 128)),
    )


def supported(x: jax.Array, w: jax.Array) -> bool:
    """Trace-time gate for the kernel path (shape tiling + dtype)."""
    if x.ndim != 2 or w.ndim != 2 or w.dtype != jnp.int8:
        return False
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    m, k = x.shape
    k2, n = w.shape
    # 128-multiples guarantee a legal tiling on both the full-width
    # (decode) and strided (prefill) block schemes.
    return k == k2 and k % 128 == 0 and n % 128 == 0


def quantized_matmul(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    *,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    n_streams: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """``(x @ w.astype(x.dtype)) * scale`` with the convert fused in-VMEM."""
    m, k_dim = x.shape
    k2, n = w.shape
    if k_dim != k2:
        raise ValueError(f"contraction mismatch: x (M,{k_dim}) vs w ({k2},N)")
    scale2 = scale.reshape(1, n).astype(jnp.float32)
    if interpret is None:
        interpret = checks.resolve_interpret(config.interpret)

    # Row tile: fp32 sublane is 8, bf16 is 16; decode batches are tiny
    # (M=16) and prefill flattens B*S (thousands) — cap at 512 rows.
    row_tile = 16 if x.dtype == jnp.bfloat16 else 8
    if block_m is None:
        block_m = min(512, round_up(m, row_tile))
    m_pad = round_up(m, block_m)
    auto_k, auto_n = _auto_blocks(m_pad // block_m, block_m, k_dim, n)
    if block_k is None:
        block_k = auto_k
    if block_n is None:
        block_n = auto_n
    if block_k is None or block_n is None:
        raise ValueError(
            f"K ({k_dim}) and N ({n}) must be multiples of 128 for the "
            "qmm kernel; use the einsum path for other shapes"
        )
    if m_pad != m:
        x = jnp.pad(x, [(0, m_pad - m), (0, 0)])

    n_k = k_dim // block_k
    if n_streams is None:
        # Decode regime (one row block = each weight byte read once): a
        # single weight stream sits at the single-stream DMA floor; TWO
        # k-split streams measured 1.43 -> 1.26 ms (367 -> 418 GB/s) on
        # the LM-head shape (M=96, K=4096, N=128256) and bit-exact; FOUR
        # streams regressed to 363 GB/s (benchmarks/exp_qmm_streams.py).
        # VMEM guard: 2x the double-buffered tiles must still fit next to
        # the accumulator (the full-width path's N-wide tiles at small M
        # measured 78.8M scoped = compile failure without it).
        scoped = (
            2 * 2 * (block_k * block_n + block_m * block_k * x.dtype.itemsize)
            + block_m * block_n * 4
            + 2 * block_m * block_n * x.dtype.itemsize
        )
        n_streams = (
            2
            if (
                m_pad // block_m == 1
                and n_k % 2 == 0
                and scoped <= 56 * 1024 * 1024
            )
            else 1
        )
    common = dict(
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=(
                64 * 1024 * 1024 if checks.tpu_generation() >= 5 else None
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k_dim * n,
            bytes_accessed=(
                m_pad * k_dim * x.dtype.itemsize + k_dim * n + m_pad * n * 2
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )
    if n_streams > 1 and n_k % n_streams == 0:
        n_k_s = n_k // n_streams
        in_specs = [
            pl.BlockSpec(
                (block_m, block_k),
                (lambda t: lambda i, j, k: (i, k + t * n_k_s))(t),
            )
            for t in range(n_streams)
        ] + [
            pl.BlockSpec(
                (block_k, block_n),
                (lambda t: lambda i, j, k: (k + t * n_k_s, j))(t),
            )
            for t in range(n_streams)
        ] + [pl.BlockSpec((1, block_n), lambda i, j, k: (0, j))]
        out = pl.pallas_call(
            functools.partial(
                _qmm_kernel_ms, n_k_s=n_k_s, n_streams=n_streams
            ),
            grid=(m_pad // block_m, n // block_n, n_k_s),
            in_specs=in_specs,
            **common,
        )(*([x] * n_streams + [w] * n_streams + [scale2]))
        return out[:m, :] if m_pad != m else out

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, n_k=n_k),
        grid=(m_pad // block_m, n // block_n, n_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
        ],
        **common,
    )(x, w, scale2)
    return out[:m, :] if m_pad != m else out


def supported4(x: jax.Array, w4: jax.Array) -> bool:
    """Trace-time gate for the w4a16 kernel path."""
    if x.ndim != 2 or w4.ndim != 2 or w4.dtype != jnp.int8:
        return False
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    k = 2 * w4.shape[0]
    # 256-multiples keep every k-tile whole packing blocks; the n rule
    # matches the int8 kernel.
    return x.shape[1] == k and k % 256 == 0 and w4.shape[1] % 128 == 0


def quantized_matmul4(
    x: jax.Array,
    w4: jax.Array,
    scale: jax.Array,
    *,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """``x @ dequantize_int4({"q4": w4, "s": scale})`` with the unpack +
    group-scale fused in-VMEM (see models/quantized for the layout).
    Same regimes as the int8 kernel; weight tiles carry HALF the bytes."""
    m, k_dim = x.shape
    k2, n = w4.shape
    if k_dim != 2 * k2:
        raise ValueError(
            f"contraction mismatch: x (M,{k_dim}) vs packed w ({k2}*2,N)"
        )
    if scale.shape != (k_dim // 128, n):
        raise ValueError(
            f"scale shape {scale.shape} != ({k_dim // 128}, {n})"
        )
    if interpret is None:
        interpret = checks.resolve_interpret(config.interpret)

    row_tile = 16 if x.dtype == jnp.bfloat16 else 8
    if block_m is None:
        block_m = min(512, round_up(m, row_tile))
    m_pad = round_up(m, block_m)
    if block_k is None or block_n is None:
        if m_pad // block_m == 1 and n % 128 == 0:
            # Decode regime: full-width tiles, k block from the byte
            # budget (packed bytes = bk/2 per column).
            acc_bytes = block_m * n * 4
            tile_cap = min(_TILE_BUDGET, (_VMEM_BUDGET - acc_bytes) // 2)
            bk = min(k_dim, (2 * tile_cap // n) // 256 * 256)
            while bk >= 256 and k_dim % bk:
                bk -= 256
            if bk >= 256:
                block_k = block_k or bk
                block_n = block_n or n
        if block_k is None:
            block_k = _pick_block(k_dim, (2048, 1024, 512, 256))
        if block_n is None:
            block_n = _pick_block(n, (512, 256, 128))
    if block_k is None or block_n is None or block_k % 256:
        raise ValueError(
            f"K ({k_dim}) needs a 256-multiple block and N ({n}) a "
            "128-multiple block for the w4a16 kernel"
        )
    if m_pad != m:
        x = jnp.pad(x, [(0, m_pad - m), (0, 0)])

    n_k = k_dim // block_k
    grid = (m_pad // block_m, n // block_n, n_k)

    out = pl.pallas_call(
        functools.partial(_qmm4_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k // 2, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((block_k // 128, block_n), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=(
                64 * 1024 * 1024 if checks.tpu_generation() >= 5 else None
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k_dim * n,
            bytes_accessed=(
                m_pad * k_dim * x.dtype.itemsize + k_dim * n // 2
                + m_pad * n * 2
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w4, scale.astype(jnp.float32))
    return out[:m, :] if m_pad != m else out
