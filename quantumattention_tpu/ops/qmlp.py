"""Fused w8a16 decoder-layer tail: output projection + residual +
RMSNorm + SwiGLU MLP + residual in ONE Pallas call.

The reference has no model/serving layer (it is an attention kernel
library — SURVEY.md §0); this kernel serves the repo's single-chip decode
engine, where the measured op-cost model (benchmarks/op_overhead_probe.py,
docs/ARCHITECTURE.md) says a whole-model decode step is op-COUNT-bound
before it is byte-bound: every pallas_call costs ~0.10 ms fixed on this
runtime, and XLA-native ops stream int8 weights at only ~300 GB/s.  A
Llama-3-8B decode step runs 32 layer tails; fusing each tail's
  wo-projection (XLA) + residual + rms_norm + gate/up qmm (pallas)
  + silu/mul + down qmm (pallas) + residual
into one kernel removes one ~0.1 ms pallas call and ~0.13 ms of XLA
convert+dot work per layer, and streams all three weight matrices
(16 + 117 + 58 MB at 8B shapes) at the ~810 GB/s marginal DMA rate of a
single call.

Decode-regime only (a handful of activation rows): the fp32 output
accumulator is (M, E) VMEM scratch, so M is capped — prefill keeps the
two-call qmm path, which is MXU-bound there anyway.

Numerics match the unfused path (models/llama.mlp_block over a
quantized.fuse_projections tree) step for step: fp32 matmul accumulation,
fp32 scale then cast to the activation dtype, silu computed in fp32 on the
bf16-rounded gate, bf16 residual adds.  Differential tests:
tests/test_qmlp.py.

Layout contract (matches models/quantized.fuse_projections):
  x:         (M, E)  activation-dtype residual stream
  attn_out:  (M, Q)  pre-projection attention output (optional)
  wo:        {"q": (Q, E) int8, "s": (1, E) f32}   (with attn_out)
  norm_w:    (E,) f32 RMSNorm weight
  w_gate_up: {"q": (E, 2I) int8, "s": (1, 2I) f32}  [gate | up]
  w_down:    {"q": (I, E) int8, "s": (1, E) f32}
  out:       (M, E) = x' + down(silu(gate(h)) * up(h)),
             x' = x (+ attn_out @ wo * s_o), h = rms_norm(x', norm_w)
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config
from ..utils import checks
from ..utils.shapes import round_up

#: Total scoped-VMEM budget for the kernel: the 64 MiB Mosaic limit minus
#: headroom for Mosaic's own stack allocations (the double-buffered weight
#: tiles, the resident wo matrix, activations, and the fp32 accumulator
#: must all fit — measured: 64.95 M requested at 8B shapes when the picker
#: ignored the residents).
_VMEM_BUDGET = 60 * 1024 * 1024
#: Largest wo matrix kept VMEM-resident (fetched once at j == 0; bigger
#: output projections fall back to the unfused XLA path).
_WO_BUDGET = 32 * 1024 * 1024
#: Decode-regime row cap: the fp32 (M, E) accumulator must stay a small
#: fraction of VMEM (256 rows x 8192 cols x 4 B = 8 MiB at 70B widths).
_MAX_ROWS = 256


def _tail_kernel(
    *refs,
    has_wo: bool,
    n_j: int,
    eps: float,
):
    if has_wo:
        (x_ref, attn_ref, wo_ref, wos_ref, norm_ref,
         wg_ref, wu_ref, gs_ref, us_ref, wd_ref, ds_ref,
         o_ref, x1_s, h_s, acc) = refs
    else:
        (x_ref, norm_ref,
         wg_ref, wu_ref, gs_ref, us_ref, wd_ref, ds_ref,
         o_ref, x1_s, h_s, acc) = refs
        attn_ref = wo_ref = wos_ref = None
    j = pl.program_id(0)
    dt = x_ref.dtype

    @pl.when(j == 0)
    def _head():
        if has_wo:
            proj = jax.lax.dot_general(
                attn_ref[...], wo_ref[...].astype(dt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            x1 = x_ref[...] + (
                proj * wos_ref[...].astype(jnp.float32)
            ).astype(dt)
        else:
            x1 = x_ref[...]
        x1_s[...] = x1
        xf = x1.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        h_s[...] = (
            xf * jax.lax.rsqrt(var + eps) * norm_ref[...].astype(jnp.float32)
        ).astype(dt)
        acc[...] = jnp.zeros_like(acc)

    h = h_s[...]
    gate = (
        jax.lax.dot_general(
            h, wg_ref[...].astype(dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * gs_ref[...].astype(jnp.float32)
    ).astype(dt)
    up = (
        jax.lax.dot_general(
            h, wu_ref[...].astype(dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * us_ref[...].astype(jnp.float32)
    ).astype(dt)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(dt) * up
    acc[...] += jax.lax.dot_general(
        act, wd_ref[...].astype(dt),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_j - 1)
    def _store():
        o_ref[...] = x1_s[...] + (
            acc[...] * ds_ref[...].astype(jnp.float32)
        ).astype(dt)


def _resident_bytes(m_pad: int, e_dim: int, q_dim: int, itemsize: int) -> int:
    """VMEM held for the kernel's whole lifetime: the wo matrix (+ scale),
    x/attn_out/out blocks, x1/h scratch, the fp32 accumulator, and the
    broadcast scale/norm rows."""
    wo = q_dim * e_dim + 4 * e_dim if q_dim else 0
    acts = m_pad * (5 * e_dim + q_dim) * itemsize  # x, out, x1, h (+attn)
    return wo + acts + m_pad * e_dim * 4 + 3 * 4 * e_dim


def _pick_block_i(
    inter: int, e_dim: int, resident: int = 0
) -> Optional[int]:
    """Largest 128-multiple divisor of the intermediate dim whose
    double-buffered gate+up+down tile stream fits the VMEM budget next to
    the kernel's resident buffers."""
    budget = _VMEM_BUDGET - resident
    for bi in (4096, 2048, 1024, 512, 256, 128):
        if inter % bi == 0 and 6 * e_dim * bi <= budget:
            return bi
    return None


def _is_q(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def tail_supported(cfg, layer, x: jax.Array) -> bool:
    """Trace-time routing gate for the fused tail (models/llama._layer_tail).

    True only in the decode regime (few activation rows), on a
    fuse_projections'd w8a16 tree, with kernel-legal shapes, when the
    ``kernel.qmlp`` flag allows it.  ``"force"`` routes even in interpret
    mode (CPU differential tests); plain True is compiled-TPU only, like
    the qmm auto gate.
    """
    flag = config.kernel.qmlp
    if not flag:
        return False
    if flag != "force" and checks.resolve_interpret(config.interpret):
        return False
    if getattr(cfg, "num_experts", 0) > 0:
        return False
    if not all(
        k in layer and _is_q(layer[k]) for k in ("w_gate_up", "w_down", "wo")
    ):
        return False
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if rows > _MAX_ROWS:
        return False
    e_dim = x.shape[-1]
    q_dim, e2 = layer["wo"]["q"].shape
    e3, i2 = layer["w_gate_up"]["q"].shape
    inter, e4 = layer["w_down"]["q"].shape
    if not (e_dim == e2 == e3 == e4 and i2 == 2 * inter):
        return False
    if e_dim % 128 or inter % 128 or q_dim % 128:
        return False
    if q_dim * e_dim > _WO_BUDGET:
        return False
    resident = _resident_bytes(
        round_up(rows, 16), e_dim, q_dim, x.dtype.itemsize
    )
    return _pick_block_i(inter, e_dim, resident) is not None


def fused_layer_tail(
    x: jax.Array,
    norm_w: jax.Array,
    w_gate_up: dict,
    w_down: dict,
    *,
    eps: float,
    attn_out: Optional[jax.Array] = None,
    wo: Optional[dict] = None,
    block_i: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """One-call decoder-layer tail (see module docstring for the math)."""
    if (attn_out is None) != (wo is None):
        raise ValueError("attn_out and wo must be given together")
    m, e_dim = x.shape
    inter, e2 = w_down["q"].shape
    e3, i2 = w_gate_up["q"].shape
    if e2 != e_dim or e3 != e_dim or i2 != 2 * inter:
        raise ValueError(
            f"shape mismatch: x (M,{e_dim}), w_gate_up {w_gate_up['q'].shape}"
            f", w_down {w_down['q'].shape}"
        )
    has_wo = attn_out is not None
    if interpret is None:
        interpret = checks.resolve_interpret(config.interpret)
    if block_i is None:
        row_tile = 16 if x.dtype == jnp.bfloat16 else 8
        block_i = _pick_block_i(
            inter, e_dim,
            _resident_bytes(
                round_up(m, row_tile), e_dim,
                attn_out.shape[1] if has_wo else 0, x.dtype.itemsize,
            ),
        )
    if block_i is None or inter % block_i:
        raise ValueError(
            f"intermediate dim {inter} has no kernel-legal block "
            f"(block_i={block_i})"
        )

    dt = x.dtype
    row_tile = 16 if dt == jnp.bfloat16 else 8
    m_pad = round_up(m, row_tile)
    if m_pad != m:
        x = jnp.pad(x, [(0, m_pad - m), (0, 0)])
        if has_wo:
            attn_out = jnp.pad(attn_out, [(0, m_pad - m), (0, 0)])

    n_j = inter // block_i
    gus = w_gate_up["s"].reshape(1, 2 * inter).astype(jnp.float32)
    ds = w_down["s"].reshape(1, e_dim).astype(jnp.float32)
    norm2 = norm_w.reshape(1, e_dim).astype(jnp.float32)

    whole = lambda shape: pl.BlockSpec(shape, lambda j: (0, 0))
    in_specs = [whole((m_pad, e_dim))]
    args = [x]
    if has_wo:
        q_dim = attn_out.shape[1]
        wos = wo["s"].reshape(1, e_dim).astype(jnp.float32)
        in_specs += [
            whole((m_pad, q_dim)),
            whole((q_dim, e_dim)),
            whole((1, e_dim)),
        ]
        args += [attn_out, wo["q"], wos]
    in_specs += [
        whole((1, e_dim)),                                       # norm
        pl.BlockSpec((e_dim, block_i), lambda j: (0, j)),        # gate tile
        pl.BlockSpec((e_dim, block_i), lambda j: (0, n_j + j)),  # up tile
        pl.BlockSpec((1, block_i), lambda j: (0, j)),            # gate scale
        pl.BlockSpec((1, block_i), lambda j: (0, n_j + j)),      # up scale
        pl.BlockSpec((block_i, e_dim), lambda j: (j, 0)),        # down tile
        whole((1, e_dim)),                                       # down scale
    ]
    args += [norm2, w_gate_up["q"], w_gate_up["q"], gus, gus, w_down["q"], ds]

    wgu_bytes = e_dim * 2 * inter
    wd_bytes = inter * e_dim
    wo_bytes = (attn_out.shape[1] * e_dim) if has_wo else 0
    flops = 2 * m_pad * e_dim * 2 * inter + 2 * m_pad * inter * e_dim
    if has_wo:
        flops += 2 * m_pad * attn_out.shape[1] * e_dim

    out = pl.pallas_call(
        functools.partial(_tail_kernel, has_wo=has_wo, n_j=n_j, eps=eps),
        grid=(n_j,),
        in_specs=in_specs,
        out_specs=whole((m_pad, e_dim)),
        out_shape=jax.ShapeDtypeStruct((m_pad, e_dim), dt),
        scratch_shapes=[
            pltpu.VMEM((m_pad, e_dim), dt),           # x1 (post-residual)
            pltpu.VMEM((m_pad, e_dim), dt),           # h (normed)
            pltpu.VMEM((m_pad, e_dim), jnp.float32),  # down accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=(
                64 * 1024 * 1024 if checks.tpu_generation() >= 5 else None
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                wgu_bytes + wd_bytes + wo_bytes
                + 2 * m_pad * e_dim * dt.itemsize
            ),
            transcendentals=m_pad * inter,
        ),
        interpret=interpret,
    )(*args)
    return out[:m, :] if m_pad != m else out
