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


def _mm(x, w_ref, s_ref, dt, int4):
    """One weight matmul inside the tail: int8 tiles convert + scale the
    fp32 dot output per channel; int4 tiles fold group scales into the
    unpack (ops/qmm.dequant4_tile), so the dot needs no epilogue."""
    from .qmm import dequant4_tile

    if int4:
        w = dequant4_tile(w_ref[...], s_ref[...], dt)
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        x, w_ref[...].astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * s_ref[...].astype(jnp.float32)


def _rmsnorm(x, norm_ref, eps, dt):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (
        xf * jax.lax.rsqrt(var + eps) * norm_ref[...].astype(jnp.float32)
    ).astype(dt)


def _tail_kernel(
    *refs,
    has_wo: bool,
    has_qkv: bool,
    n_j: int,
    eps: float,
    wo4: bool = False,
    gu4: bool = False,
    d4: bool = False,
    qkv4: bool = False,
):
    refs = list(refs)
    x_ref = refs.pop(0)
    if has_wo:
        attn_ref, wo_ref, wos_ref = refs[:3]
        refs = refs[3:]
    else:
        attn_ref = wo_ref = wos_ref = None
    (norm_ref, wg_ref, wu_ref, gs_ref, us_ref, wd_ref, ds_ref) = refs[:7]
    refs = refs[7:]
    if has_qkv:
        anorm_ref, wqkv_ref, qs_ref, o_ref, oq_ref = refs[:5]
        x1_s, h_s, acc = refs[5:]
    else:
        o_ref = refs[0]
        x1_s, h_s, acc = refs[1:]
        anorm_ref = wqkv_ref = qs_ref = oq_ref = None
    j = pl.program_id(0)
    dt = x_ref.dtype

    @pl.when(j == 0)
    def _head():
        if has_wo:
            proj = _mm(attn_ref[...], wo_ref, wos_ref, dt, wo4)
            x1 = x_ref[...] + proj.astype(dt)
        else:
            x1 = x_ref[...]
        x1_s[...] = x1
        h_s[...] = _rmsnorm(x1, norm_ref, eps, dt)
        acc[...] = jnp.zeros_like(acc)

    h = h_s[...]
    gate = _mm(h, wg_ref, gs_ref, dt, gu4).astype(dt)
    up = _mm(h, wu_ref, us_ref, dt, gu4).astype(dt)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(dt) * up
    # int8: _mm applies the per-channel down scale to each tile's fp32
    # dot — the scale is constant across j, so per-tile scaling equals
    # scaling the sum.  int4: scales are folded into the weights.
    acc[...] += _mm(act, wd_ref, ds_ref, dt, d4)

    @pl.when(j == n_j - 1)
    def _store():
        xn = x1_s[...] + acc[...].astype(dt)
        o_ref[...] = xn
        if has_qkv:
            # Next layer's attention input: its RMSNorm + QKV projection
            # computed here (the weights sat resident all along), so the
            # next decode layer starts straight at RoPE — one fewer
            # dispatch per layer.
            hn = _rmsnorm(xn, anorm_ref, eps, dt)
            oq_ref[...] = _mm(hn, wqkv_ref, qs_ref, dt, qkv4).astype(dt)


def _resident_bytes(
    m_pad: int, e_dim: int, q_dim: int, itemsize: int, wo4: bool = False,
    qkv_out: int = 0, qkv4: bool = False,
) -> int:
    """VMEM held for the kernel's whole lifetime: the wo matrix (+ scale),
    the optional next-layer QKV matrix (+ scale + output block),
    x/attn_out/out blocks, x1/h scratch, the fp32 accumulator, and the
    broadcast scale/norm rows."""
    if q_dim:
        wo = q_dim * e_dim // (2 if wo4 else 1)
        wo += (q_dim // 128 if wo4 else 1) * 4 * e_dim
    else:
        wo = 0
    qkv = 0
    if qkv_out:
        qkv = e_dim * qkv_out // (2 if qkv4 else 1)
        qkv += (e_dim // 128 if qkv4 else 1) * 4 * qkv_out
        qkv += m_pad * qkv_out * itemsize  # the qkv output block
    acts = m_pad * (5 * e_dim + q_dim) * itemsize  # x, out, x1, h (+attn)
    return wo + qkv + acts + m_pad * e_dim * 4 + 3 * 4 * e_dim


def _stream_bytes(e_dim: int, bi: int, gu4: bool, d4: bool) -> int:
    """Double-buffered per-step tile stream: gate + up (+ their group
    scales when int4) + down (+ its scales)."""
    gu = 2 * (e_dim * bi // (2 if gu4 else 1))
    if gu4:
        gu += 2 * (e_dim // 128) * bi * 4
    d = bi * e_dim // (2 if d4 else 1)
    if d4:
        d += (bi // 128) * e_dim * 4
    return 2 * (gu + d)


def _pick_block_i(
    inter: int, e_dim: int, resident: int = 0,
    gu4: bool = False, d4: bool = False,
) -> Optional[int]:
    """Largest legal divisor of the intermediate dim whose double-buffered
    tile stream fits the VMEM budget next to the kernel's resident
    buffers.  int4 down tiles need 256-multiples (whole packing blocks)."""
    budget = _VMEM_BUDGET - resident
    gran = 256 if d4 else 128
    for bi in (4096, 2048, 1024, 512, 256, 128):
        if bi % gran:
            continue
        if inter % bi == 0 and _stream_bytes(e_dim, bi, gu4, d4) <= budget:
            return bi
    return None


def _is_q(w: Any) -> bool:
    return isinstance(w, dict) and "s" in w and ("q" in w or "q4" in w)


def _minfo(w: dict):
    """(int4, in_dim, out_dim) of an int8/int4 quantized matrix."""
    if "q4" in w:
        return True, 2 * w["q4"].shape[0], w["q4"].shape[1]
    return False, w["q"].shape[0], w["q"].shape[1]


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
    wo4, q_dim, e2 = _minfo(layer["wo"])
    gu4, e3, i2 = _minfo(layer["w_gate_up"])
    d4, inter, e4 = _minfo(layer["w_down"])
    if not (e_dim == e2 == e3 == e4 and i2 == 2 * inter):
        return False
    if e_dim % 128 or inter % 128 or q_dim % 128:
        return False
    # int4 matrices pack 256-row blocks along their input axis.
    if (gu4 and e_dim % 256) or (d4 and inter % 256) or (wo4 and q_dim % 256):
        return False
    if q_dim * e_dim // (2 if wo4 else 1) > _WO_BUDGET:
        return False
    resident = _resident_bytes(
        round_up(rows, 16), e_dim, q_dim, x.dtype.itemsize, wo4
    )
    return _pick_block_i(inter, e_dim, resident, gu4, d4) is not None


def qkv_fold_supported(cfg, layer, next_layer, x: jax.Array) -> bool:
    """May this layer's fused tail also emit the NEXT layer's QKV?

    Requires a fused quantized ``w_qkv`` on the next layer, kernel-legal
    shapes, and enough VMEM headroom for the resident QKV matrix next to
    everything ``tail_supported`` already accounted for."""
    if next_layer is None or "w_qkv" not in next_layer:
        return False
    if not _is_q(next_layer["w_qkv"]) or "attn_norm" not in next_layer:
        return False
    qkv4, e_in, f_out = _minfo(next_layer["w_qkv"])
    e_dim = x.shape[-1]
    if e_in != e_dim or f_out % 128:
        return False
    if qkv4 and e_dim % 256:
        return False
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    _, q_dim, _ = _minfo(layer["wo"])
    gu4, _, _ = _minfo(layer["w_gate_up"])
    d4, inter, _ = _minfo(layer["w_down"])
    wo4 = "q4" in layer["wo"]
    resident = _resident_bytes(
        round_up(rows, 16), e_dim, q_dim, x.dtype.itemsize, wo4,
        qkv_out=f_out, qkv4=qkv4,
    )
    return _pick_block_i(inter, e_dim, resident, gu4, d4) is not None


def fused_layer_tail(
    x: jax.Array,
    norm_w: jax.Array,
    w_gate_up: dict,
    w_down: dict,
    *,
    eps: float,
    attn_out: Optional[jax.Array] = None,
    wo: Optional[dict] = None,
    next_attn_norm: Optional[jax.Array] = None,
    next_w_qkv: Optional[dict] = None,
    block_i: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """One-call decoder-layer tail (see module docstring for the math).
    Each weight may be int8 ({"q", "s"}) or group-wise int4 ({"q4", "s"},
    models/quantized.quantize_matrix_int4) — int4 tiles carry half the
    bytes and fold their group scales into the in-VMEM unpack.

    With ``next_attn_norm``/``next_w_qkv`` the kernel ALSO emits the next
    layer's QKV projection (rms_norm(out) @ w_qkv, bias added by the
    caller) from the same call — gate with ``qkv_fold_supported`` — and
    returns ``(out, qkv)`` instead of ``out``."""
    if (attn_out is None) != (wo is None):
        raise ValueError("attn_out and wo must be given together")
    if (next_attn_norm is None) != (next_w_qkv is None):
        raise ValueError(
            "next_attn_norm and next_w_qkv must be given together"
        )
    has_qkv = next_w_qkv is not None
    m, e_dim = x.shape
    gu4, e3, i2 = _minfo(w_gate_up)
    d4, inter, e4 = _minfo(w_down)
    if e4 != e_dim or e3 != e_dim or i2 != 2 * inter:
        raise ValueError(
            f"shape mismatch: x (M,{e_dim}), w_gate_up in={e3} out={i2}, "
            f"w_down in={inter} out={e4}"
        )
    has_wo = attn_out is not None
    wo4 = has_wo and "q4" in wo
    if interpret is None:
        interpret = checks.resolve_interpret(config.interpret)
    row_tile = 16 if x.dtype == jnp.bfloat16 else 8
    qkv4, f_out = False, 0
    if has_qkv:
        qkv4, e_q, f_out = _minfo(next_w_qkv)
        if e_q != e_dim or f_out % 128 or (qkv4 and e_dim % 256):
            raise ValueError(
                f"next_w_qkv in={e_q} out={f_out} is not kernel-legal for "
                f"E={e_dim}"
            )
    if block_i is None:
        block_i = _pick_block_i(
            inter, e_dim,
            _resident_bytes(
                round_up(m, row_tile), e_dim,
                attn_out.shape[1] if has_wo else 0, x.dtype.itemsize, wo4,
                qkv_out=f_out, qkv4=qkv4,
            ),
            gu4, d4,
        )
    if block_i is None or inter % block_i or (d4 and block_i % 256):
        raise ValueError(
            f"intermediate dim {inter} has no kernel-legal block "
            f"(block_i={block_i})"
        )

    dt = x.dtype
    m_pad = round_up(m, row_tile)
    if m_pad != m:
        x = jnp.pad(x, [(0, m_pad - m), (0, 0)])
        if has_wo:
            attn_out = jnp.pad(attn_out, [(0, m_pad - m), (0, 0)])

    n_j = inter // block_i
    norm2 = norm_w.reshape(1, e_dim).astype(jnp.float32)

    whole = lambda shape: pl.BlockSpec(shape, lambda j: (0, 0))
    in_specs = [whole((m_pad, e_dim))]
    args = [x]
    if has_wo:
        q_dim = attn_out.shape[1]
        in_specs.append(whole((m_pad, q_dim)))
        args.append(attn_out)
        if wo4:
            in_specs += [
                whole((q_dim // 2, e_dim)),
                whole((q_dim // 128, e_dim)),
            ]
            args += [wo["q4"], wo["s"].astype(jnp.float32)]
        else:
            in_specs += [whole((q_dim, e_dim)), whole((1, e_dim))]
            args += [wo["q"], wo["s"].reshape(1, e_dim).astype(jnp.float32)]
    in_specs.append(whole((1, e_dim)))  # norm
    args.append(norm2)
    if gu4:
        in_specs += [
            pl.BlockSpec((e_dim // 2, block_i), lambda j: (0, j)),
            pl.BlockSpec((e_dim // 2, block_i), lambda j: (0, n_j + j)),
            pl.BlockSpec((e_dim // 128, block_i), lambda j: (0, j)),
            pl.BlockSpec((e_dim // 128, block_i), lambda j: (0, n_j + j)),
        ]
        gus = w_gate_up["s"].astype(jnp.float32)
        args += [w_gate_up["q4"], w_gate_up["q4"], gus, gus]
    else:
        in_specs += [
            pl.BlockSpec((e_dim, block_i), lambda j: (0, j)),
            pl.BlockSpec((e_dim, block_i), lambda j: (0, n_j + j)),
            pl.BlockSpec((1, block_i), lambda j: (0, j)),
            pl.BlockSpec((1, block_i), lambda j: (0, n_j + j)),
        ]
        gus = w_gate_up["s"].reshape(1, 2 * inter).astype(jnp.float32)
        args += [w_gate_up["q"], w_gate_up["q"], gus, gus]
    if d4:
        in_specs += [
            pl.BlockSpec((block_i // 2, e_dim), lambda j: (j, 0)),
            pl.BlockSpec((block_i // 128, e_dim), lambda j: (j, 0)),
        ]
        args += [w_down["q4"], w_down["s"].astype(jnp.float32)]
    else:
        in_specs += [
            pl.BlockSpec((block_i, e_dim), lambda j: (j, 0)),
            whole((1, e_dim)),
        ]
        args += [w_down["q"], w_down["s"].reshape(1, e_dim).astype(jnp.float32)]
    if has_qkv:
        in_specs.append(whole((1, e_dim)))  # next layer's attn norm
        args.append(next_attn_norm.reshape(1, e_dim).astype(jnp.float32))
        if qkv4:
            in_specs += [
                whole((e_dim // 2, f_out)),
                whole((e_dim // 128, f_out)),
            ]
            args += [next_w_qkv["q4"], next_w_qkv["s"].astype(jnp.float32)]
        else:
            in_specs += [whole((e_dim, f_out)), whole((1, f_out))]
            args += [
                next_w_qkv["q"],
                next_w_qkv["s"].reshape(1, f_out).astype(jnp.float32),
            ]

    wgu_bytes = e_dim * 2 * inter // (2 if gu4 else 1)
    wd_bytes = inter * e_dim // (2 if d4 else 1)
    wo_bytes = (
        attn_out.shape[1] * e_dim // (2 if wo4 else 1) if has_wo else 0
    )
    qkv_bytes = e_dim * f_out // (2 if qkv4 else 1) if has_qkv else 0
    flops = 2 * m_pad * e_dim * 2 * inter + 2 * m_pad * inter * e_dim
    if has_wo:
        flops += 2 * m_pad * attn_out.shape[1] * e_dim
    if has_qkv:
        flops += 2 * m_pad * e_dim * f_out

    if has_qkv:
        out_specs = (whole((m_pad, e_dim)), whole((m_pad, f_out)))
        out_shape = (
            jax.ShapeDtypeStruct((m_pad, e_dim), dt),
            jax.ShapeDtypeStruct((m_pad, f_out), dt),
        )
    else:
        out_specs = whole((m_pad, e_dim))
        out_shape = jax.ShapeDtypeStruct((m_pad, e_dim), dt)

    out = pl.pallas_call(
        functools.partial(
            _tail_kernel, has_wo=has_wo, has_qkv=has_qkv, n_j=n_j, eps=eps,
            wo4=wo4, gu4=gu4, d4=d4, qkv4=qkv4,
        ),
        grid=(n_j,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
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
                wgu_bytes + wd_bytes + wo_bytes + qkv_bytes
                + 2 * m_pad * e_dim * dt.itemsize
            ),
            transcendentals=m_pad * inter,
        ),
        interpret=interpret,
    )(*args)
    if has_qkv:
        y, qkv = out
        if m_pad != m:
            return y[:m, :], qkv[:m, :]
        return y, qkv
    return out[:m, :] if m_pad != m else out
