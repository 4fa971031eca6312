"""Layer-granular decode mega-kernel: attention over the slot KV cache +
output projection + residual + RMSNorm + SwiGLU MLP + residual + the next
layer's QKV projection — ONE Pallas call per decoder layer.

The reference has no decode path at all (SURVEY.md §0); this kernel is
round 5's serving lever (VERDICT r4 item 1).  The measured op-cost model
(docs/ARCHITECTURE.md; benchmarks/decode_phase_probe.py) puts the 64-slot
8B step at ~26 ms: fused tails ~14.5 + decode attention ~6 + glue ~5.
The attention pallas call and the XLA glue between it and the tail
(append scatter dependencies, reshape/transpose traffic, per-op dispatch)
are the remaining non-weight cost; folding the whole layer into one call
streams cache blocks and weight tiles through a single Mosaic pipeline.

Structure — a flat 1-D grid with three phases, each stream fetched only
during its phase via clamped BlockSpec index maps (repeated block indices
elide the re-fetch, the same trick as ops/decode.py's window mode):

  phase A (Hkv * n_kv steps, head-outer / kv-block-inner):
    online-softmax decode attention per head over (B, bkv, D) cache
    blocks; per-head scratch only (the head finishes before the next
    starts).  At each head's LAST step the head's normalized output
    immediately multiplies its slice of a streamed wo row-block into the
    fp32 x1 accumulator — the output projection rides inside the
    attention phase.
  phase B (n_j steps): the qmlp fused-tail MLP body (gate/up/down column
    tiles, per-channel int8 scales, fp32 accumulation — numerics
    identical to ops/qmlp.fused_layer_tail).
  phase C (n_q steps): next layer's attn-RMSNorm + QKV projection,
    streamed in column blocks (kept un-resident, unlike qmlp's fold —
    the attention streams need the VMEM headroom).

The kernel attends over the POST-append cache (the caller scatters the
current token first, exactly like the unfused path).  Single ownership is
load-bearing: an earlier variant read the PRE-append cache and merged the
current token analytically so the scatter could leave the critical path —
but a cache buffer with TWO consumers (kernel read + scatter) defeats
XLA's in-place scatter and every carried cache array was silently COPIED
each step, measured +8.5 ms/step at 64-slot 8B shapes
(benchmarks/megastep_step_probe.py).  Appending first keeps the
one-consumer chain and the scatter in place; its critical-path cost is
the write of B rows (~nothing).

Decode-regime, T=1, int8 token-wise KV cache, w8a16 fused projections,
no sliding window (gate: ``megastep_supported``).  Differential tests:
tests/test_megastep.py (vs the unfused decode step).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config
from ..utils import checks
from ..utils.shapes import round_up
from .qmlp import _mm, _rmsnorm

LOG2E = math.log2(math.e)
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NUM_LANES = 128

#: Scoped-VMEM budget (same headroom policy as ops/qmlp.py).
_VMEM_BUDGET = 58 * 1024 * 1024


def _mega_kernel(
    # scalar prefetch
    nblk_ref,  # (1,) int32: ceil(max(lengths)/bkv) valid cache blocks
    # inputs
    x_ref,      # (B, E) bf16            residual stream
    q_ref,      # (B, Hkv, Gp, D) bf16   rotated queries, group-padded
    auxz_ref,   # (B, 128) f32           multiplicative row-zero {0, 1}
    cmask_ref,  # (B, bkv) block of (B, S) f32 ragged col mask {0, MASK}
    k_ref,      # (B, 1, bkv, D) int8    cache K block (head h)
    v_ref,      # (B, 1, bkv, D) int8
    ks_ref,     # (B, Hkv, bkv) f32      token-wise K scales (all heads —
    vs_ref,     # (B, Hkv, bkv) f32      Mosaic sublane rule, ops/decode)
    wo_ref,     # (group*D, E) int8      wo row-block of head h
    wos_ref,    # (1, E) f32             wo per-channel scale
    norm_ref,   # (1, E) f32             mlp RMSNorm weight
    wg_ref,     # (E, bi) int8           gate tile
    wu_ref,     # (E, bi) int8           up tile
    gs_ref,     # (1, bi) f32
    us_ref,     # (1, bi) f32
    wd_ref,     # (bi, E) int8           down tile
    ds_ref,     # (1, E) f32
    *refs,      # [sk, sv, sks, svs, smask] when has_side;
                # [nnorm, wq, qs] when has_qkv; outputs; scratch
    n_kv: int,
    hkv: int,
    group: int,
    n_j: int,
    n_q: int,
    sm_scale: float,
    eps: float,
    has_qkv: bool,
    has_side: bool = False,
):
    refs = list(refs)
    if has_side:
        # Burst-mode side buffer: this burst's appended tokens
        # ((B, Hkv, Tpad, D) int8 + (B, Hkv, Tpad) f32 scales + a
        # (B, Tpad) additive validity mask), VMEM-resident whole.
        sk_ref, sv_ref, sks_ref, svs_ref, smask_ref = refs[:5]
        refs = refs[5:]
    else:
        sk_ref = sv_ref = sks_ref = svs_ref = smask_ref = None
    if has_qkv:
        nnorm_ref, wq_ref, qs_ref = refs[:3]  # next layer norm + QKV tile
        o_ref, oq_ref = refs[3:5]
        refs = refs[5:]
    else:
        nnorm_ref = wq_ref = qs_ref = oq_ref = None
        o_ref = refs[0]
        refs = refs[1:]
    # scratch: per-head softmax max/sum, attention accumulator, attn@wo
    # accumulator, post-attention residual, normed activations, down acc
    (m_s, l_s, aacc_s, x1acc_s, x1_s, h_s, macc_s) = refs
    j = pl.program_id(0)
    n_att = hkv * n_kv
    dt = x_ref.dtype
    d = aacc_s.shape[-1]
    scale2 = sm_scale * LOG2E

    # ---------------- phase A: attention (head-outer, block-inner) -------
    @pl.when(j < n_att)
    def _attention():
        h = j // n_kv
        jk = j % n_kv
        nblk = nblk_ref[0]

        @pl.when(j == 0)
        def _first():
            x1acc_s[...] = jnp.zeros_like(x1acc_s)

        @pl.when(jk == 0)
        def _head_init():
            m_s[...] = jnp.full_like(m_s, -jnp.inf)
            l_s[...] = jnp.zeros_like(l_s)
            aacc_s[...] = jnp.zeros_like(aacc_s)

        q = q_ref[:, h]  # (B, Gp, D) — dynamic untiled-dim index, like
        # the decode kernel's all-heads scale slice

        @pl.when(jk < nblk)
        def _block():
            k = k_ref[:, 0].astype(jnp.bfloat16)  # (B, bkv, D)
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale2  # (B, Gp, bkv)
            s = s * ks_ref[:, h, :][:, None, :]
            s = s + cmask_ref[...][:, None, :]

            m_prev = m_s[...]
            l_prev = l_s[...]
            m_curr = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, :, :1])
            l_s[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            m_s[...] = m_next

            v = v_ref[:, 0]  # (B, bkv, D) int8
            p_eff = (p * vs_ref[:, h, :][:, None, :]).astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                p_eff, v.astype(jnp.bfloat16), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            aacc_s[...] = aacc_s[...] * alpha[:, :, :1] + pv

        @pl.when(jk == n_kv - 1)
        def _finalize():
            if has_side:
                # Burst side buffer: one more online-softmax block over
                # this burst's appended tokens (cache arrays stay
                # UNTOUCHED inside the burst — megastep.py docstring on
                # the scatter-copy trap; kv_cache.flush_side persists
                # them once per burst).
                sk = sk_ref[:, h].astype(jnp.bfloat16)  # (B, Tpad, D)
                s2 = jax.lax.dot_general(
                    q, sk, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * scale2  # (B, Gp, Tpad)
                s2 = s2 * sks_ref[:, h, :][:, None, :]
                s2 = s2 + smask_ref[...][:, None, :]
                m_prev = m_s[...]
                l_prev = l_s[...]
                m_curr = jnp.max(s2, axis=-1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp2(m_prev - m_next)
                p2 = jnp.exp2(s2 - m_next[:, :, :1])
                l_fin = alpha * l_prev + jnp.sum(
                    p2, axis=-1, keepdims=True
                )
                sv = sv_ref[:, h].astype(jnp.bfloat16)
                p_eff2 = (
                    p2 * svs_ref[:, h, :][:, None, :]
                ).astype(jnp.bfloat16)
                pv2 = jax.lax.dot_general(
                    p_eff2, sv, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                acc = aacc_s[...] * alpha[:, :, :1] + pv2
                l1 = l_fin[:, :, :1]
            else:
                acc = aacc_s[...]
                l1 = l_s[...][:, :, :1]
            l_inv = jnp.where(l1 == 0.0, 0.0, 1.0 / l1)
            # Head output -> wo row-block, one (B, D) x (D, E) dot per
            # group row (keeps the accumulator's (Gp, D) sublane layout —
            # no sublane->lane reshape exists in Mosaic).
            for g in range(group):
                og = acc[:, g, :] * l_inv[:, g, :] * auxz_ref[:, :1]
                w_g = wo_ref[g * d : (g + 1) * d, :].astype(dt)
                x1acc_s[...] += jax.lax.dot_general(
                    og.astype(dt), w_g, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    # ---------------- phase B: fused MLP tail ----------------------------
    @pl.when(jnp.logical_and(j >= n_att, j < n_att + n_j))
    def _mlp():
        @pl.when(j == n_att)
        def _head():
            proj = x1acc_s[...] * wos_ref[...].astype(jnp.float32)
            x1 = x_ref[...] + proj.astype(dt)
            x1_s[...] = x1
            h_s[...] = _rmsnorm(x1, norm_ref, eps, dt)
            macc_s[...] = jnp.zeros_like(macc_s)

        h_act = h_s[...]
        gate = _mm(h_act, wg_ref, gs_ref, dt, False).astype(dt)
        up = _mm(h_act, wu_ref, us_ref, dt, False).astype(dt)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(dt) * up
        macc_s[...] += _mm(act, wd_ref, ds_ref, dt, False)

        if not has_qkv:
            # Last layer: no phase C — emit the residual stream here.
            @pl.when(j == n_att + n_j - 1)
            def _store_last():
                o_ref[...] = x1_s[...] + macc_s[...].astype(dt)

    # ---------------- phase C: next layer's QKV --------------------------
    if has_qkv:

        @pl.when(j >= n_att + n_j)
        def _qkv():
            @pl.when(j == n_att + n_j)
            def _store():
                xo = x1_s[...] + macc_s[...].astype(dt)
                o_ref[...] = xo
                h_s[...] = _rmsnorm(xo, nnorm_ref, eps, dt)

            hn = h_s[...]
            oq_ref[...] = _mm(hn, wq_ref, qs_ref, dt, False).astype(dt)


def _pick_bkv(
    s_max: int, batch: int, head_dim: int, hkv: int
) -> Optional[int]:
    """Cache block choice (a divisor of s_max) whose double-buffered
    K/V/scale/colmask stream fits the attention phase's share of VMEM.
    The scale blocks span ALL heads (Mosaic sublane rule), hence the
    8*hkv bytes-per-token term.

    Short serving caches PREFER 256 over the largest fitting block: the
    ragged skip works at bkv granularity, so during the first half of a
    max_len=512 decode round bkv=256 streams half the cache bytes —
    measured 16.7 -> 15.8 ms on the 32-layer kernel chain at
    B=64/fill=256 (benchmarks/megastep_phase_probe.py --bkv).  Long
    caches keep the largest fitting block (grid-step overhead grows as
    hkv * s_max/bkv)."""
    budget = 24 * 1024 * 1024

    def fits(bkv):
        per_buf = batch * bkv * (2 * head_dim + 4 + 8 * hkv)
        return 2 * per_buf <= budget

    if s_max <= 1024 and s_max % 256 == 0 and fits(256):
        return 256
    for bkv in (1024, 512, 256, 128):
        if s_max % bkv == 0 and fits(bkv):
            return bkv
    return None


def _side_bytes(batch: int, hkv: int, tpad: int, d: int) -> int:
    """VMEM held by the burst side buffer (whole-resident in the kernel):
    int8 K+V + fp32 scales + the validity mask."""
    if tpad == 0:
        return 0
    return batch * hkv * tpad * (2 * d + 8) + batch * tpad * 4


def _pick_tile(total: int, e_dim: int, budget: int) -> Optional[int]:
    """Largest column tile (divisor of ``total``) whose double-buffered
    int8 stream (3 matrices wide for the MLP) fits ``budget``."""
    for blk in (1024, 768, 512, 256, 128):
        if total % blk == 0 and 2 * 3 * e_dim * blk <= budget:
            return blk
    return None


@jax.tree_util.register_static
class DecodeCtx:
    """Static per-step attention context config (built once per decode
    step by ``build_decode_ctx``; the traced arrays travel alongside)."""

    def __init__(self, bkv: int):
        self.bkv = bkv

    def __eq__(self, other):
        return isinstance(other, DecodeCtx) and self.bkv == other.bkv

    def __hash__(self):
        return hash(("DecodeCtx", self.bkv))


def build_decode_ctx(
    positions: jax.Array, active_mask: jax.Array, s_max: int, bkv: int,
    window_left: Optional[int] = None,
) -> Dict[str, jax.Array]:
    """Per-step arrays shared by every layer's mega-kernel call: the
    ragged column mask, the empty-row zero mask, and the valid-block
    count — all over the POST-append lengths (positions + active: the
    caller scatters the current token before the kernel runs).

    ``window_left``: sliding-window extent (cfg.window - 1).  The window
    bound rides the SAME additive column mask the ragged bound uses —
    the kernel needs no window code at all (masked blocks still stream,
    so window models pay full-cache DMA; the win is the fused tail, not
    block skip)."""
    batch = positions.shape[0]
    lengths = positions + active_mask.astype(jnp.int32)
    cols = jnp.arange(s_max, dtype=jnp.int32)[None, :]
    keep = cols < lengths[:, None]
    if window_left is not None:
        # Query position is lengths - 1; HF convention window=w sees
        # exactly w keys including self (backends.window_of).
        keep = jnp.logical_and(
            keep, cols >= (lengths - 1 - window_left)[:, None]
        )
    cmask = jnp.where(keep, 0.0, MASK_VALUE).astype(jnp.float32)  # (B, S)
    auxz = jnp.broadcast_to(
        (lengths > 0).astype(jnp.float32)[:, None], (batch, NUM_LANES)
    )
    nblk = ((jnp.max(lengths) + bkv - 1) // bkv).astype(jnp.int32)[None]
    return {
        "cmask": cmask,
        "auxz": auxz,
        "nblk": nblk,
        "ctx": DecodeCtx(bkv),
    }


def _is_q8(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def megastep_supported(
    cfg, params, cache, batch: int, mesh=None, side_tokens: int = 0
) -> bool:
    """Trace-time routing gate for the fused decode layer step.

    Requires the fused int8 w8a16 tree (``w_qkv``/``w_gate_up``/
    ``w_down``/``wo`` all {"q","s"}), an int8 token-wise-scaled slot
    cache, head_dim 128, no sliding window / biases / MoE / TP mesh, and
    kernel-legal shapes.  ``config.kernel.megastep``: True = compiled TPU
    only; "force" also routes in interpret mode (CPU differential
    tests)."""
    flag = config.kernel.megastep
    if not flag or mesh is not None:
        return False
    if flag != "force" and checks.resolve_interpret(config.interpret):
        return False
    if cfg.qkv_bias or cfg.num_experts > 0:
        return False
    if cfg.window is not None and cfg.window - 1 < side_tokens:
        # Window models route via the additive column mask
        # (build_decode_ctx window_left).  Burst mode additionally needs
        # every side column inside the window for every step (the side
        # mask has no window term): window - 1 >= Tpad guarantees it.
        # Real window models (Mistral: 4096) clear this by far.
        return False
    if cfg.head_dim != 128 or cfg.dtype != jnp.bfloat16:
        return False
    if cache.k.dtype != jnp.int8 or cache.k_scale is None:
        return False
    if cache.k.shape[-1] != cfg.head_dim:  # packed int4 container
        return False
    layers = params["layers"]
    if not all(
        all(_is_q8(l.get(k)) for k in ("w_qkv", "w_gate_up", "w_down", "wo"))
        for l in layers
    ):
        return False
    e_dim, inter, q_dim = cfg.hidden_size, cfg.intermediate_size, cfg.q_dim
    f_out = layers[0]["w_qkv"]["q"].shape[1]
    if any(x % 128 for x in (e_dim, inter, q_dim, f_out)):
        return False
    if batch % 16 or batch > 256:
        return False
    if cfg.num_q_heads % cfg.num_kv_heads:
        return False
    s_max = cache.max_len
    bkv = _pick_bkv(s_max, batch, cfg.head_dim, cfg.num_kv_heads)
    if bkv is None:
        return False
    att_buf = 2 * batch * bkv * (
        2 * cfg.head_dim + 4 + 8 * cfg.num_kv_heads
    )
    side_buf = _side_bytes(
        batch, cfg.num_kv_heads, side_tokens, cfg.head_dim
    )
    budget = _VMEM_BUDGET - att_buf - side_buf - 2 * 2 * (
        cfg.num_q_heads // cfg.num_kv_heads
    ) * cfg.head_dim * e_dim
    if _pick_tile(inter, e_dim, budget) is None:
        return False
    return _pick_tile(f_out, e_dim, budget) is not None


def fused_decode_layer(
    x: jax.Array,
    q: jax.Array,
    cache_k: jax.Array,
    cache_v: jax.Array,
    cache_ks: jax.Array,
    cache_vs: jax.Array,
    step_ctx: Dict[str, jax.Array],
    layer: Dict[str, Any],
    next_attn_norm: Optional[jax.Array] = None,
    next_w_qkv: Optional[Dict[str, jax.Array]] = None,
    *,
    side: Optional[Dict[str, jax.Array]] = None,
    eps: float,
    sm_scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """One fused decode layer step (see module docstring).

    Args:
      x: (B, E) bf16 residual stream.
      q: (B, Hq, D) bf16 rotated queries.
      cache_*: the slot cache arrays of this layer ((B, Hkv, S, D) int8
        + (B, Hkv, S) f32 scales).  Per-step mode (side=None): the
        caller scatters the current token in FIRST and step_ctx covers
        positions + active (post-append lengths).  Burst mode (side
        given): the cache stays UNTOUCHED for the whole burst (step_ctx
        covers the burst-start lengths only) and the kernel additionally
        attends over the side buffer: {"k"/"v": (B, Hkv, Tpad, D) int8,
        "ks"/"vs": (B, Hkv, Tpad) f32, "mask": (B, Tpad) f32 additive
        validity}.  The side buffer is appended with ONE shared-row
        dynamic_update_slice per step — the form that stays in place
        through a pallas consumer, unlike any scatter (measured:
        benchmarks/append_probe.py; a per-step cache scatter consumed by
        the kernel silently copied all cache arrays, +8 ms/step).
      step_ctx: ``build_decode_ctx`` output (shared across layers).
      layer: fused w8a16 layer dict (wo, mlp_norm, w_gate_up, w_down).
      next_attn_norm/next_w_qkv: the NEXT layer's RMSNorm weight and
        fused QKV matrix (phase C emits its pre-RoPE projection).

    Returns (x_out (B, E), qkv_next (B, F) pre-RoPE).
    """
    batch, e_dim = x.shape
    _, hq, d = q.shape
    _, hkv, s_max, _ = cache_k.shape
    group = hq // hkv
    gp = max(8, round_up(group, 8))
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = checks.resolve_interpret(config.interpret)

    bkv = step_ctx["ctx"].bkv
    n_kv = s_max // bkv
    n_att = hkv * n_kv

    has_qkv = next_w_qkv is not None
    if has_qkv != (next_attn_norm is not None):
        raise ValueError(
            "next_attn_norm and next_w_qkv must be given together"
        )
    wo, norm_w = layer["wo"], layer["mlp_norm"]
    wgu, wdn = layer["w_gate_up"], layer["w_down"]
    q_dim = wo["q"].shape[0]
    inter = wdn["q"].shape[0]
    f_out = next_w_qkv["q"].shape[1] if has_qkv else 0
    att_buf = 2 * batch * bkv * (2 * d + 4 + 8 * hkv)
    side_buf = _side_bytes(
        batch, hkv, side["k"].shape[2] if side is not None else 0, d
    )
    budget = _VMEM_BUDGET - att_buf - side_buf - 2 * 2 * group * d * e_dim
    bi = _pick_tile(inter, e_dim, budget)
    fblk = _pick_tile(f_out, e_dim, budget) if has_qkv else 0
    if bi is None or fblk is None:
        raise ValueError(
            f"no kernel-legal MLP/QKV tiles for I={inter}, F={f_out} "
            f"within the VMEM budget"
        )
    n_j = inter // bi
    n_q = (f_out // fblk) if has_qkv else 0
    n_total = n_att + n_j + n_q

    # Queries grouped per KV head, padded to the fp32 sublane width.
    # Stays batch-major — the kernel indexes the head on an untiled dim,
    # so no XLA transpose per layer.
    qg = q.reshape(batch, hkv, group, d)
    if gp != group:
        qg = jnp.pad(qg, [(0, 0), (0, 0), (0, gp - group), (0, 0)])

    nkv_c = n_kv  # close over statics for the index maps

    def _h(j):
        return jnp.minimum(j // nkv_c, hkv - 1)

    def _jk(j, nblk_ref):
        raw = jnp.where(j >= n_att, nkv_c - 1, j % nkv_c)
        return jnp.minimum(raw, jnp.maximum(nblk_ref[0] - 1, 0))

    def _jm(j):
        return jnp.clip(j - n_att, 0, n_j - 1)

    def _jq(j):
        return jnp.clip(j - n_att - n_j, 0, n_q - 1)

    whole = lambda shape: pl.BlockSpec(shape, lambda j, n: (0,) * len(shape))
    in_specs = [
        whole((batch, e_dim)),               # x
        whole((batch, hkv, gp, d)),          # q
        whole((batch, NUM_LANES)),           # auxz
        pl.BlockSpec((batch, bkv), lambda j, n: (0, _jk(j, n))),   # cmask
        pl.BlockSpec(
            (batch, 1, bkv, d), lambda j, n: (0, _h(j), _jk(j, n), 0)
        ),                                   # k cache
        pl.BlockSpec(
            (batch, 1, bkv, d), lambda j, n: (0, _h(j), _jk(j, n), 0)
        ),                                   # v cache
        # All-heads scale blocks (Mosaic: the second-to-last block dim
        # must be 8-divisible or equal the array dim — a (B, 1, bkv)
        # per-head slab is rejected).  With n_kv == 1 (the serving
        # max_len<=512 configs) the jk index is constant, so the block is
        # fetched once per layer; multi-block caches refetch it per head
        # sweep (~3% of the KV bytes, Hkv times).
        pl.BlockSpec((batch, hkv, bkv), lambda j, n: (0, 0, _jk(j, n))),
        pl.BlockSpec((batch, hkv, bkv), lambda j, n: (0, 0, _jk(j, n))),
        pl.BlockSpec((group * d, e_dim), lambda j, n: (_h(j), 0)),  # wo
        whole((1, e_dim)),                   # wo scale
        whole((1, e_dim)),                   # mlp norm
        pl.BlockSpec((e_dim, bi), lambda j, n: (0, _jm(j))),        # gate
        pl.BlockSpec((e_dim, bi), lambda j, n: (0, n_j + _jm(j))),  # up
        pl.BlockSpec((1, bi), lambda j, n: (0, _jm(j))),
        pl.BlockSpec((1, bi), lambda j, n: (0, n_j + _jm(j))),
        pl.BlockSpec((bi, e_dim), lambda j, n: (_jm(j), 0)),        # down
        whole((1, e_dim)),                   # down scale
    ]
    if side is not None:
        tpad = side["k"].shape[2]
        in_specs += [
            whole((batch, hkv, tpad, d)),    # side k
            whole((batch, hkv, tpad, d)),    # side v
            whole((batch, hkv, tpad)),       # side k scales
            whole((batch, hkv, tpad)),       # side v scales
            whole((batch, tpad)),            # side validity mask
        ]
    if has_qkv:
        in_specs += [
            whole((1, e_dim)),               # next attn norm
            pl.BlockSpec((e_dim, fblk), lambda j, n: (0, _jq(j))),  # wqkv
            pl.BlockSpec((1, fblk), lambda j, n: (0, _jq(j))),
        ]
    args = [
        x,
        qg,
        step_ctx["auxz"],
        step_ctx["cmask"],
        cache_k,
        cache_v,
        cache_ks.astype(jnp.float32),
        cache_vs.astype(jnp.float32),
        wo["q"],
        wo["s"].reshape(1, e_dim).astype(jnp.float32),
        norm_w.reshape(1, e_dim).astype(jnp.float32),
        wgu["q"],
        wgu["q"],
        wgu["s"].reshape(1, 2 * inter).astype(jnp.float32),
        wgu["s"].reshape(1, 2 * inter).astype(jnp.float32),
        wdn["q"],
        wdn["s"].reshape(1, e_dim).astype(jnp.float32),
    ]
    if side is not None:
        args += [
            side["k"], side["v"],
            side["ks"].astype(jnp.float32),
            side["vs"].astype(jnp.float32),
            side["mask"].astype(jnp.float32),
        ]
    if has_qkv:
        args += [
            next_attn_norm.reshape(1, e_dim).astype(jnp.float32),
            next_w_qkv["q"],
            next_w_qkv["s"].reshape(1, f_out).astype(jnp.float32),
        ]

    kernel = functools.partial(
        _mega_kernel,
        n_kv=n_kv,
        hkv=hkv,
        group=group,
        n_j=n_j,
        n_q=n_q,
        sm_scale=float(sm_scale),
        eps=eps,
        has_qkv=has_qkv,
        has_side=side is not None,
    )
    weight_bytes = (
        q_dim * e_dim + 3 * e_dim * inter + e_dim * f_out
    )
    cache_bytes = 2 * batch * hkv * s_max * (d + 4)
    flops = 2 * batch * (
        hq * s_max * d * 2  # attention
        + q_dim * e_dim + 3 * e_dim * inter + e_dim * f_out
    )

    if has_qkv:
        out_specs = (
            pl.BlockSpec((batch, e_dim), lambda j, n: (0, 0)),
            pl.BlockSpec((batch, fblk), lambda j, n: (0, _jq(j))),
        )
        out_shape = (
            jax.ShapeDtypeStruct((batch, e_dim), x.dtype),
            jax.ShapeDtypeStruct((batch, f_out), x.dtype),
        )
    else:
        out_specs = pl.BlockSpec((batch, e_dim), lambda j, n: (0, 0))
        out_shape = jax.ShapeDtypeStruct((batch, e_dim), x.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_total,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((batch, gp, NUM_LANES), jnp.float32),  # m
            pltpu.VMEM((batch, gp, NUM_LANES), jnp.float32),  # l
            pltpu.VMEM((batch, gp, d), jnp.float32),          # attn acc
            pltpu.VMEM((batch, e_dim), jnp.float32),          # x1 acc
            pltpu.VMEM((batch, e_dim), x.dtype),              # x1
            pltpu.VMEM((batch, e_dim), x.dtype),              # h
            pltpu.VMEM((batch, e_dim), jnp.float32),          # mlp acc
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=(
                64 * 1024 * 1024 if checks.tpu_generation() >= 5 else None
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=weight_bytes + cache_bytes,
            transcendentals=batch * (hq * s_max + inter),
        ),
        interpret=interpret,
    )(step_ctx["nblk"], *args)
    if has_qkv:
        return out
    return out, None
