"""Fused decoder-layer tail (ops/qmlp.py): interpret-mode parity vs the
unfused wo+residual+mlp_block composition, routing through
models/llama._layer_tail, and the trace-time gates."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantumattention_tpu import config
from quantumattention_tpu.models import llama, quantized
from quantumattention_tpu.ops import qmlp


def _mk_layer(key, e, inter, q_dim, dtype=jnp.float32):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    wg = quantized.quantize_matrix(jax.random.normal(k1, (e, inter)) / e**0.5)
    wu = quantized.quantize_matrix(jax.random.normal(k2, (e, inter)) / e**0.5)
    return {
        "wo": quantized.quantize_matrix(
            jax.random.normal(k3, (q_dim, e)) / q_dim**0.5
        ),
        "mlp_norm": jnp.abs(jax.random.normal(k4, (e,))) + 0.5,
        "w_gate_up": {
            "q": jnp.concatenate([wg["q"], wu["q"]], axis=-1),
            "s": jnp.concatenate([wg["s"], wu["s"]], axis=-1),
        },
        "w_down": quantized.quantize_matrix(
            jax.random.normal(k5, (inter, e)) / inter**0.5
        ),
    }


def _unfused(cfg, layer, x, attn_out):
    x = x + quantized.matmul("bsq,qe->bse", attn_out, layer["wo"])
    return llama.mlp_block(cfg, layer, x)


def _rel_rmse(got, want):
    g = got.astype(jnp.float32)
    w = want.astype(jnp.float32)
    return float(jnp.sqrt(jnp.mean((g - w) ** 2))) / (
        float(jnp.std(w)) + 1e-9
    )


@pytest.mark.parametrize(
    "m,e,inter,q_dim,dtype",
    [
        (16, 256, 512, 384, jnp.float32),   # decode shape class
        (16, 256, 512, 384, jnp.bfloat16),
        (9, 128, 384, 128, jnp.float32),    # ragged M -> row padding
        (32, 128, 256, 512, jnp.bfloat16),  # tiny-config widths
    ],
)
def test_fused_tail_matches_unfused(m, e, inter, q_dim, dtype):
    key = jax.random.PRNGKey(0)
    kx, ka, kl = jax.random.split(key, 3)
    layer = _mk_layer(kl, e, inter, q_dim)
    x = jax.random.normal(kx, (1, m, e)).astype(dtype)
    attn = jax.random.normal(ka, (1, m, q_dim)).astype(dtype)

    cfg = dataclasses.replace(llama.tiny(), rms_norm_eps=1e-5)
    want = _unfused(cfg, layer, x, attn)
    got = qmlp.fused_layer_tail(
        x[0], layer["mlp_norm"], layer["w_gate_up"], layer["w_down"],
        eps=cfg.rms_norm_eps, attn_out=attn[0], wo=layer["wo"],
        interpret=True,
    )
    assert got.shape == (m, e) and got.dtype == dtype
    # fp32: accumulation-order daylight only.  bf16: the einsum path
    # rounds each matmul's accumulator to bf16 BEFORE its fp32 scale
    # multiply, the kernel after — one-ulp daylight per matmul, three
    # matmuls deep (measured ~5.5e-3); the repo-wide oracle bar is 1e-2.
    tol = 1e-2 if dtype == jnp.bfloat16 else 5e-3
    assert _rel_rmse(got, want[0]) < tol


def test_fused_tail_without_wo():
    key = jax.random.PRNGKey(1)
    kx, kl = jax.random.split(key)
    layer = _mk_layer(kl, 128, 256, 128)
    x = jax.random.normal(kx, (16, 128), jnp.float32)
    cfg = llama.tiny()

    want = llama.mlp_block(cfg, layer, x[None])
    got = qmlp.fused_layer_tail(
        x, layer["mlp_norm"], layer["w_gate_up"], layer["w_down"],
        eps=cfg.rms_norm_eps, interpret=True,
    )
    assert _rel_rmse(got, want[0]) < 5e-3


def test_explicit_block_i():
    key = jax.random.PRNGKey(2)
    kx, ka, kl = jax.random.split(key, 3)
    layer = _mk_layer(kl, 128, 512, 128)
    x = jax.random.normal(kx, (8, 128), jnp.float32)
    attn = jax.random.normal(ka, (8, 128), jnp.float32)
    cfg = llama.tiny()
    want = _unfused(cfg, layer, x[None], attn[None])
    got = qmlp.fused_layer_tail(
        x, layer["mlp_norm"], layer["w_gate_up"], layer["w_down"],
        eps=cfg.rms_norm_eps, attn_out=attn, wo=layer["wo"],
        block_i=128, interpret=True,
    )
    assert _rel_rmse(got, want[0]) < 5e-3


def test_layer_tail_routing_force():
    """config.kernel.qmlp='force' routes llama._layer_tail through the
    kernel in interpret mode; result matches the unfused path."""
    cfg = llama.tiny()
    key = jax.random.PRNGKey(3)
    kx, ka, kl = jax.random.split(key, 3)
    layer = _mk_layer(kl, cfg.hidden_size, cfg.intermediate_size, cfg.q_dim)
    x = jax.random.normal(kx, (4, 1, cfg.hidden_size), jnp.float32)
    attn = jax.random.normal(ka, (4, 1, cfg.q_dim), jnp.float32)

    assert not qmlp.tail_supported(cfg, layer, x)  # interpret mode: off
    with config.patch({"kernel.qmlp": "force"}):
        assert qmlp.tail_supported(cfg, layer, x)
        got, qkv_next = llama._layer_tail(cfg, layer, x, attn)
    assert qkv_next is None  # no next layer given -> no fold
    want = _unfused(cfg, layer, x, attn)
    assert got.shape == want.shape
    assert _rel_rmse(got, want) < 5e-3


def test_tail_supported_gates():
    cfg = llama.tiny()
    layer = _mk_layer(
        jax.random.PRNGKey(4), cfg.hidden_size, cfg.intermediate_size,
        cfg.q_dim,
    )
    x = jnp.zeros((4, 1, cfg.hidden_size), jnp.float32)
    with config.patch({"kernel.qmlp": "force"}):
        assert qmlp.tail_supported(cfg, layer, x)
        # prefill regime: too many rows
        big = jnp.zeros((4, 512, cfg.hidden_size), jnp.float32)
        assert not qmlp.tail_supported(cfg, layer, big)
        # unfused tree
        unfused = dict(layer)
        del unfused["w_gate_up"]
        assert not qmlp.tail_supported(cfg, unfused, x)
        # full-precision wo
        fp = dict(layer)
        fp["wo"] = jnp.zeros((cfg.q_dim, cfg.hidden_size), jnp.float32)
        assert not qmlp.tail_supported(cfg, fp, x)
        # MoE configs never fuse
        moe_cfg = dataclasses.replace(cfg, num_experts=4)
        assert not qmlp.tail_supported(moe_cfg, layer, x)
        # integer activations
        assert not qmlp.tail_supported(
            cfg, layer, jnp.zeros((4, 1, cfg.hidden_size), jnp.int32)
        )
    assert not qmlp.tail_supported(cfg, layer, x)  # flag restored -> off


def test_model_logits_close_with_fused_tail():
    """Whole-model decode-shaped logits with the fused tail forced stay
    close to the unfused path (cross-path token comparisons are near-tie
    flaky on untrained weights — assert logits, not tokens)."""
    cfg = llama.tiny()
    params = quantized.fuse_projections(
        quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
    )
    tokens = jnp.array([[3, 1, 4, 1]], jnp.int32)  # 4 rows: decode regime

    def logits(flag):
        with config.patch({"kernel.qmlp": flag}):
            return llama.forward(params, tokens, cfg)

    got, want = logits("force"), logits(False)
    assert _rel_rmse(got, want) < 2e-2


def test_engine_runs_with_fused_tail_forced():
    """A tiny engine serves to completion with the fused tail forced
    (structural invariants only; see CLAUDE.md on cross-program token
    comparisons)."""
    from quantumattention_tpu.serving.engine import Engine

    cfg = llama.tiny()
    params = quantized.fuse_projections(
        quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
    )
    with config.patch({"kernel.qmlp": "force"}):
        eng = Engine(params, cfg, num_slots=2, max_len=64,
                     cache_dtype=jnp.bfloat16)
        reqs = [
            eng.submit([3, 1, 4, 1, 5, 9], max_new_tokens=4),
            eng.submit([2, 7, 1, 8], max_new_tokens=4),
        ]
        eng.run_to_completion()
    assert all(r.done and len(r.output) == 4 for r in reqs)
    assert all(0 <= t < cfg.vocab_size for r in reqs for t in r.output)


def test_fused_tail_qkv_fold():
    """The tail kernel's folded next-layer QKV output equals
    rms_norm(out) @ w_qkv of the unfused composition."""
    cfg = llama.tiny()
    key = jax.random.PRNGKey(5)
    kx, ka, kl, kq = jax.random.split(key, 4)
    e, q_dim, f = cfg.hidden_size, cfg.q_dim, cfg.q_dim + 2 * cfg.kv_dim
    layer = _mk_layer(kl, e, cfg.intermediate_size, q_dim)
    w_qkv = quantized.quantize_matrix(
        jax.random.normal(kq, (e, f)) / e**0.5
    )
    anorm = jnp.abs(jax.random.normal(kq, (e,))) + 0.5
    x = jax.random.normal(kx, (1, 8, e), jnp.float32)
    attn = jax.random.normal(ka, (1, 8, q_dim), jnp.float32)

    from quantumattention_tpu.ops import qmlp as qmlp_mod

    y, qkv = qmlp_mod.fused_layer_tail(
        x[0], layer["mlp_norm"], layer["w_gate_up"], layer["w_down"],
        eps=cfg.rms_norm_eps, attn_out=attn[0], wo=layer["wo"],
        next_attn_norm=anorm, next_w_qkv=w_qkv, interpret=True,
    )
    want_y = _unfused(cfg, layer, x, attn)[0]
    h = llama.rms_norm(want_y, anorm, cfg.rms_norm_eps)
    want_qkv = quantized.matmul("me,ef->mf", h, w_qkv)
    assert _rel_rmse(y, want_y) < 5e-3
    assert _rel_rmse(qkv, want_qkv) < 5e-3
    # gate helper
    nxt = {"attn_norm": anorm, "w_qkv": w_qkv}
    with config.patch({"kernel.qmlp": "force"}):
        assert qmlp_mod.qkv_fold_supported(cfg, layer, nxt, x)
        assert not qmlp_mod.qkv_fold_supported(cfg, layer, None, x)
        assert not qmlp_mod.qkv_fold_supported(
            cfg, layer, {"attn_norm": anorm}, x
        )
