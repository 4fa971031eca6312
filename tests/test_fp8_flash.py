"""FP8/int8 fused-attention differential tests.

The numerical-semantics oracle is dequantize-then-SDPA, exactly as the
reference defines its FP8 op (reference: src/quantum_attn/ops.py:64-95);
accuracy bar RMSE < 1e-2 vs the *unquantized* fp32 oracle, matching
tests/test_interface.py:57-59 at the same 8-bit width.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantumattention_tpu.ops import quant
from quantumattention_tpu.ops.flash import flash_attention
from quantumattention_tpu.ops.sdpa import sdpa_reference

RMSE_TOL = 1e-2


def rmse(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def make_qkv(batch, hq, hkv, sq, skv, d, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (batch, hq, sq, d), jnp.float32)
    k = jax.random.normal(k2, (batch, hkv, skv, d), jnp.float32)
    v = jax.random.normal(k3, (batch, hkv, skv, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("is_causal", [False, True])
@pytest.mark.parametrize("scaling", ["head", "token"])
def test_fp8_flash_vs_fp32_oracle(is_causal, scaling):
    q, k, v = make_qkv(2, 4, 4, 512, 512, 64)
    if scaling == "head":
        q8, sq = quant.quantize_head_wise(q)
        k8, sk = quant.quantize_head_wise(k)
    else:
        q8, sq = quant.quantize_token_wise(q)
        k8, sk = quant.quantize_token_wise(k)
    out = flash_attention(
        q8,
        k8,
        v.astype(jnp.bfloat16),
        scale_q=sq,
        scale_k=sk,
        is_causal=is_causal,
        block_q=128,
        block_kv=128,
    )
    ref = sdpa_reference(q, k, v, is_causal=is_causal)
    assert rmse(out, ref) < RMSE_TOL


def test_fp8_flash_matches_dequant_semantics():
    # The fused op must match dequantize-then-SDPA *tightly* (same math,
    # different blocking), not just the loose fp32 oracle bar.
    q, k, v = make_qkv(1, 2, 2, 256, 384, 128, seed=3)
    q8, sq = quant.quantize_token_wise(q)
    k8, sk = quant.quantize_token_wise(k)
    out = flash_attention(
        q8, k8, v.astype(jnp.bfloat16), scale_q=sq, scale_k=sk,
        block_q=128, block_kv=128,
    )
    ref = sdpa_reference(q8, k8, v, scale_q=sq, scale_k=sk)
    assert rmse(out, ref) < 3e-3


def test_fp8_gqa_tokenwise_ragged():
    q, k, v = make_qkv(1, 8, 2, 250, 999, 64, seed=5)
    q8, sq = quant.quantize_token_wise(q)
    k8, sk = quant.quantize_token_wise(k)
    out = flash_attention(
        q8, k8, v.astype(jnp.bfloat16), scale_q=sq, scale_k=sk,
        block_q=128, block_kv=128,
    )
    ref = sdpa_reference(q, k, v)
    assert rmse(out, ref) < RMSE_TOL


@pytest.mark.parametrize("scaling", ["head", "token"])
def test_int8_flash_vs_fp32_oracle(scaling):
    q, k, v = make_qkv(2, 4, 4, 512, 512, 128, seed=7)
    qdt = jnp.int8
    if scaling == "head":
        q8, sq = quant.quantize_head_wise(q, qdt)
        k8, sk = quant.quantize_head_wise(k, qdt)
    else:
        q8, sq = quant.quantize_token_wise(q, qdt)
        k8, sk = quant.quantize_token_wise(k, qdt)
    out = flash_attention(
        q8, k8, v.astype(jnp.bfloat16), scale_q=sq, scale_k=sk,
        is_causal=True, block_q=128, block_kv=128,
    )
    ref = sdpa_reference(q, k, v, is_causal=True)
    assert rmse(out, ref) < RMSE_TOL


def test_fp8_v_dtype():
    # fp8 V is beyond the reference (its V must stay fp16/bf16): KV-cache
    # storage path. Output must come back bf16.
    q, k, v = make_qkv(1, 2, 2, 256, 256, 64, seed=9)
    q8, sq = quant.quantize_head_wise(q)
    k8, sk = quant.quantize_head_wise(k)
    v8 = jnp.clip(v, -448, 448).astype(jnp.float8_e4m3fn)
    out = flash_attention(
        q8, k8, v8, scale_q=sq, scale_k=sk, block_q=128, block_kv=128
    )
    assert out.dtype == jnp.bfloat16
    ref = sdpa_reference(q, k, v)
    assert rmse(out, ref) < RMSE_TOL
