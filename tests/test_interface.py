"""Interface-level parity grid (mirrors reference tests/test_interface.py).

The reference's test matrix: seeded randn inputs, ragged-tail sequence
lengths, head dims {64, 128, 256}, causal on/off, fp16/bf16 and FP8 paths,
RMSE < 1e-2 vs the flash-SDPA oracle, unsupported combos skipped via the
dispatcher's ValueError (reference tests/test_interface.py:31-87).
Sequence lengths are scaled down (1024/999 -> 512/499) to keep CPU
interpret-mode runtime sane; the shapes still cross block boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quantumattention_tpu as qa
from quantumattention_tpu import config
from quantumattention_tpu.ops.sdpa import sdpa_reference

RMSE_TOL = 1e-2  # reference tests/test_interface.py:57-59


def rmse(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def make_qkv(b, h, sq, skv, d, dtype, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (b, h, sq, d), jnp.float32).astype(dtype)
    k = jax.random.normal(k2, (b, h, skv, d), jnp.float32).astype(dtype)
    v = jax.random.normal(k3, (b, h, skv, d), jnp.float32).astype(dtype)
    return q, k, v


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16])
@pytest.mark.parametrize("sq,skv", [(512, 512), (512, 499)])
@pytest.mark.parametrize("d", [64, 128, 256])
@pytest.mark.parametrize("is_causal", [False, True])
def test_attn_func_grid(dtype, sq, skv, d, is_causal):
    if is_causal and sq != skv:
        pytest.skip("causal + rectangular skipped (reference parity :32-33)")
    q, k, v = make_qkv(2, 8, sq, skv, d, dtype)
    # Strict: every combo in this grid is supported; a ValueError here is a
    # capability REGRESSION and must fail loudly (the reference's
    # skip-on-ValueError pattern, :50-53, can mask exactly that).
    out = qa.attn_func(q, k, v, is_causal=is_causal)
    ref = sdpa_reference(q, k, v, is_causal=is_causal)
    assert rmse(out, ref) < RMSE_TOL


@pytest.mark.parametrize("scaling", ["head-wise", "token-wise"])
@pytest.mark.parametrize("sq,skv", [(512, 512), (512, 500)])
@pytest.mark.parametrize("d", [64, 256])
@pytest.mark.parametrize("is_causal", [False, True])
def test_fp8_attn_func_grid(scaling, sq, skv, d, is_causal):
    if is_causal and sq != skv:
        pytest.skip("causal + rectangular skipped (reference parity)")
    q, k, v = make_qkv(1, 8, sq, skv, d, jnp.bfloat16, seed=1)
    # Strict: see test_attn_func_grid — no skip-on-ValueError masking.
    out = qa.fp8_attn_func(
        q, k, v, is_causal=is_causal, scaling_method=scaling
    )
    ref = sdpa_reference(q, k, v, is_causal=is_causal)
    assert rmse(out, ref) < RMSE_TOL


def test_fallback_routes_unsupported_to_sdpa():
    """attn_mask is unsupported by the fused path; the fallback must serve
    it (reference quantum_attn_interface.py:62-98 contract)."""
    q, k, v = make_qkv(1, 4, 256, 256, 64, jnp.bfloat16)
    mask = jnp.tril(jnp.ones((256, 256), bool))[None, None]
    with pytest.raises(ValueError):
        qa.attn_func(q, k, v, mask)
    out = qa.attn_func_with_fallback(q, k, v, mask)
    ref = sdpa_reference(q, k, v, attn_mask=mask)
    assert rmse(out, ref) < RMSE_TOL


def test_force_fallback_config():
    q, k, v = make_qkv(1, 4, 256, 256, 64, jnp.bfloat16)
    with config.patch({"attention.force_fallback": True}):
        ok, reason = qa.can_use_attention(q, k, v)
        assert not ok and "force_fallback" in reason
        out = qa.attn_func_with_fallback(q, k, v)
    ref = sdpa_reference(q, k, v)
    assert rmse(out, ref) < RMSE_TOL


def test_reason_strings_are_bracketed():
    """Failed dispatch must self-explain (reference nn.py:299-307)."""
    q, k, v = make_qkv(1, 4, 256, 256, 64, jnp.bfloat16)
    ok, reason = qa.can_use_attention(q, k, v, dropout_p=0.5)
    assert not ok
    assert reason.startswith("[pallas:") and "dropout" in reason


def test_pre_quantized_inputs_roundtrip():
    """User-supplied scales (reference fp8 op signature ops.py:98-147)."""
    q, k, v = make_qkv(1, 4, 256, 256, 64, jnp.float32, seed=2)
    q8, sq = qa.dynamically_quantize_fp8(q, reduction_dim=(-2, -1))
    k8, sk = qa.dynamically_quantize_fp8(k, reduction_dim=(-2, -1))
    out = qa.fp8_attn_func(
        q8, k8, v.astype(jnp.bfloat16), scale_q=sq, scale_k=sk
    )
    ref = sdpa_reference(q8, k8, v, scale_q=sq, scale_k=sk)
    assert rmse(out, ref) < RMSE_TOL
