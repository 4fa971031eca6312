"""Quantizer unit tests (the reference has none — SURVEY.md §4 gap-fill)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantumattention_tpu.ops import quant


def test_fp8_quantize_roundtrip_tokenwise():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 64, 32), jnp.float32)
    x8, scale = quant.dynamically_quantize_fp8(x, reduction_dim=-1)
    assert x8.dtype == jnp.float8_e4m3fn
    assert scale.shape == (2, 4, 64)
    assert scale.dtype == jnp.float32
    x_back = quant.dequantize(x8, scale)
    # e4m3 has ~2 decimal digits; relative error should be small.
    rel = np.abs(np.asarray(x_back - x)) / (np.abs(np.asarray(x)) + 1e-3)
    assert np.mean(rel) < 0.05


def test_fp8_quantize_headwise_shape():
    x = jnp.ones((2, 4, 64, 32), jnp.float32) * 10.0
    x8, scale = quant.quantize_head_wise(x)
    assert scale.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(scale), 10.0 / 448.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(quant.dequantize(x8, scale)), 10.0, rtol=1e-2
    )


def test_scale_clamped_to_eps():
    x = jnp.zeros((1, 1, 8, 8), jnp.float32)
    _, scale = quant.quantize_head_wise(x)
    assert float(scale[0, 0]) == quant.SCALE_EPS


def test_int8_quantize():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 64, 32), jnp.float32)
    x8, scale = quant.dynamically_quantize_int8(x, reduction_dim=-1)
    assert x8.dtype == jnp.int8
    assert int(jnp.max(jnp.abs(x8.astype(jnp.int32)))) <= 127
    x_back = quant.dequantize(x8, scale)
    rel = np.abs(np.asarray(x_back - x)) / (np.abs(np.asarray(x)) + 1e-3)
    assert np.mean(rel) < 0.05


def test_clip_saturates_extremes():
    x = jnp.array([[[[1e9, -1e9, 0.5, -0.5]]]], jnp.float32)
    x8, scale = quant.dynamically_quantize_fp8(x, reduction_dim=-1)
    back = quant.dequantize(x8, scale)
    np.testing.assert_allclose(np.asarray(back[..., :2]), [[[[1e9, -1e9]]]], rtol=1e-2)
