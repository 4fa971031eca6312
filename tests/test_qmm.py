"""w8a16 Pallas matmul (ops/qmm.py): interpret-mode parity vs the einsum
path, shape gating, and the routing through models/quantized.matmul."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantumattention_tpu.models import quantized
from quantumattention_tpu.ops import qmm


def _einsum_ref(x, wq, s):
    y = jnp.einsum("mk,kn->mn", x, wq.astype(x.dtype))
    return (y.astype(jnp.float32) * s.reshape(1, -1)).astype(x.dtype)


@pytest.mark.parametrize(
    "m,k,n,dtype",
    [
        (16, 512, 512, jnp.bfloat16),   # decode shape class
        (33, 256, 384, jnp.float32),    # ragged M -> row padding
        (128, 1024, 256, jnp.bfloat16),
        (8, 128, 128, jnp.float32),     # minimum tiles
    ],
)
def test_qmm_matches_einsum(m, k, n, dtype):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (m, k), dtype)
    w = quantized.quantize_matrix(jax.random.normal(k2, (k, n), jnp.float32))
    got = qmm.quantized_matmul(x, w["q"], w["s"], interpret=True)
    want = _einsum_ref(x, w["q"], w["s"])
    assert got.shape == (m, n) and got.dtype == dtype
    err = float(
        jnp.sqrt(jnp.mean((got.astype(jnp.float32) - want.astype(jnp.float32)) ** 2))
    )
    denom = float(jnp.std(want.astype(jnp.float32))) + 1e-9
    # fp32-accumulated kernel vs einsum (bf16 intermediate on the einsum
    # side) — tiny rounding daylight only.
    assert err / denom < 5e-3, err / denom


def test_qmm_explicit_blocks():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (16, 1024), jnp.bfloat16)
    w = quantized.quantize_matrix(jax.random.normal(k2, (1024, 512), jnp.float32))
    got = qmm.quantized_matmul(
        x, w["q"], w["s"], block_m=16, block_n=128, block_k=256,
        interpret=True,
    )
    want = _einsum_ref(x, w["q"], w["s"])
    # bf16 one-ulp daylight only: the einsum path rounds its fp32
    # accumulator to bf16 BEFORE the scale multiply, the kernel after.
    diff = jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))
    rel = float(jnp.max(diff / (jnp.abs(want.astype(jnp.float32)) + 1.0)))
    assert rel < 8e-3, rel


def test_qmm_supported_gates():
    x = jnp.zeros((4, 512), jnp.bfloat16)
    w = jnp.zeros((512, 512), jnp.int8)
    assert qmm.supported(x, w)
    assert not qmm.supported(x, w.astype(jnp.bfloat16))  # not int8
    assert not qmm.supported(jnp.zeros((4, 500), jnp.bfloat16),
                             jnp.zeros((500, 512), jnp.int8))  # K % 128
    assert not qmm.supported(x, jnp.zeros((512, 130), jnp.int8))  # N % 128
    assert not qmm.supported(x.astype(jnp.int8), w)  # x must be float


def test_quantized_matmul_routes_through_kernel():
    """use_kernel=True forces the qmm path (interpret mode under the
    hood on CPU) and must agree with the einsum path, including the
    leading-batch reshape."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (2, 5, 256), jnp.float32)
    w = quantized.quantize_matrix(jax.random.normal(k2, (256, 384), jnp.float32))
    got = quantized.matmul("bse,eo->bso", x, w, use_kernel=True)
    want = quantized.matmul("bse,eo->bso", x, w, use_kernel=False)
    assert got.shape == want.shape == (2, 5, 384)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-3


def test_quantized_matmul_kernel_fallbacks():
    """Patterns the kernel does not implement silently keep the einsum
    path even when forced: 3-D expert stacks and transposed contractions."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (4, 8, 128), jnp.float32)
    experts = quantized.quantize_matrix(
        jax.random.normal(k2, (2, 128, 256), jnp.float32)
    )
    out = quantized.matmul("ets,eso->eto", x[:2], experts, use_kernel=True)
    ref = quantized.matmul("ets,eso->eto", x[:2], experts, use_kernel=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # Odd K: supported() rejects, einsum result returned.
    w_odd = quantized.quantize_matrix(
        jax.random.normal(k2, (100, 256), jnp.float32)
    )
    x_odd = jax.random.normal(k1, (3, 100), jnp.float32)
    out2 = quantized.matmul("me,eo->mo", x_odd, w_odd, use_kernel=True)
    ref2 = quantized.matmul("me,eo->mo", x_odd, w_odd, use_kernel=False)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref2))