"""Weight-only int8 quantization (w8a16): accuracy, engine integration,
and the helper's exact semantics.

Beyond the reference (kernel library) — the serving enabler that fits
8B-class weights on one 16 GB chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantumattention_tpu.models import llama, moe, quantized

CFG = llama.tiny(attention_impl="sdpa", dtype=jnp.float32)


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), CFG)


def test_matmul_matches_dequantized_einsum():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (2, 5, 32), jnp.float32)
    w = jax.random.normal(k2, (32, 48), jnp.float32)
    wq = quantized.quantize_matrix(w)
    got = quantized.matmul("bse,eo->bso", x, wq)
    wdq = wq["q"].astype(jnp.float32) * wq["s"]
    want = jnp.einsum("bse,eo->bso", x, wdq)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-4


def test_quantized_forward_close(params):
    tokens = jnp.asarray([[3, 17, 42, 99, 7, 23]], jnp.int32)
    full = llama.forward(params, tokens, CFG).astype(jnp.float32)
    qparams = quantized.quantize_params(params)
    qlog = llama.forward(qparams, tokens, CFG).astype(jnp.float32)
    rel = float(
        jnp.sqrt(jnp.mean((qlog - full) ** 2)) / jnp.std(full)
    )
    # Per-output-channel int8 weights typically land ~1% relative error.
    assert rel < 0.05, rel


def test_quantized_moe_forward_close():
    cfg = llama.tiny(
        attention_impl="sdpa", dtype=jnp.float32, num_experts=4,
        capacity_factor=4.0,
    )
    params = llama.init_params(jax.random.PRNGKey(2), cfg)
    tokens = jnp.asarray([[1, 2, 3, 4, 5]], jnp.int32)
    full = llama.forward(params, tokens, cfg).astype(jnp.float32)
    qlog = llama.forward(
        quantized.quantize_params(params), tokens, cfg
    ).astype(jnp.float32)
    rel = float(jnp.sqrt(jnp.mean((qlog - full) ** 2)) / jnp.std(full))
    assert rel < 0.05, rel


def test_quantized_tied_embeddings(params):
    cfg = llama.tiny(
        attention_impl="sdpa", dtype=jnp.float32, tie_embeddings=True
    )
    p = llama.init_params(jax.random.PRNGKey(3), cfg)
    tokens = jnp.asarray([[4, 9, 2]], jnp.int32)
    full = llama.forward(p, tokens, cfg).astype(jnp.float32)
    qlog = llama.forward(
        quantized.quantize_params(p), tokens, cfg
    ).astype(jnp.float32)
    rel = float(jnp.sqrt(jnp.mean((qlog - full) ** 2)) / jnp.std(full))
    assert rel < 0.05, rel


def test_engine_with_quantized_weights(params):
    from quantumattention_tpu.serving.engine import Engine

    qparams = quantized.quantize_params(params)
    full_eng = Engine(params, CFG, num_slots=1, max_len=128,
                      cache_dtype=jnp.bfloat16)
    fr = full_eng.submit([5, 9, 23], max_new_tokens=5)
    full_eng.run_to_completion()

    qeng = Engine(qparams, CFG, num_slots=1, max_len=128,
                  cache_dtype=jnp.bfloat16)
    qr = qeng.submit([5, 9, 23], max_new_tokens=5)
    qeng.run_to_completion()
    assert len(qr.output) == 5
    # ~1% weight noise: most tokens still agree on a short horizon.
    agree = sum(a == b for a, b in zip(qr.output, fr.output))
    assert agree >= 3, (qr.output, fr.output)


def test_quantized_memory_halves(params):
    def nbytes(tree):
        return sum(
            x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(tree)
        )

    full = nbytes(params)
    q = nbytes(quantized.quantize_params(params))
    # fp32 test weights -> int8 is ~4x smaller (plus small scale/norm
    # overhead); assert at least 2.5x to stay robust.
    assert q * 2.5 < full, (q, full)
