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


def _assert_trees_match(direct, via_full):
    """Same tree up to jit-vs-eager fp rounding: float leaves match to
    1e-5 relative; int8 codes may flip by exactly 1 at round-to-nearest
    boundaries (the ~1e-7 scale wobble moves w/s across .5) on a tiny
    fraction of entries."""
    leaves_d, treedef_d = jax.tree_util.tree_flatten(direct)
    leaves_f, treedef_f = jax.tree_util.tree_flatten(via_full)
    assert treedef_d == treedef_f
    for a, b in zip(leaves_d, leaves_f):
        assert a.dtype == b.dtype and a.shape == b.shape
        an, bn = np.asarray(a), np.asarray(b)
        if an.dtype == np.int8:
            diff = np.abs(an.astype(np.int16) - bn.astype(np.int16))
            assert diff.max() <= 1
            assert (diff != 0).mean() < 0.01
        else:
            np.testing.assert_allclose(
                an.astype(np.float64), bn.astype(np.float64),
                rtol=1e-5, atol=1e-9,
            )


def test_init_quantized_params_matches_quantize_of_init(params):
    """init_quantized_params must produce the same tree as quantizing the
    full-precision init (same key schedule, same math) — it only changes
    peak memory, not semantics."""
    direct = quantized.init_quantized_params(jax.random.PRNGKey(0), CFG)
    _assert_trees_match(direct, quantized.quantize_params(params))


def test_init_quantized_params_variants():
    """Tied embeddings, qkv bias, and MoE trees all build and forward."""
    for cfg in [
        llama.tiny(attention_impl="sdpa", dtype=jnp.float32,
                   tie_embeddings=True),
        llama.tiny(attention_impl="sdpa", dtype=jnp.float32, qkv_bias=True),
        llama.tiny(attention_impl="sdpa", dtype=jnp.float32, num_experts=4,
                   capacity_factor=4.0),
    ]:
        qp = quantized.init_quantized_params(jax.random.PRNGKey(1), cfg)
        ref = quantized.quantize_params(
            llama.init_params(jax.random.PRNGKey(1), cfg)
        )
        _assert_trees_match(qp, ref)
        logits = llama.forward(qp, jnp.asarray([[1, 2, 3]], jnp.int32), cfg)
        assert bool(jnp.all(jnp.isfinite(logits.astype(jnp.float32))))


def test_fuse_projections_forward_matches(params):
    """Fused [wq|wk|wv] / [gate|up] trees compute the same logits: each
    output channel's contraction is independent, so concatenation does
    not change any reduction order."""
    qparams = quantized.quantize_params(params)
    fused = quantized.fuse_projections(qparams)
    layer = fused["layers"][0]
    assert "w_qkv" in layer and "wq" not in layer
    assert "w_gate_up" in layer and "w_gate" not in layer
    tokens = jnp.asarray([[3, 17, 42, 99, 7, 23]], jnp.int32)
    a = llama.forward(qparams, tokens, CFG).astype(jnp.float32)
    b = llama.forward(fused, tokens, CFG).astype(jnp.float32)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-4


def test_fuse_projections_qkv_bias():
    cfg = llama.tiny(attention_impl="sdpa", dtype=jnp.float32, qkv_bias=True)
    p = quantized.quantize_params(llama.init_params(jax.random.PRNGKey(5), cfg))
    fused = quantized.fuse_projections(p)
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    a = llama.forward(p, tokens, cfg).astype(jnp.float32)
    b = llama.forward(fused, tokens, cfg).astype(jnp.float32)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-4


def test_fused_tree_serves(params):
    from quantumattention_tpu.serving.engine import Engine

    fused = quantized.fuse_projections(quantized.quantize_params(params))
    eng = Engine(fused, CFG, num_slots=1, max_len=128,
                 cache_dtype=jnp.int8)
    r = eng.submit([5, 9, 23], max_new_tokens=5)
    eng.run_to_completion(decode_burst=4)
    assert r.done and len(r.output) == 5


def test_fused_tree_rejected_by_tp_specs(params):
    from quantumattention_tpu.parallel import mesh as qmesh

    fused = quantized.fuse_projections(quantized.quantize_params(params))
    with pytest.raises(ValueError, match="fused projection"):
        qmesh.param_specs_for(fused, CFG)


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
