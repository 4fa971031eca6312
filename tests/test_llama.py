"""End-to-end model tests: the Llama-style flagship slice.

Checks that the fused-attention model agrees with the same model running on
the SDPA oracle path (the model-level differential analogue of the
reference's kernel-level RMSE tests), that training steps are finite, and
that tp/dp sharding compiles and runs on the virtual 8-device CPU mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantumattention_tpu.models import llama
from quantumattention_tpu.parallel import mesh as qmesh

CFG = llama.tiny()


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def tokens():
    return jax.random.randint(jax.random.PRNGKey(1), (2, 96), 0, CFG.vocab_size)


def test_forward_impls_agree(params, tokens):
    outs = {}
    for impl in ("fp8", "bf16", "sdpa"):
        cfg = dataclasses.replace(CFG, attention_impl=impl)
        outs[impl] = np.asarray(llama.forward(params, tokens, cfg))
    assert np.isfinite(outs["sdpa"]).all()
    # bf16 fused vs oracle: tight.
    np.testing.assert_allclose(outs["bf16"], outs["sdpa"], atol=0.1, rtol=0.05)
    # fp8 vs oracle: quantization noise allowed, logits still close.
    err = np.abs(outs["fp8"] - outs["sdpa"]).max() / (
        np.abs(outs["sdpa"]).max() + 1e-9
    )
    assert err < 0.1


def test_sliding_window_model(params, tokens):
    cfg = dataclasses.replace(CFG, attention_impl="bf16", window=32)
    ref_cfg = dataclasses.replace(CFG, attention_impl="sdpa", window=32)
    out = np.asarray(llama.forward(params, tokens, cfg))
    ref = np.asarray(llama.forward(params, tokens, ref_cfg))
    np.testing.assert_allclose(out, ref, atol=0.1, rtol=0.05)


def test_train_step_finite(params, tokens):
    cfg = dataclasses.replace(CFG, attention_impl="bf16")
    new_params, loss = llama.train_step(params, tokens, cfg)
    assert np.isfinite(float(loss))
    leaf = new_params["layers"][0]["wq"]
    assert np.isfinite(np.asarray(leaf, np.float32)).all()


def test_train_step_sharded_dp_tp(params, tokens):
    """jit the full train step over a (dp=2, tp=4) mesh."""
    cfg = dataclasses.replace(CFG, attention_impl="bf16")
    m = qmesh.make_mesh((2, 4), ("dp", "tp"))
    specs = qmesh.llama_param_specs(cfg)
    sharded = qmesh.shard_params(params, m, specs)
    tok = jax.device_put(
        tokens, jax.sharding.NamedSharding(m, qmesh.batch_spec())
    )

    step = jax.jit(
        lambda p, t: llama.train_step(p, t, cfg),
    )
    with jax.sharding.use_mesh(m) if hasattr(jax.sharding, "use_mesh") else m:
        new_params, loss = step(sharded, tok)
    assert np.isfinite(float(loss))
    assert np.isfinite(
        np.asarray(new_params["layers"][0]["wq"], np.float32)
    ).all()
