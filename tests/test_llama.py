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


def test_prefill_last_pos_matches_full_logits(params, tokens):
    """forward_prefill(last_pos=...) must return exactly the row the full
    head computes at that position, and identical K/V (the engine samples
    first tokens from it; the full-sequence LM head is prefill's biggest
    matmul, so the row-gathered variant is the serving path)."""
    full_logits, full_kv = llama.forward_prefill(params, tokens, CFG)
    last = jnp.asarray([95, 40], jnp.int32)
    row_logits, row_kv = llama.forward_prefill(
        params, tokens, CFG, last_pos=last
    )
    assert row_logits.shape == (2, CFG.vocab_size)
    want = jnp.stack([full_logits[0, 95], full_logits[1, 40]])
    np.testing.assert_allclose(
        np.asarray(row_logits, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    # The argmax (what the engine actually consumes) must agree exactly.
    assert jnp.argmax(row_logits, -1).tolist() == jnp.argmax(want, -1).tolist()
    for (k1, v1), (k2, v2) in zip(full_kv, row_kv):
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


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


def test_qwen_style_qkv_bias():
    """QKV-bias config (Qwen2 family) works through all three forwards and
    the engine."""
    from quantumattention_tpu.serving.engine import Engine

    cfg = dataclasses.replace(
        CFG, qkv_bias=True, attention_impl="bf16"
    )
    params = llama.init_params(jax.random.PRNGKey(3), cfg)
    assert "bq" in params["layers"][0]
    tokens = jax.random.randint(jax.random.PRNGKey(4), (1, 64), 0, cfg.vocab_size)
    # Zero-init biases: must match the no-bias model numerically.
    cfg_nb = dataclasses.replace(cfg, qkv_bias=False)
    params_nb = {
        "embed": params["embed"],
        "final_norm": params["final_norm"],
        "lm_head": params["lm_head"],
        "layers": [
            {k: v for k, v in lyr.items() if k not in ("bq", "bk", "bv")}
            for lyr in params["layers"]
        ],
    }
    out = llama.forward(params, tokens, cfg)
    ref = llama.forward(params_nb, tokens, cfg_nb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # Nonzero bias changes the result.
    params["layers"][0]["bq"] = params["layers"][0]["bq"] + 0.5
    out2 = llama.forward(params, tokens, cfg)
    assert np.abs(np.asarray(out2) - np.asarray(ref)).max() > 1e-3
    # Engine roundtrip.
    eng = Engine(params, cfg, num_slots=1, max_len=128, cache_dtype=jnp.bfloat16)
    req = eng.submit([1, 2, 3], max_new_tokens=2)
    eng.run_to_completion()
    assert req.done and len(req.output) == 2


def test_mistral_window_preset():
    cfg = llama.mistral_7b()
    assert cfg.window == 4096
    assert llama.qwen2_7b().qkv_bias


def test_train_step_sharded_70b_attention_shapes():
    """BASELINE config 5: 70B-like attention shapes (64 q-heads / 8 kv) on
    the virtual mesh — scaled-down layers/seq to keep CPU runtime sane."""
    from quantumattention_tpu.parallel import mesh as qmesh

    cfg = llama.llama3_70b(
        num_layers=1,
        vocab_size=512,
        hidden_size=512,
        intermediate_size=1024,
        head_dim=64,
        attention_impl="bf16",
    )
    params = llama.init_params(jax.random.PRNGKey(5), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(6), (2, 64), 0, cfg.vocab_size)
    m = qmesh.make_mesh((2, 4), ("dp", "tp"))
    sharded = qmesh.shard_params(params, m, qmesh.llama_param_specs(cfg))
    tok = jax.device_put(
        tokens, jax.sharding.NamedSharding(m, qmesh.batch_spec())
    )
    _, loss = jax.jit(lambda p, t: llama.train_step(p, t, cfg))(sharded, tok)
    assert np.isfinite(float(loss))


def test_checkpoint_roundtrip(params, tokens, tmp_path):
    from quantumattention_tpu.models import io as mio

    path = tmp_path / "ckpt.npz"
    mio.save_params(params, path)
    template = llama.init_params(jax.random.PRNGKey(99), CFG)  # different values
    restored = mio.load_params(template, path)
    out_a = llama.forward(params, tokens, CFG)
    out_b = llama.forward(restored, tokens, CFG)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    # Missing key / wrong shape errors.
    import pytest as _pytest

    bad_template = llama.init_params(
        jax.random.PRNGKey(0), dataclasses.replace(CFG, hidden_size=64)
    )
    with _pytest.raises((KeyError, ValueError)):
        mio.load_params(bad_template, path)
