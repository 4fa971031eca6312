"""MoE FFN + expert parallelism tests.

Differential-oracle pattern of the suite: the sparse MoE layer is checked
against closed-form equivalents (identical experts == dense SwiGLU; gate
renormalization; Switch aux-loss value under uniform routing), and the
expert-parallel path is checked for exact agreement with the single-device
layer on the virtual 8-device mesh (no reference analogue — the reference
is single-GPU with no MoE, SURVEY.md §2.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantumattention_tpu.models import llama, moe
from quantumattention_tpu.parallel import ep, mesh as mesh_lib


def _params(key, e=8, h=64, i=128, dtype=jnp.float32):
    return moe.init_moe_params(key, h, i, e, dtype=dtype)


def _dense_swiglu(w_gate, w_up, w_down, x):
    gate = x @ w_gate
    up = x @ w_up
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    return act @ w_down


def test_router_topk_gates_renormalized():
    logits = jax.random.normal(jax.random.PRNGKey(0), (32, 8))
    gates, experts = moe.router_topk(logits, 2)
    assert gates.shape == (32, 2) and experts.shape == (32, 2)
    np.testing.assert_allclose(np.sum(gates, axis=-1), 1.0, rtol=1e-6)
    # Chosen experts are distinct and ordered by logit.
    assert np.all(experts[:, 0] != experts[:, 1])


def test_dispatch_combine_shapes_and_conservation():
    n, e, k, cap = 64, 8, 2, 32
    logits = jax.random.normal(jax.random.PRNGKey(1), (n, e))
    gates, experts = moe.router_topk(logits, k)
    dispatch, combine = moe.make_dispatch_combine(gates, experts, e, cap)
    assert dispatch.shape == (n, e, cap)
    assert combine.shape == (n, e, cap)
    d = np.asarray(dispatch, np.float32)
    # Every expert slot holds at most one token.
    assert d.sum(axis=0).max() <= 1.0 + 1e-6
    # No token dispatched more than k times; combine weights <= its gates.
    assert d.sum(axis=(1, 2)).max() <= k + 1e-6
    c = np.asarray(combine).sum(axis=(1, 2))
    assert np.all(c <= 1.0 + 1e-5)


def test_identical_experts_equal_dense_mlp():
    """With every expert holding the same weights and no token dropped,
    renormalized top-k gating makes the MoE equal the dense SwiGLU."""
    key = jax.random.PRNGKey(2)
    p = _params(key)
    for name in ("w_gate", "w_up", "w_down"):
        p[name] = jnp.broadcast_to(p[name][:1], p[name].shape)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 16, 64))
    y = moe.moe_ffn(p, x, num_experts_per_tok=2, capacity_factor=8.0)
    ref = _dense_swiglu(p["w_gate"][0], p["w_up"][0], p["w_down"][0], x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_capacity_dropping_zeroes_overflow():
    """With capacity 8 and all tokens routed to one expert (rigged router),
    only the first 8 tokens produce output; later ones are dropped."""
    p = _params(jax.random.PRNGKey(4), e=4)
    # Router forced: expert 0 wins by a mile, expert 1 second.
    p["w_router"] = jnp.zeros_like(p["w_router"]).at[0, 0].set(100.0).at[
        0, 1
    ].set(50.0)
    n = 32
    x = jnp.ones((n, 64)) * 0.1  # x[:, 0] > 0 drives the router
    y, aux = moe.moe_ffn(
        p, x, num_experts_per_tok=2, capacity_factor=8 * 4 / (2 * n),
        return_aux=True,
    )
    assert y.shape == (n, 64)
    y = np.asarray(y)
    # First 8 tokens fit both choices; tokens past capacity drop to zero.
    assert np.all(np.abs(y[16:]) == 0.0)
    assert np.any(np.abs(y[:8]) > 0.0)
    assert np.isfinite(float(aux["load_balancing_loss"]))


def test_load_balancing_loss_uniform_is_one():
    n, e = 512, 8
    probs = jnp.full((n, e), 1.0 / e)
    # Perfectly balanced assignment: token i -> experts (i % e, (i+1) % e).
    experts = jnp.stack(
        [jnp.arange(n) % e, (jnp.arange(n) + 1) % e], axis=1
    ).astype(jnp.int32)
    loss = moe.load_balancing_loss(probs, experts, e)
    np.testing.assert_allclose(float(loss), 1.0, rtol=1e-6)


def test_moe_grads_flow():
    p = _params(jax.random.PRNGKey(5))
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 64))

    def loss(p):
        y, aux = moe.moe_ffn(
            p, x, num_experts_per_tok=2, capacity_factor=4.0,
            return_aux=True,
        )
        return (
            jnp.mean(y.astype(jnp.float32) ** 2)
            + 0.01 * aux["load_balancing_loss"]
            + 0.001 * aux["router_z_loss"]
        )

    grads = jax.grad(loss)(p)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # The router must receive gradient (through gates AND the aux loss).
    assert float(jnp.max(jnp.abs(grads["w_router"]))) > 0.0


def test_expert_parallel_matches_single_device():
    """EP over the 8-device mesh == the unsharded layer when nothing
    drops (slot assignment is order-dependent but the combine-weighted
    sum is not)."""
    p = _params(jax.random.PRNGKey(7), e=8, h=64, i=128)
    x = jax.random.normal(jax.random.PRNGKey(8), (8, 16, 64))
    m = mesh_lib.make_mesh((8,), ("ep",))
    y_ep = ep.expert_parallel_ffn(
        p, x, mesh=m, num_experts_per_tok=2, capacity_factor=4.0
    )
    y_ref = moe.moe_ffn(p, x, num_experts_per_tok=2, capacity_factor=4.0)
    np.testing.assert_allclose(
        np.asarray(y_ep), np.asarray(y_ref), rtol=1e-4, atol=1e-5
    )


def test_expert_parallel_rejects_bad_shapes():
    p = _params(jax.random.PRNGKey(9), e=4)
    m = mesh_lib.make_mesh((8,), ("ep",))
    x = jnp.zeros((8, 4, 64))
    with pytest.raises(ValueError, match="num_experts"):
        ep.expert_parallel_ffn(p, x, mesh=m)
    p8 = _params(jax.random.PRNGKey(9), e=8)
    with pytest.raises(ValueError, match="batch"):
        ep.expert_parallel_ffn(p8, jnp.zeros((3, 4, 64)), mesh=m)


def test_moe_train_step_sharded_dp_tp():
    """MoE decoder train step jits and runs over a dp x tp mesh (the
    Megatron col/row split applied per expert — mesh.llama_param_specs)."""
    cfg = llama.tiny(num_experts=4, num_experts_per_tok=2,
                     attention_impl="sdpa")
    params = llama.init_params(jax.random.PRNGKey(12), cfg)
    m = mesh_lib.make_mesh((2, 4), ("dp", "tp"))
    specs = mesh_lib.llama_param_specs(cfg)
    sharded = mesh_lib.shard_params(params, m, specs)
    tokens = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(13), (4, 16), 0, 256),
        jax.sharding.NamedSharding(m, mesh_lib.batch_spec()),
    )
    step = jax.jit(lambda p, t: llama.train_step(p, t, cfg))
    new_params, loss = step(sharded, tokens)
    jax.block_until_ready(new_params)
    assert np.isfinite(float(loss))


def test_mixtral_style_decoder_forward_and_train():
    cfg = llama.tiny(num_experts=4, num_experts_per_tok=2,
                     attention_impl="sdpa")
    params = llama.init_params(jax.random.PRNGKey(10), cfg)
    assert "moe" in params["layers"][0]
    tokens = jax.random.randint(jax.random.PRNGKey(11), (2, 16), 0, 256)
    logits = llama.forward(params, tokens, cfg)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))
    new_params, loss = llama.train_step(params, tokens, cfg)
    assert np.isfinite(float(loss))
    # MoE expert weights actually move.
    delta = jnp.max(
        jnp.abs(
            new_params["layers"][0]["moe"]["w_gate"].astype(jnp.float32)
            - params["layers"][0]["moe"]["w_gate"].astype(jnp.float32)
        )
    )
    assert float(delta) > 0.0
