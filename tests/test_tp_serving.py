"""Tensor-parallel serving (serving/tp.py): head-sharded decode/prefill
attention and the mesh-mode Engine on the 8-device virtual CPU mesh.

Numeric comparisons follow CLAUDE.md's testing policy: kernel-level RMSE
against the single-device path (deterministic), engine-level first-token +
schedule invariants (token sequences across differently-traced programs
are near-tie flaky on untrained models — the tp output projection psums in
a different reduction order than the dense matmul)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantumattention_tpu.models import llama, quantized
from quantumattention_tpu.ops.decode import decode_attention
from quantumattention_tpu.ops.quant import dynamically_quantize_int8
from quantumattention_tpu.parallel import mesh as qmesh
from quantumattention_tpu.serving import tp as tp_lib
from quantumattention_tpu.serving.engine import Engine


@pytest.fixture(scope="module")
def mesh():
    return qmesh.make_mesh((4,), ("tp",))


def rmse(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def test_tp_decode_matches_single_device(mesh):
    """Head-sharded decode == single-device decode (per-head compute is
    identical; only the grid split changes)."""
    B, Hq, Hkv, S, D = 4, 8, 4, 256, 64
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, Hq, D), jnp.bfloat16)
    kraw = jax.random.normal(k2, (B, Hkv, S, D), jnp.float32)
    vraw = jax.random.normal(k3, (B, Hkv, S, D), jnp.float32)
    lengths = jnp.array([256, 100, 17, 256], jnp.int32)
    kc, ks = dynamically_quantize_int8(kraw)
    vc, vs = dynamically_quantize_int8(vraw)

    single = decode_attention(q, kc, vc, lengths, k_scale=ks, v_scale=vs)
    sharded = tp_lib.decode_attention_tp(
        q, kc, vc, lengths, mesh=mesh, k_scale=ks, v_scale=vs
    )
    assert rmse(single, sharded) < 1e-3


def test_tp_decode_bf16_and_window(mesh):
    B, Hq, Hkv, S, D = 2, 8, 4, 512, 64
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(k1, (B, Hq, D), jnp.bfloat16)
    k = jax.random.normal(k2, (B, Hkv, S, D), jnp.bfloat16)
    v = jax.random.normal(k3, (B, Hkv, S, D), jnp.bfloat16)
    lengths = jnp.array([512, 300], jnp.int32)
    single = decode_attention(q, k, v, lengths, window=(63, 0))
    sharded = tp_lib.decode_attention_tp(
        q, k, v, lengths, mesh=mesh, window=(63, 0)
    )
    assert rmse(single, sharded) < 1e-3


def test_tp_decode_validation(mesh):
    q3 = jnp.zeros((2, 6, 64), jnp.bfloat16)  # 6 % 4 != 0
    kv = jnp.zeros((2, 2, 128, 64), jnp.bfloat16)
    with pytest.raises(ValueError, match="divisible"):
        tp_lib.decode_attention_tp(
            q3, kv, kv, jnp.full((2,), 8, jnp.int32), mesh=mesh
        )
    q4 = jnp.zeros((2, 8, 2, 64), jnp.bfloat16)
    with pytest.raises(ValueError, match="single-token"):
        tp_lib.decode_attention_tp(
            q4, kv, kv, jnp.full((2,), 8, jnp.int32), mesh=mesh
        )


def test_tp_prefill_forward_close(mesh):
    """forward_prefill_tp logits/KV match the single-device forward_prefill
    (same math; head-sharded attention + GSPMD matmul psums)."""
    cfg = llama.tiny(attention_impl="sdpa", dtype=jnp.float32)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    sharded_params = tp_lib.shard_serving_params(params, cfg, mesh)
    tokens = jnp.asarray([[3, 17, 42, 99, 7, 23, 5, 1]], jnp.int32)

    logits, kv = jax.jit(
        lambda p, t: llama.forward_prefill(p, t, cfg)
    )(params, tokens)
    tlogits, tkv = jax.jit(
        lambda p, t: tp_lib.forward_prefill_tp(p, t, cfg=cfg, mesh=mesh)
    )(sharded_params, tokens)

    denom = float(jnp.std(logits.astype(jnp.float32)))
    assert rmse(logits, tlogits) / denom < 1e-4
    for (k1_, v1_), (k2_, v2_) in zip(kv, tkv):
        assert rmse(k1_, k2_) < 1e-4
        assert rmse(v1_, v2_) < 1e-4


def test_param_specs_for_quantized_tree(mesh):
    """param_specs_for mirrors the tree structure of a w8a16 tree and
    keeps scales unsharded on their size-1 dims."""
    cfg = llama.tiny(attention_impl="sdpa", dtype=jnp.float32)
    qparams = quantized.quantize_params(
        llama.init_params(jax.random.PRNGKey(0), cfg)
    )
    specs = qmesh.param_specs_for(qparams, cfg)
    # Same tree structure: device_put via tree_map must succeed.
    sharded = qmesh.shard_params(qparams, mesh, specs)
    wq = specs["layers"][0]["wq"]
    assert wq["q"] == jax.sharding.PartitionSpec(None, "tp")
    assert wq["s"] == jax.sharding.PartitionSpec(None, "tp")
    wo = specs["layers"][0]["wo"]
    assert wo["q"] == jax.sharding.PartitionSpec("tp", None)
    assert wo["s"] == jax.sharding.PartitionSpec(None, None)
    emb = specs["embed"]
    assert emb["q"] == jax.sharding.PartitionSpec("tp", None)
    assert emb["s"] == jax.sharding.PartitionSpec("tp", None)
    # Values survive placement.
    np.testing.assert_array_equal(
        np.asarray(sharded["layers"][0]["wq"]["q"]),
        np.asarray(qparams["layers"][0]["wq"]["q"]),
    )


def test_engine_tp_serves(mesh):
    """Mesh-mode Engine completes requests with the same first token as
    the single-device engine (fp32 sdpa prefill: the first token comes
    from prefill logits on both sides) and honors schedule invariants."""
    cfg = llama.tiny(attention_impl="sdpa", dtype=jnp.float32)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    prompt = [5, 9, 23, 51, 7, 12]
    n_new = 4

    solo = Engine(params, cfg, num_slots=2, max_len=256,
                  cache_dtype=jnp.int8)
    rs = solo.submit(prompt, max_new_tokens=n_new)
    solo.run_to_completion()

    eng = Engine(params, cfg, num_slots=2, max_len=256,
                 cache_dtype=jnp.int8, mesh=mesh)
    rt = eng.submit(prompt, max_new_tokens=n_new)
    eng.run_to_completion()

    assert rt.done and len(rt.output) == n_new
    assert rt.output[0] == rs.output[0], (rt.output, rs.output)
    # The cache really is sharded over the tp axis.
    shard_shape = eng.caches[0].k.sharding.shard_shape(eng.caches[0].k.shape)
    assert shard_shape[1] == cfg.num_kv_heads // 4


def test_engine_tp_quantized_weights_burst(mesh):
    """w8a16 weights + mesh + burst decode: the full production stack on
    the virtual mesh."""
    cfg = llama.tiny(attention_impl="sdpa", dtype=jnp.float32)
    qparams = quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
    eng = Engine(qparams, cfg, num_slots=2, max_len=256,
                 cache_dtype=jnp.int8, mesh=mesh)
    reqs = [eng.submit([1 + i, 7, 3, 9], max_new_tokens=9) for i in range(2)]
    eng.run_to_completion(decode_burst=4)
    assert all(r.done and len(r.output) == 9 for r in reqs)
    assert eng.stats["generated_tokens"] == 18


def test_engine_tp_chunked_prefill(mesh):
    """Mixed prefill/decode under the mesh: a long prompt prefills in
    chunks (shard-mapped chunk attention over the KV-head axis) while an
    active decode stream advances every step; first token matches the
    single-chip chunked engine (prefill logits are deterministic)."""
    cfg = llama.tiny(attention_impl="sdpa", dtype=jnp.float32)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    long_prompt = [(3 * i) % 97 + 1 for i in range(150)]  # 3 chunks of 64

    def run(mesh_arg):
        eng = Engine(params, cfg, num_slots=2, max_len=256,
                     cache_dtype=jnp.int8, prefill_chunk=64, mesh=mesh_arg)
        short = eng.submit([5, 9, 23], max_new_tokens=8)
        eng.step()  # short prompt prefills (single chunk), starts decoding
        produced = [len(short.output)]
        long_req = eng.submit(list(long_prompt), max_new_tokens=3)
        while long_req.prefill_pos < len(long_prompt):
            eng.step()
            produced.append(len(short.output))
        eng.run_to_completion()
        return short, long_req, produced

    s1, l1, prod1 = run(None)
    s2, l2, prod2 = run(mesh)
    assert l2.done and len(l2.output) == 3
    assert s2.done and len(s2.output) == 8
    # decode advanced during every chunked-prefill step (until done)
    assert all(
        b > a or b == 8 for a, b in zip(prod2, prod2[1:])
    ), prod2
    # deterministic prefill logits -> same first token as single-chip
    assert l1.output[0] == l2.output[0]
    assert s1.output[0] == s2.output[0]


def test_engine_tp_rejects_unsupported(mesh):
    cfg = llama.tiny(attention_impl="sdpa", dtype=jnp.float32)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="slots"):
        Engine(params, cfg, num_slots=2, max_len=256, mesh=mesh,
               cache_backend="paged", page_size=64)
    with pytest.raises(ValueError, match="divisible"):
        Engine(params, llama.tiny(num_kv_heads=2, num_q_heads=4),
               num_slots=2, max_len=256, mesh=mesh)