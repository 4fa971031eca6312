"""Compiled validation + serving A/B for w4a16 int4 weights at Llama-3-8B
shapes: int8 vs int4 weight trees, round-robin in ONE process.

Usage: python benchmarks/w4a16_ab.py   (TPU; ONE process only)
"""

import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu.models import llama, quantized as qz
from quantumattention_tpu.ops import qmlp, qmm
from quantumattention_tpu.serving.engine import Engine

cfg = llama.llama3_8b()
E, I, Q = cfg.hidden_size, cfg.intermediate_size, cfg.q_dim


def check_correctness():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    wg = qz.quantize_matrix_int4(jax.random.normal(ks[0], (E, I)) / E**0.5)
    wu = qz.quantize_matrix_int4(jax.random.normal(ks[1], (E, I)) / E**0.5)
    wgu = {"q4": jnp.concatenate([wg["q4"], wu["q4"]], -1),
           "s": jnp.concatenate([wg["s"], wu["s"]], -1)}
    wd = qz.quantize_matrix_int4(jax.random.normal(ks[2], (I, E)) / I**0.5)
    wo = qz.quantize_matrix_int4(jax.random.normal(ks[3], (Q, E)) / Q**0.5)
    norm = jnp.ones((E,), jnp.float32)
    x = jax.random.normal(ks[4], (16, E)).astype(jnp.bfloat16)
    attn = jax.random.normal(ks[5], (16, Q)).astype(jnp.bfloat16)

    @jax.jit
    def fused(x, attn, wgu, wd, wo):
        return qmlp.fused_layer_tail(
            x, norm, wgu, wd, eps=1e-5, attn_out=attn, wo=wo,
            interpret=False,
        )

    @jax.jit
    def ref(x, attn, wgu, wd, wo):
        x1 = x + (attn @ qz.dequantize_int4(wo, jnp.bfloat16))
        xf = x1.astype(jnp.float32)
        h = (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + 1e-5)
             ).astype(jnp.bfloat16)
        gu = h @ qz.dequantize_int4(wgu, jnp.bfloat16)
        gate, up = jnp.split(gu, 2, -1)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(jnp.bfloat16) * up
        return x1 + act @ qz.dequantize_int4(wd, jnp.bfloat16)

    t0 = time.time()
    got = jnp.asarray(fused(x, attn, wgu, wd, wo), jnp.float32)
    print(f"int4 tail compile+run {time.time()-t0:.1f}s", flush=True)
    want = jnp.asarray(ref(x, attn, wgu, wd, wo), jnp.float32)
    rel = float(jnp.sqrt(jnp.mean((got - want) ** 2)) / jnp.std(want))
    print(json.dumps({"check": "int4_tail_8b", "rel_rmse": rel}), flush=True)
    assert rel < 1e-2, rel

    # qmm4 at lm_head-like decode shape
    wh = qz.quantize_matrix_int4(
        jax.random.normal(ks[6], (E, 2048)) / E**0.5
    )
    xh = jax.random.normal(ks[7], (16, E), jnp.bfloat16)
    got = jnp.asarray(
        jax.jit(lambda x, q, s: qmm.quantized_matmul4(x, q, s))(
            xh, wh["q4"], wh["s"]
        ), jnp.float32,
    )
    want = jnp.asarray(
        xh.astype(jnp.float32) @ qz.dequantize_int4(wh), jnp.float32
    )
    rel = float(jnp.sqrt(jnp.mean((got - want) ** 2)) / jnp.std(want))
    print(json.dumps({"check": "qmm4_8b", "rel_rmse": rel}), flush=True)
    assert rel < 1e-2, rel


def run_engine(params, *, name, slots=16, max_len=1024, prompt=256,
               new=257, burst=64):
    eng = Engine(params, cfg, num_slots=slots, max_len=max_len,
                 cache_dtype=jnp.int8, prefill_bucket=prompt)
    prompts = [
        [(7 * i + j) % 1000 + 1 for j in range(prompt)] for i in range(slots)
    ]
    reqs = [eng.submit(p, max_new_tokens=burst + 1) for p in prompts]
    eng.run_to_completion(decode_burst=burst)  # warm
    assert all(r.done for r in reqs)
    best_dec, best_pre = float("inf"), float("inf")
    for _ in range(2):
        reqs = [eng.submit(p, max_new_tokens=new) for p in prompts]
        t0 = time.perf_counter()
        while eng.waiting or eng.prefilling:
            eng.step()
        jax.block_until_ready(eng.caches[0].k)
        best_pre = min(best_pre, time.perf_counter() - t0)
        t0 = time.perf_counter()
        eng.run_to_completion(decode_burst=burst)
        best_dec = min(best_dec, time.perf_counter() - t0)
        assert all(r.done and len(r.output) == new for r in reqs)
    steps = new - 1
    print(json.dumps({
        "config": name, "slots": slots,
        "decode_ms_per_step": round(best_dec / steps * 1e3, 2),
        "decode_tok_s": round(slots * steps / best_dec, 1),
        "prefill_tok_s": round(slots * prompt / best_pre, 1),
    }), flush=True)
    del eng
    gc.collect()


def main():
    check_correctness()

    # Both trees at once (8 + 4.3 GB) plus the KV cache would brush the
    # 16 GB HBM ceiling — init fresh per round instead (the compiled init
    # programs are cached, ~30 s each; rounds stay interleaved in ONE
    # process so the A/B remains drift-valid).
    def tree(int4):
        p = qz.fuse_projections(
            qz.init_quantized_params(jax.random.PRNGKey(0), cfg, int4=int4)
        )
        jax.block_until_ready(p)
        return p

    for rnd in range(2):
        p8 = tree(False)
        run_engine(p8, name=f"w8_r{rnd}")
        del p8
        gc.collect()
        p4 = tree(True)
        run_engine(p4, name=f"w4_r{rnd}")
        del p4
        gc.collect()
    # throughput operating point with the int4 weights
    p4 = tree(True)
    run_engine(p4, name="w4_slots32", slots=32, max_len=512, prompt=128)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
