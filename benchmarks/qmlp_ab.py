"""Compiled validation + in-process A/B for the fused layer tail
(ops/qmlp.py) at Llama-3-8B shapes.

Part 1: compiled differential check of fused_layer_tail vs the unfused
wo+residual+mlp_block composition (interpret mode is laxer than Mosaic —
every kernel needs one compiled run on the chip).

Part 2: serving A/B — identical engines with kernel.qmlp off vs on,
measured round-robin inside ONE process (chip throughput drifts ~1.5x
between process windows).

Usage: python benchmarks/qmlp_ab.py   (TPU; ONE process only)
"""

import dataclasses
import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu import config
from quantumattention_tpu.models import llama, quantized
from quantumattention_tpu.ops import qmlp
from quantumattention_tpu.serving.engine import Engine


def check_correctness():
    cfg = llama.llama3_8b()
    e, inter, q_dim = cfg.hidden_size, cfg.intermediate_size, cfg.q_dim
    key = jax.random.PRNGKey(0)
    kx, ka, k1, k2, k3, k4 = jax.random.split(key, 6)
    wg = quantized.quantize_matrix(
        jax.random.normal(k1, (e, inter), jnp.float32) / e**0.5
    )
    wu = quantized.quantize_matrix(
        jax.random.normal(k2, (e, inter), jnp.float32) / e**0.5
    )
    layer = {
        "wo": quantized.quantize_matrix(
            jax.random.normal(k3, (q_dim, e), jnp.float32) / q_dim**0.5
        ),
        "mlp_norm": jnp.ones((e,), jnp.float32),
        "w_gate_up": {
            "q": jnp.concatenate([wg["q"], wu["q"]], axis=-1),
            "s": jnp.concatenate([wg["s"], wu["s"]], axis=-1),
        },
        "w_down": quantized.quantize_matrix(
            jax.random.normal(k4, (inter, e), jnp.float32) / inter**0.5
        ),
    }
    x = jax.random.normal(kx, (1, 16, e)).astype(jnp.bfloat16)
    attn = jax.random.normal(ka, (1, 16, q_dim)).astype(jnp.bfloat16)

    @jax.jit
    def fused(x, attn, layer):
        return qmlp.fused_layer_tail(
            x[0], layer["mlp_norm"], layer["w_gate_up"], layer["w_down"],
            eps=cfg.rms_norm_eps, attn_out=attn[0], wo=layer["wo"],
            interpret=False,
        )

    @jax.jit
    def unfused(x, attn, layer):
        with config.patch({"kernel.qmlp": False}):
            y = x + quantized.matmul("bsq,qe->bse", attn, layer["wo"])
            return llama.mlp_block(cfg, layer, y)[0]

    t0 = time.time()
    got = jnp.asarray(fused(x, attn, layer), jnp.float32)
    print(f"fused compile+run {time.time()-t0:.1f}s", flush=True)
    want = jnp.asarray(unfused(x, attn, layer), jnp.float32)
    rmse = float(jnp.sqrt(jnp.mean((got - want) ** 2)))
    denom = float(jnp.std(want)) + 1e-9
    print(json.dumps({"check": "qmlp_8b_shapes", "rel_rmse": rmse / denom}),
          flush=True)
    assert rmse / denom < 1e-2, rmse / denom


def run_engine(params, cfg, *, name, qmlp_on, slots=16, max_len=1024,
               prompt=256, new=257, burst=64):
    with config.patch({"kernel.qmlp": qmlp_on}):
        eng = Engine(params, cfg, num_slots=slots, max_len=max_len,
                     cache_dtype=jnp.int8, prefill_bucket=prompt)
        prompts = [
            [(7 * i + j) % 1000 + 1 for j in range(prompt)]
            for i in range(slots)
        ]
        reqs = [eng.submit(p, max_new_tokens=burst + 1) for p in prompts]
        eng.run_to_completion(decode_burst=burst)  # warm/compile
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
        "config": name, "qmlp": bool(qmlp_on), "slots": slots,
        "decode_ms_per_step": round(best_dec / steps * 1e3, 2),
        "decode_tok_s": round(slots * steps / best_dec, 1),
        "prefill_tok_s": round(slots * prompt / best_pre, 1),
    }), flush=True)
    del eng
    gc.collect()


def main():
    check_correctness()
    cfg = llama.llama3_8b()
    params = quantized.fuse_projections(
        quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
    )
    jax.block_until_ready(params)
    print("weights ready", flush=True)
    # round-robin A/B (two passes each order)
    run_engine(params, cfg, name="qmlp_off", qmlp_on=False)
    run_engine(params, cfg, name="qmlp_on", qmlp_on=True)
    run_engine(params, cfg, name="qmlp_off2", qmlp_on=False)
    run_engine(params, cfg, name="qmlp_on2", qmlp_on=True)
    # best grid operating point (slots32) with the fused tail
    run_engine(params, cfg, name="qmlp_on_slots32", qmlp_on=True,
               slots=32, max_len=512, prompt=128)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
