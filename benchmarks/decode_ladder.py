"""Decode-step cost decomposition by layer-count ladder.

Fits t_step(L) = intercept + L * per_layer on 8B-shaped models with
L in {2, 8} layers (same hidden/head/vocab dims), fused projections +
qmm routing, B=16 slots, int8 KV.  The slope is the true per-layer cost
(compare with the matmul-byte prediction: ~216 MB/layer at ~800 GB/s =
0.27 ms + the attention kernel's ~0.1 ms fixed); the intercept is
lm_head + sampling + scan glue.

Also times one variant with cache_dtype=bf16 (no scales: append and
attention stream change) to attribute the cache-write path.

Usage: python benchmarks/decode_ladder.py  (TPU; ONE process only)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu.models import llama, quantized
from quantumattention_tpu.serving.engine import Engine


def measure(num_layers, cache_dtype, fuse=True, slots=16, new=129, burst=64):
    cfg = llama.llama3_8b(num_layers=num_layers)
    params = quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
    if fuse:
        params = quantized.fuse_projections(params)
    jax.block_until_ready(params)
    eng = Engine(params, cfg, num_slots=slots, max_len=256,
                 cache_dtype=cache_dtype, prefill_bucket=64)
    prompts = [[(7 * i + j) % 1000 + 1 for j in range(64)] for i in range(slots)]
    # warm: compile prefill + burst
    reqs = [eng.submit(p, max_new_tokens=burst + 1) for p in prompts]
    eng.run_to_completion(decode_burst=burst)
    assert all(r.done for r in reqs)
    # measured: pure decode bursts
    reqs = [eng.submit(p, max_new_tokens=new) for p in prompts]
    while eng.waiting or eng.prefilling:
        eng.step()
    jax.block_until_ready(eng.caches[0].k)
    t0 = time.perf_counter()
    eng.run_to_completion(decode_burst=burst)
    dt = time.perf_counter() - t0
    steps = new - 1
    ms = dt / steps * 1e3
    print(
        f"L={num_layers:2d} cache={jnp.dtype(cache_dtype).name} fuse={fuse}: "
        f"{ms:.2f} ms/step  ({slots / (dt / steps):.0f} tok/s)",
        flush=True,
    )
    return ms


def main():
    t2 = measure(2, jnp.int8)
    t8 = measure(8, jnp.int8)
    per_layer = (t8 - t2) / 6
    intercept = t2 - 2 * per_layer
    print(f"fit: per_layer={per_layer:.3f} ms, intercept={intercept:.3f} ms, "
          f"projected 32L = {intercept + 32 * per_layer:.1f} ms/step",
          flush=True)
    measure(8, jnp.bfloat16)
    measure(8, jnp.int8, fuse=False)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
