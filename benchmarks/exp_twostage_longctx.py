"""A/B: causal two-stage split on the LONG-CONTEXT K-cache ladder.

The split was gated to the per-block path from S=8192 measurements where
both K and V sit in VMEM.  Past the K+V budget (S >= 32k) V streams from
HBM — the regime where the split REGRESSED bf16 — so the long-context
rungs need their own measurement before the default stands.

Usage: python benchmarks/exp_twostage_longctx.py  (TPU; ONE process only)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import quantumattention_tpu as qa
from quantumattention_tpu import config
from quantumattention_tpu.utils.profiling import chain_bench

B, H, D = 1, 8, 128


def pb(q, k, v):
    return qa.fp8_attn_func(q, k, v, is_causal=True, scaling_method="per-block")


for S in (32768, 131072):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(k2, (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(k3, (B, H, S, D), jnp.bfloat16)
    flops = 4 * B * H * S * S * D // 2
    for rnd in range(2):
        for ts in (False, True):
            with config.patch({"kernel.causal_two_stage": ts}):
                t = chain_bench(pb, (q, k, v), iters=16)
            print(json.dumps({
                "S": S, "two_stage": ts, "round": rnd,
                "ms": round(t * 1e3, 2),
                "tflops_causal": round(flops / t / 1e12, 1),
            }), flush=True)
    del q, k, v
print("DONE", flush=True)
