"""Block sweep for the causal two-stage kernel (follow-up to
exp_causal_twostage.py: per-block won +6.6% at the OLD pretuned blocks,
bf16 regressed -8% — both winners were swept for the single-arm kernel,
so re-sweep under the split before gating it).

Usage: python benchmarks/exp_causal_blocks.py   (TPU; ONE process only)
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

B, H, S, D = 16, 16, 8192, 128
FLOPS = 4 * B * H * S * S * D // 2

k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(k1, (B, H, S, D), jnp.bfloat16)
k = jax.random.normal(k2, (B, H, S, D), jnp.bfloat16)
v = jax.random.normal(k3, (B, H, S, D), jnp.bfloat16)

BLOCKS = [(512, 1024), (1024, 512), (1024, 1024), (2048, 1024),
          (1024, 2048), (2048, 2048)]


def run(name, fn, two_stage, bq, bkv):
    with config.patch({"kernel.causal_two_stage": two_stage,
                       "kernel.block_q": bq, "kernel.block_kv": bkv}):
        try:
            t = chain_bench(fn(bq, bkv), (q, k, v), iters=32)
        except Exception as e:
            print(json.dumps({"case": name, "bq": bq, "bkv": bkv,
                              "error": str(e)[:120]}), flush=True)
            return
    print(json.dumps({"case": name, "two_stage": two_stage, "bq": bq,
                      "bkv": bkv, "ms": round(t * 1e3, 2),
                      "tflops_causal": round(FLOPS / t / 1e12, 1)}),
          flush=True)


def bf16(bq, bkv):
    return lambda q, k, v: qa.attn_func(q, k, v, is_causal=True)


def pb(bq, bkv):
    return lambda q, k, v: qa.fp8_attn_func(
        q, k, v, is_causal=True, scaling_method="per-block"
    )


for bq, bkv in BLOCKS:
    run("bf16_ts", bf16, True, bq, bkv)
for bq, bkv in BLOCKS:
    run("pb_ts", pb, True, bq, bkv)
# round 2 for drift control on the leaders
for bq, bkv in BLOCKS:
    run("bf16_ts r2", bf16, True, bq, bkv)
for bq, bkv in BLOCKS:
    run("pb_ts r2", pb, True, bq, bkv)
print("DONE", flush=True)
