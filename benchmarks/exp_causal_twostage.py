"""A/B: causal two-stage predicated split (VERDICT r3 item 3).

The flash kernel's causal masking was unconditional on every active block
(iota x2 + compare + select VPU passes); the two-stage split
(config.kernel.causal_two_stage, flash.py `_softmax_pv` arms) gives
strictly-below-diagonal blocks an arm with NO mask code — the predicated-
region realization of the reference's off-band/on-band decomposition
(inductor/kernels/attention.py:592-641).

Round-robin within ONE process (chip throughput drifts ~1.5x across
process windows — CLAUDE.md).  Also sanity-checks numerics vs the
single-arm path on-chip.

Usage: python benchmarks/exp_causal_twostage.py   (TPU; ONE process only)
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
FLOPS = 4 * B * H * S * S * D // 2  # causal-halved reference FLOP model

k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(k1, (B, H, S, D), jnp.bfloat16)
k = jax.random.normal(k2, (B, H, S, D), jnp.bfloat16)
v = jax.random.normal(k3, (B, H, S, D), jnp.bfloat16)


def bf16_causal(q, k, v):
    return qa.attn_func(q, k, v, is_causal=True)


def pb_causal(q, k, v):
    return qa.fp8_attn_func(q, k, v, is_causal=True, scaling_method="per-block")


def run(name, fn, two_stage):
    with config.patch({"kernel.causal_two_stage": two_stage}):
        t = chain_bench(fn, (q, k, v), iters=32)
    tf = FLOPS / t / 1e12
    print(json.dumps({"case": name, "two_stage": two_stage,
                      "ms": round(t * 1e3, 3),
                      "tflops_causal": round(tf, 1)}), flush=True)
    return tf


# numerics first: both arms must agree with the single-arm kernel
with config.patch({"kernel.causal_two_stage": False}):
    ref = bf16_causal(q, k, v)
with config.patch({"kernel.causal_two_stage": True}):
    out = bf16_causal(q, k, v)
err = float(jnp.sqrt(jnp.mean(
    (out.astype(jnp.float32) - ref.astype(jnp.float32)) ** 2)))
print(json.dumps({"check": "two_stage vs single-arm rmse", "rmse": err}),
      flush=True)
assert err < 1e-6, err

results = {}
for rnd in range(2):  # round-robin, best-of
    for name, fn in (("bf16", bf16_causal), ("per_block", pb_causal)):
        for ts in (False, True):
            tf = run(f"{name} r{rnd}", fn, ts)
            key = (name, ts)
            results[key] = max(results.get(key, 0.0), tf)

print(json.dumps({
    "summary": {
        f"{name}_{'two_stage' if ts else 'baseline'}": round(tf, 1)
        for (name, ts), tf in results.items()
    }
}), flush=True)
print("DONE", flush=True)
