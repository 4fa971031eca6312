"""Stock-JAX flash baseline at every README matrix cell (VERDICT r4
missing #2: the reference's protocol prints a competitive baseline next
to EVERY shape — tests/test_interface.py:127-134 — while the README
matrix carried one only at D=128).

Sweeps the stock `jax.experimental.pallas.ops.tpu.flash_attention` over
its block grid at D in {64, 128, 256} x causal and prints the tuned
winner per cell, plus this repo's best path at the same cell for an
in-process comparison (chip-window drift makes cross-process numbers
incomparable).

Usage: python benchmarks/baseline_matrix.py  (TPU; ONE process only)
"""

import json
import math
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import quantumattention_tpu as qa
from quantumattention_tpu.utils.profiling import chain_bench

B, H, S = 16, 16, 8192

for d in (64, 128, 256):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, H, S, d), jnp.bfloat16)
    k = jax.random.normal(k2, (B, H, S, d), jnp.bfloat16)
    v = jax.random.normal(k3, (B, H, S, d), jnp.bfloat16)
    fl_full = 4 * B * H * S * S * d
    for causal in (False, True):
        fl = fl_full // 2 if causal else fl_full

        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        best = (None, float("inf"))
        for bq, bk in ((512, 512), (512, 1024), (1024, 512), (1024, 1024),
                       (1024, 2048), (2048, 1024), (2048, 2048)):
            bs = BlockSizes(
                block_q=bq, block_k_major=bk, block_k=min(bk, 512),
                block_b=1,
                block_q_major_dkv=512, block_k_major_dkv=512,
                block_k_dkv=512, block_q_dkv=512,
                block_k_major_dq=512, block_k_dq=512, block_q_dq=512,
            )

            def f(q, k, v, bs=bs):
                return flash_attention(
                    q, k, v, causal=causal,
                    sm_scale=1.0 / math.sqrt(d), block_sizes=bs,
                )

            try:
                t = chain_bench(f, (q, k, v), iters=16)
                if t < best[1]:
                    best = ((bq, bk), t)
            except Exception as e:
                print(json.dumps({
                    "cell": f"d{d}_{'causal' if causal else 'full'}",
                    "blocks": [bq, bk],
                    "err": str(e).split(chr(10))[0][:100],
                }), flush=True)
        stock_tf = fl / best[1] / 1e12 if best[0] else None

        # This repo's best path at the same cell (pretuned winners).
        t_bf16 = chain_bench(
            lambda q, k, v: qa.attn_func(q, k, v, is_causal=causal),
            (q, k, v), iters=16,
        )
        t_pb = chain_bench(
            lambda q, k, v: qa.fp8_attn_func(
                q, k, v, is_causal=causal, scaling_method="per-block"
            ),
            (q, k, v), iters=16,
        )
        ours_tf = fl / min(t_bf16, t_pb) / 1e12
        print(json.dumps({
            "cell": f"d{d}_{'causal' if causal else 'full'}",
            "stock_tuned_tflops": round(stock_tf, 1) if stock_tf else None,
            "stock_best_blocks": best[0],
            "ours_best_tflops": round(ours_tf, 1),
            "ours_bf16_tflops": round(fl / t_bf16 / 1e12, 1),
            "ours_per_block_tflops": round(fl / t_pb / 1e12, 1),
            "ratio": round(ours_tf / stock_tf, 3) if stock_tf else None,
        }), flush=True)
    del q, k, v
print("DONE", flush=True)
