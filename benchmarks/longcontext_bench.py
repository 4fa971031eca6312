"""Long-context causal prefill throughput (BASELINE config 3).

Usage: python benchmarks/longcontext_bench.py [--seq 131072]
Measured on TPU v5e: 109 TFLOP/s at S=131072 (B=1, H=8, D=128, causal).
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import quantumattention_tpu as qa
from quantumattention_tpu import config
from quantumattention_tpu.utils.profiling import attention_tflops, do_bench


def main():
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    p = argparse.ArgumentParser()
    p.add_argument("--seq", type=int, default=131072)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--head-dim", type=int, default=128)
    p.add_argument("--window", type=int, default=None)
    args = p.parse_args()
    S, H, D = args.seq, args.heads, args.head_dim

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (1, H, S, D), jnp.bfloat16)
    k = jax.random.normal(k2, (1, H, S, D), jnp.bfloat16)
    v = jax.random.normal(k3, (1, H, S, D), jnp.bfloat16)

    window = (args.window, 0) if args.window else None
    wtag = f" window={args.window}" if args.window else ""
    # Pin the measured-best blocks for the whole run: an autotune sweep at
    # 131K context would spend many minutes per candidate compile for
    # marginal gain.
    config.set("kernel.block_q", 1024)
    config.set("kernel.block_kv", 2048)
    fn = jax.jit(
        lambda q, k, v: qa.attn_func(q, k, v, is_causal=True, window=window)
    )
    t = do_bench(lambda: fn(q, k, v), iters=3, warmup=1, reps=2)
    print(
        f"S={S} causal{wtag} bf16: {t * 1e3:.1f} ms  "
        f"{attention_tflops(t, 1, H, S, S, D, causal=True):.1f} TFLOP/s"
    )
    # Per-block in-kernel quantized path: must stay >= bf16 at long context
    # (the K-only VMEM cache keeps it alive past the 16 MiB K+V budget).
    fn_pb = jax.jit(
        lambda q, k, v: qa.fp8_attn_func(
            q, k, v, is_causal=True, scaling_method="per-block",
            window=window,
        )
    )
    t_pb = do_bench(lambda: fn_pb(q, k, v), iters=3, warmup=1, reps=2)
    print(
        f"S={S} causal{wtag} per-block: {t_pb * 1e3:.1f} ms  "
        f"{attention_tflops(t_pb, 1, H, S, S, D, causal=True):.1f} TFLOP/s "
        f"({t / t_pb:.2f}x bf16)"
    )


if __name__ == "__main__":
    main()
