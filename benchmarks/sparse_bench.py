"""Block-sparse prefill throughput (splash-style granule bitmap).

Measures the fused kernel with a block-sparse mask against the dense run at
the same shape: wall-clock should scale with mask density (skipped kernel
blocks never launch their matmuls), at a small fine-masking overhead on the
active blocks.

Usage: python benchmarks/sparse_bench.py [--seq 8192] [--density 0.25]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, q, k, v, iters=8):
    @jax.jit
    def run_n(q, k, v):
        def body(carry, _):
            o = fn(q + carry.astype(q.dtype), k, v)
            return jnp.float32(o[0, 0, 0, 0]) * 0.0, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run_n(q, k, v))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_n(q, k, v))
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[1]


def main():
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--seq", type=int, default=8192)
    p.add_argument("--head-dim", type=int, default=128)
    p.add_argument("--density", type=float, default=0.25)
    args = p.parse_args()

    import quantumattention_tpu as qa

    b, h, s, d = args.batch, args.heads, args.seq, args.head_dim
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(k2, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(k3, (b, h, s, d), jnp.bfloat16)

    n = s // 128
    rng = np.random.RandomState(0)
    bm = rng.rand(n, n) < args.density
    bm[np.arange(n), np.arange(n)] = True
    density = float(bm.mean())
    bm_j = jnp.asarray(bm)

    flops_dense = 4 * b * h * s * s * d
    t_dense = bench(lambda q, k, v: qa.attn_func(q, k, v), q, k, v)
    t_sparse = bench(
        lambda q, k, v: qa.attn_func(q, k, v, block_mask=bm_j), q, k, v
    )
    print(
        f"dense:  {t_dense*1e3:.2f} ms  "
        f"{flops_dense/t_dense/1e12:.1f} TFLOP/s"
    )
    print(
        f"sparse (density {density:.2f}): {t_sparse*1e3:.2f} ms  "
        f"speedup {t_dense/t_sparse:.2f}x  "
        f"effective {flops_dense*density/t_sparse/1e12:.1f} TFLOP/s on "
        "active blocks"
    )


if __name__ == "__main__":
    main()
