"""qmm block-size sweep + SOUND XLA baselines.

benchmarks/exp_w8a16.py's XLA-dot baselines were measurement artifacts:
chain_bench perturbs an operand ADDITIVELY (x + c), and XLA distributes
dot(x + bcast(c), w) = dot(x, w) + dot(bcast(c), w), hoisting the
loop-invariant dot(x, w) out of the scan — the "bf16 dot" then measured
1102 TFLOP/s (5.6x the v5e MXU peak) and 957 GB/s (above the HBM roof).
Pallas calls are opaque to XLA, so kernel timings were always sound.

Here XLA-native matmuls are timed with a data-dependent jnp.roll of the
activation (cannot distribute, costs one tiny copy), and the qmm kernel
is swept over (block_n, block_k).

Usage: python benchmarks/qmm_sweep.py  (TPU; ONE process only)
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import time

from quantumattention_tpu.models import quantized
from quantumattention_tpu.ops import qmm


def roll_chain_bench(fn, args, iters=128, reps=3):
    """chain_bench with a non-distributable perturbation: the first arg is
    rolled by a data-dependent 0/1 rows each iteration."""

    @jax.jit
    def run_n(*a):
        def body(c, _):
            pa = list(a)
            pa[0] = jnp.roll(pa[0], c, axis=0)
            o = fn(*pa)
            return jnp.int32(o.reshape(-1)[0]).astype(jnp.int32) & 1, None

        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return c

    int(run_n(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(run_n(*args))
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[len(times) // 2]


def main():
    K, N = 4096, 14336
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    w = quantized.quantize_matrix(jax.random.normal(k2, (K, N), jnp.float32) * 0.02)
    w_bf = (jax.random.normal(k2, (K, N), jnp.float32) * 0.02).astype(jnp.bfloat16)

    for M, iters in ((16, 256), (4096, 32)):
        x = jax.random.normal(k1, (M, K), jnp.bfloat16)
        flops = 2 * M * K * N
        i8 = K * N + M * K * 2 + M * N * 2
        b16 = K * N * 2 + M * K * 2 + M * N * 2

        t = roll_chain_bench(lambda x, w: jnp.einsum("mk,kn->mn", x, w), (x, w_bf), iters)
        print(f"[M={M}] bf16 dot (sound): {t*1e3:.3f} ms  {b16/t/1e9:.0f} GB/s  "
              f"{flops/t/1e12:.1f} TFLOP/s", flush=True)

        def w8a16(x, wq, s):
            y = jnp.einsum("mk,kn->mn", x, wq.astype(x.dtype))
            return (y.astype(jnp.float32) * s).astype(x.dtype)

        t = roll_chain_bench(w8a16, (x, w["q"], w["s"]), iters)
        print(f"[M={M}] w8a16 einsum (sound): {t*1e3:.3f} ms  {i8/t/1e9:.0f} GB/s  "
              f"{flops/t/1e12:.1f} TFLOP/s", flush=True)

        for bn, bk in ((512, 2048), (512, 4096), (1024, 2048), (1024, 4096),
                       (2048, 2048), (256, 4096), (512, 1024)):
            if bk > K or bn > N or N % bn or K % bk:
                continue
            try:
                t = roll_chain_bench(
                    lambda x, wq, s, bn=bn, bk=bk: qmm.quantized_matmul(
                        x, wq, s, block_n=bn, block_k=bk
                    ),
                    (x, w["q"], w["s"]), iters,
                )
                print(f"[M={M}] qmm bn={bn} bk={bk}: {t*1e3:.3f} ms  "
                      f"{i8/t/1e9:.0f} GB/s  {flops/t/1e12:.1f} TFLOP/s",
                      flush=True)
            except Exception as e:  # VMEM overflow etc. — report and move on
                print(f"[M={M}] qmm bn={bn} bk={bk}: FAIL {str(e)[:80]}",
                      flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
