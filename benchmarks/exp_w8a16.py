"""Experiment: does XLA fuse the w8a16 int8->bf16 convert into the dot?

Model-level decode at 8B shapes measured 47 ms/step where the int8-weight
HBM stream predicts ~10 ms (benchmarks/model_bench.py) — this times the
candidate matmul strategies at decode/prefill shapes to find where the
time goes.  Weights are jit PARAMETERS (CLAUDE.md: closed-over GB arrays
become program constants and can kill the relay).

CAVEAT (discovered from this run's impossible numbers — bf16 dot "1102
TFLOP/s", 5.6x the MXU peak): chain_bench's ADDITIVE perturbation is
unsound for XLA-native matmuls — dot(x + bcast(c), w) distributes and the
loop-invariant dot(x, w) hoists out of the scan.  The w8a16/w8a8 numbers
here are lower bounds on badness only; benchmarks/qmm_sweep.py re-measures
everything with a non-distributable roll perturbation and is the record.

Usage: python benchmarks/exp_w8a16.py  (TPU; ONE process only)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu.utils.profiling import chain_bench


def report(name, t, bytes_moved, flops):
    print(
        f"{name}: {t*1e3:.3f} ms  {bytes_moved/t/1e9:.0f} GB/s  "
        f"{flops/t/1e12:.1f} TFLOP/s",
        flush=True,
    )


def main():
    K, N = 4096, 14336
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    w_bf = (jax.random.normal(k1, (K, N), jnp.float32) * 0.02).astype(jnp.bfloat16)
    w8 = jnp.round(
        jax.random.normal(k2, (K, N), jnp.float32) * 40
    ).clip(-127, 127).astype(jnp.int8)
    s = jnp.full((1, N), 0.0005, jnp.float32)

    for M, tag, iters in ((16, "decode", 256), (4096, "prefill", 64)):
        x = jax.random.normal(jax.random.fold_in(key, M), (M, K), jnp.bfloat16)
        flops = 2 * M * K * N
        int8_bytes = K * N + M * K * 2 + M * N * 2
        bf16_bytes = K * N * 2 + M * K * 2 + M * N * 2

        # 1. current w8a16: convert -> bf16 dot -> fp32 scale epilogue
        def w8a16(x, w8, s):
            y = jnp.einsum("mk,kn->mn", x, w8.astype(x.dtype))
            return (y.astype(jnp.float32) * s).astype(x.dtype)

        t = chain_bench(w8a16, (x, w8, s), iters=iters)
        report(f"[{tag} M={M}] w8a16 convert+dot", t, int8_bytes, flops)

        # 2. pure bf16 dot (weights already bf16) — the fusion-success bound
        def bf16mm(x, w):
            return jnp.einsum("mk,kn->mn", x, w)

        t = chain_bench(bf16mm, (x, w_bf), iters=iters)
        report(f"[{tag} M={M}] bf16 dot", t, bf16_bytes, flops)

        # 3. w8a8 dynamic: per-row int8 activations, int8 MXU dot, rescale
        def w8a8(x, w8, s):
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
            xs = jnp.maximum(amax / 127.0, 1e-8)
            xq = jnp.round(x.astype(jnp.float32) / xs).clip(-127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (y.astype(jnp.float32) * xs * s).astype(jnp.bfloat16)

        t = chain_bench(w8a8, (x, w8, s), iters=iters)
        report(f"[{tag} M={M}] w8a8 int8 dot", t, int8_bytes, flops)

        # 4. convert-only (materialize bf16 weights): the fusion-failure bound
        def conv_only(w8):
            return w8.astype(jnp.bfloat16)

        t = chain_bench(conv_only, (w8,), iters=iters)
        report(f"[{tag} M={M}] convert only", t, K * N * 3, 0)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
