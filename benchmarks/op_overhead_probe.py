"""Per-op fixed-cost probe.

Hypothesis from the DMA probes: on this chip/runtime every matmul-ish op
costs ~0.1 ms of fixed time plus bytes at ~760 GB/s, regardless of
Pallas-vs-XLA — so a 32-layer decode step pays op_count x 0.1 ms before
moving a byte.  Measured here:
  * pallas read kernels at 1/4/14.7/59 MB — the time-vs-bytes line's
    intercept is the per-call fixed cost;
  * a chain of 32 small DEPENDENT XLA dots vs 1 big dot with the same
    total weight bytes — the same intercept for XLA-native ops;
  * 2 pallas calls per chain iteration vs 1 — confirms the cost is
    per-call, not per-iteration.

Usage: python benchmarks/op_overhead_probe.py  (TPU; ONE process only)
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu.utils.profiling import chain_bench

N = 14336


def _read_kernel(w_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += w_ref[0:16, :].astype(jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def read_fn(rows, bk):
    n_k = rows // bk
    def fn(w):
        return pl.pallas_call(
            functools.partial(_read_kernel, n_k=n_k),
            grid=(n_k,),
            in_specs=[pl.BlockSpec((bk, N), lambda k: (k, 0))],
            out_specs=pl.BlockSpec((16, N), lambda k: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((16, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((16, N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(w)
    return fn


def main():
    key = jax.random.PRNGKey(0)

    print("--- pallas read size ladder ---", flush=True)
    for rows, bk in ((64, 64), (256, 128), (1024, 256), (4096, 512)):
        w = jnp.round(
            jax.random.normal(key, (rows, N), jnp.float32) * 40
        ).clip(-127, 127).astype(jnp.int8)
        t = chain_bench(read_fn(rows, bk), (w,), iters=256)
        mb = rows * N / 1e6
        print(f"read {mb:.1f} MB: {t*1e3:.3f} ms  {mb/1e3/t:.0f} GB/s",
              flush=True)

    print("--- two pallas calls per iteration ---", flush=True)
    w = jnp.round(
        jax.random.normal(key, (1024, N), jnp.float32) * 40
    ).clip(-127, 127).astype(jnp.int8)
    one = read_fn(1024, 256)

    def two(w):
        a = one(w)
        # True dependency: roll w by a data-dependent 0/1 rows (one
        # ~15 MB copy, ~20 us at the roof — small vs the fixed cost
        # under test).  x*0-style folds would dead-code the first call.
        w2 = jnp.roll(w, jnp.int32(a[0, 0]) & 1, axis=0)
        return one(w2)

    t = chain_bench(two, (w,), iters=256)
    print(f"2x read 14.7 MB (+1 roll copy): {t*1e3:.3f} ms", flush=True)

    print("--- XLA dependent small dots vs one big dot ---", flush=True)
    K = 4096
    x = jax.random.normal(key, (16, K), jnp.bfloat16)
    ws = jax.random.normal(key, (32, K, 448), jnp.bfloat16) * 0.02  # 32 x 3.7MB
    wbig = jax.random.normal(key, (K, 32 * 448), jnp.bfloat16) * 0.02

    def chain32(x, ws):
        h = x
        tot = jnp.float32(0.0)
        for i in range(32):
            o = jnp.einsum("mk,kn->mn", h, ws[i])  # (16, 448)
            tot = tot + jnp.float32(o[0, 0])  # every dot feeds the result
            # Dependency that cannot be folded or commuted through the
            # next dot: roll the CONTRACTION axis by a data-dependent 0/1.
            h = jnp.roll(x, jnp.int32(o[0, 0]) & 1, axis=1)
        return tot

    t = chain_bench(chain32, (x, ws), iters=128)
    print(f"32 dependent dots (3.7 MB each): {t*1e3:.3f} ms", flush=True)

    def big(x, w):
        return jnp.einsum("mk,kn->mn", x, w)

    t = chain_bench(big, (x, wbig), iters=128)
    print(f"1 big dot (117 MB): {t*1e3:.3f} ms  "
          "(additive-perturb caveat applies; treat as lower bound)",
          flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
