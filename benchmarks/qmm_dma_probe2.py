"""DMA concurrency probe: how many parallel weight streams saturate HBM?

probe1: one stream 293 GB/s, two streams 440 — the per-stream DMA is
latency/queue-limited, not bandwidth-limited.  Decode attention (723 GB/s)
keeps 4+ block fetches in flight.  Tested here:
  * S separate input operands (S concurrent Mosaic streams), S = 2/4/8;
  * one 3-D multi-chunk block ((S, bk, N) of a reshaped (S, K/S, N)) —
    same bytes, possibly split into S descriptors internally.

Usage: python benchmarks/qmm_dma_probe2.py  (TPU; ONE process only)
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

K, N = 4096, 14336
TOTAL = K * N


def _multi_kernel(*refs, n_k, n_in):
    ins = refs[:n_in]
    o_ref = refs[n_in]
    acc_ref = refs[n_in + 1]
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for r in ins:
        acc_ref[...] += r[0:16, :].astype(jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def multi_stream(parts, bk, label, iters=256):
    n_in = len(parts)
    rows = parts[0].shape[0]
    n_k = rows // bk
    fn = lambda *ps: pl.pallas_call(
        functools.partial(_multi_kernel, n_k=n_k, n_in=n_in),
        grid=(n_k,),
        in_specs=[pl.BlockSpec((bk, N), lambda k: (k, 0))] * n_in,
        out_specs=pl.BlockSpec((16, N), lambda k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((16, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((16, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(*ps)
    t = chain_bench(fn, tuple(parts), iters=iters)
    print(f"{label}: {t*1e3:.3f} ms  {TOTAL/t/1e9:.0f} GB/s", flush=True)


def _chunk_kernel(w_ref, o_ref, acc_ref, *, n_k, s):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += w_ref[0, 0:16, :].astype(jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def multichunk(w3, bk, label, iters=256):
    s, rows, _ = w3.shape
    n_k = rows // bk
    fn = lambda w: pl.pallas_call(
        functools.partial(_chunk_kernel, n_k=n_k, s=s),
        grid=(n_k,),
        in_specs=[pl.BlockSpec((s, bk, N), lambda k: (0, k, 0))],
        out_specs=pl.BlockSpec((16, N), lambda k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((16, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((16, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(w)
    t = chain_bench(fn, (w3,), iters=iters)
    print(f"{label}: {t*1e3:.3f} ms  {TOTAL/t/1e9:.0f} GB/s", flush=True)


def main():
    w8 = jnp.round(
        jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 40
    ).clip(-127, 127).astype(jnp.int8)

    for s in (2, 4, 8):
        parts = [
            jnp.array(w8[i * (K // s):(i + 1) * (K // s)]) for i in range(s)
        ]
        for bk in (256, 128):
            if (K // s) % bk:
                continue
            multi_stream(parts, bk, f"{s} streams bk={bk}")

    for s in (4, 8):
        w3 = w8.reshape(s, K // s, N)
        for bk in (256, 128):
            if (K // s) % bk:
                continue
            multichunk(w3, bk, f"multichunk s={s} bk={bk}")

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
