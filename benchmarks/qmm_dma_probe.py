"""Pure-DMA probes for the qmm weight stream.

qmm full-width tiles still measure ~314 GB/s on a 59 MB weight read while
the decode-attention kernel sustains 723 GB/s on the same chip.  Isolate
the DMA: kernels that only stream the weight matrix (touching 16 rows per
tile so Mosaic cannot skip the fetch), swept over tile depth, plus a
two-stream variant (decode attention reads K and V — two arrays — per
step; maybe one DMA queue cannot saturate HBM alone).

Usage: python benchmarks/qmm_dma_probe.py  (TPU; ONE process only)
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


def _read_kernel(w_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += w_ref[0:16, :].astype(jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def read_bench(w, bk, label, iters=256):
    n_k = K // bk
    fn = lambda w: pl.pallas_call(
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
    t = chain_bench(fn, (w,), iters=iters)
    nbytes = K * N * w.dtype.itemsize
    print(f"{label} bk={bk}: {t*1e3:.3f} ms  {nbytes/t/1e9:.0f} GB/s", flush=True)
    return t


def _read2_kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += a_ref[0:16, :].astype(jnp.float32)
    acc_ref[...] += b_ref[0:16, :].astype(jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def read2_bench(a, b, bk, label, iters=256):
    n_k = K // bk
    fn = lambda a, b: pl.pallas_call(
        functools.partial(_read2_kernel, n_k=n_k),
        grid=(n_k,),
        in_specs=[
            pl.BlockSpec((bk, N), lambda k: (k, 0)),
            pl.BlockSpec((bk, N), lambda k: (k, 0)),
        ],
        out_specs=pl.BlockSpec((16, N), lambda k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((16, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((16, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(a, b)
    t = chain_bench(fn, (a, b), iters=iters)
    nbytes = 2 * K * N * a.dtype.itemsize
    print(f"{label} bk={bk}: {t*1e3:.3f} ms  {nbytes/t/1e9:.0f} GB/s", flush=True)


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    w8 = jnp.round(jax.random.normal(k1, (K, N), jnp.float32) * 40).clip(
        -127, 127
    ).astype(jnp.int8)
    w8b = jnp.round(jax.random.normal(k2, (K, N), jnp.float32) * 40).clip(
        -127, 127
    ).astype(jnp.int8)
    wbf = (jax.random.normal(k2, (K, N), jnp.float32) * 0.02).astype(jnp.bfloat16)

    for bk in (256, 512, 1024):
        read_bench(w8, bk, "int8 read")
    read_bench(wbf, 512, "bf16 read", iters=128)
    for bk in (256, 512):
        read2_bench(w8, w8b, bk, "int8 dual read")

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
