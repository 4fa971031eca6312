"""What binds the w8a16 qmm kernel at decode shapes?

qmm at M=16 measures ~0.177 ms for a 58.7 MB weight stream (347 GB/s,
2.4x off the HBM roof) at EVERY block size — so it is not block-limited.
Candidates: (a) the int8->bf16 weight convert (58.7M VPU converts per
matmul), (b) the DMA itself through this grid.  Probes, all Pallas (sound
under chain_bench):

  * floor: same grid/BlockSpecs, but the kernel only touches 16 rows of
    each weight tile — the DMA still streams the full tile, compute is
    negligible.  If floor == qmm, the kernel is DMA-bound as laid out.
  * w8a8: int8 activations (quantized once per step), int8x int8 MXU dot,
    fp32 epilogue on the (M, bn) OUTPUT only — removes the 58.7M-element
    weight convert entirely.
  * bf16 roll-K baseline: jnp.roll on the CONTRACTION axis does not
    commute with the dot, so this one is finally a sound XLA bf16 number.

Usage: python benchmarks/qmm_floor_probe.py  (TPU; ONE process only)
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu.models import quantized
from quantumattention_tpu.ops import qmm
from quantumattention_tpu.utils.profiling import chain_bench


def rollk_bench(fn, args, iters=128, reps=3):
    @jax.jit
    def run_n(*a):
        def body(c, _):
            pa = list(a)
            pa[0] = jnp.roll(pa[0], c, axis=1)  # contraction axis: no commute
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


def _floor_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Touch only 16 rows of the streamed tile: DMA unchanged, compute ~nil.
    acc_ref[...] += w_ref[0:16, :].astype(jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _w8a8_kernel(xq_ref, w_ref, s_ref, xs_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        xq_ref[...], w_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = (
            acc_ref[...] * s_ref[...] * xs_ref[...]
        ).astype(o_ref.dtype)


def main():
    M, K, N = 16, 4096, 14336
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (M, K), jnp.bfloat16)
    w = quantized.quantize_matrix(jax.random.normal(k2, (K, N), jnp.float32) * 0.02)
    w_bf = w["q"].astype(jnp.bfloat16)
    flops = 2 * M * K * N
    i8 = K * N

    t = rollk_bench(lambda x, w: jnp.einsum("mk,kn->mn", x, w), (x, w_bf), 128)
    print(f"bf16 dot (roll-K sound): {t*1e3:.3f} ms  {2*i8/t/1e9:.0f} GB/s", flush=True)

    t = chain_bench(lambda x, wq, s: qmm.quantized_matmul(x, wq, s),
                    (x, w["q"], w["s"]), iters=256)
    print(f"qmm w8a16: {t*1e3:.3f} ms  {i8/t/1e9:.0f} GB/s  {flops/t/1e12:.1f} TFLOP/s",
          flush=True)

    bm, bn, bk = 16, 512, 2048
    grid = (1, N // bn, K // bk)

    def floor(x, wq, s):
        return pl.pallas_call(
            functools.partial(_floor_kernel, n_k=K // bk),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
                pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((bm, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(x, wq, s.reshape(1, N))

    t = chain_bench(floor, (x, w["q"], w["s"]), iters=256)
    print(f"DMA floor (same grid): {t*1e3:.3f} ms  {i8/t/1e9:.0f} GB/s", flush=True)

    # w8a8: activations pre-quantized per row (cost excluded here — it is
    # one 16x4096 pass, negligible at step level)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    xs = jnp.maximum(amax / 127.0, 1e-8)
    xq = jnp.round(x.astype(jnp.float32) / xs).clip(-127, 127).astype(jnp.int8)

    def w8a8(xq, wq, s, xs):
        return pl.pallas_call(
            functools.partial(_w8a8_kernel, n_k=K // bk),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
                pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
                pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((bm, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(xq, wq, s.reshape(1, N), xs)

    t = chain_bench(w8a8, (xq, w["q"], w["s"], xs), iters=256)
    print(f"w8a8 int8-MXU kernel: {t*1e3:.3f} ms  {i8/t/1e9:.0f} GB/s", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
