"""Experiment: would int4-packed weights speed up the fused layer tail?

The tail kernel is byte-bound (~510 GB/s over 191 MB of int8 weights —
qmlp_probe.py), so halving weight bytes could halve its time IF the
in-kernel nibble unpack is free.  The int4 KV-cache decode experiment
said otherwise at the HBM roof (unpack cost > DMA saving, CLAUDE.md);
this measures the same trade in the tail's regime (lower DMA rate, idle
VPU at M=16).

Standalone kernel copy (ops/qmlp.py stays untouched — editing it would
invalidate its compiled-kernel cache entries).  Weights are random; only
timing matters.  Round-robin vs the int8 production kernel in ONE
process.

Usage: python benchmarks/exp_w4a16_tail.py   (TPU; ONE process only)
"""

import functools
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu.models import llama, quantized
from quantumattention_tpu.ops import qmlp
from quantumattention_tpu.utils.profiling import chain_bench

cfg = llama.llama3_8b()
E, I, Q = cfg.hidden_size, cfg.intermediate_size, cfg.q_dim
M = 16


def _unpack_rows(packed, dtype):
    """(R/2, C) int8 nibbles -> (R, C): row r = low nibble of byte row r,
    row r + R/2 = high nibble (split-halves, sign-extended)."""
    low = packed.astype(jnp.int32) << 28 >> 28
    high = packed.astype(jnp.int32) >> 4
    return jnp.concatenate([low, high], axis=0).astype(dtype)


def _tail4_kernel(x_ref, norm_ref, wg_ref, wu_ref, gs_ref, us_ref,
                  wd_ref, ds_ref, o_ref, x1_s, h_s, acc, *, n_j, eps):
    j = pl.program_id(0)
    dt = x_ref.dtype

    @pl.when(j == 0)
    def _head():
        x1_s[...] = x_ref[...]
        xf = x_ref[...].astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        h_s[...] = (
            xf * jax.lax.rsqrt(var + eps) * norm_ref[...].astype(jnp.float32)
        ).astype(dt)
        acc[...] = jnp.zeros_like(acc)

    h = h_s[...]
    gate = (
        jax.lax.dot_general(
            h, _unpack_rows(wg_ref[...], dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * gs_ref[...]
    ).astype(dt)
    up = (
        jax.lax.dot_general(
            h, _unpack_rows(wu_ref[...], dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * us_ref[...]
    ).astype(dt)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(dt) * up
    acc[...] += jax.lax.dot_general(
        act, _unpack_rows(wd_ref[...], dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_j - 1)
    def _store():
        o_ref[...] = x1_s[...] + (acc[...] * ds_ref[...]).astype(dt)


def tail_int4(x, norm, wg_p, wu_p, gs, us, wd_p, ds, block_i=1024):
    n_j = I // block_i
    whole = lambda shape: pl.BlockSpec(shape, lambda j: (0, 0))
    return pl.pallas_call(
        functools.partial(_tail4_kernel, n_j=n_j, eps=1e-5),
        grid=(n_j,),
        in_specs=[
            whole((M, E)),
            whole((1, E)),
            pl.BlockSpec((E // 2, block_i), lambda j: (0, j)),
            pl.BlockSpec((E // 2, block_i), lambda j: (0, j)),
            pl.BlockSpec((1, block_i), lambda j: (0, j)),
            pl.BlockSpec((1, block_i), lambda j: (0, j)),
            pl.BlockSpec((block_i // 2, E), lambda j: (j, 0)),
            whole((1, E)),
        ],
        out_specs=whole((M, E)),
        out_shape=jax.ShapeDtypeStruct((M, E), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((M, E), x.dtype),
            pltpu.VMEM((M, E), x.dtype),
            pltpu.VMEM((M, E), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * E * 2 * I + 2 * M * I * E,
            bytes_accessed=(E * I + I * E // 2) + 2 * M * E * 2,
            transcendentals=M * I,
        ),
    )(x, norm, wg_p, wu_p, gs, us, wd_p, ds)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (M, E)).astype(jnp.bfloat16)
    norm = jnp.ones((1, E), jnp.float32)
    # int4 packed: random int8 in [-8, 7] packed two-per-byte along rows
    def pack(r, c, k):
        vals = jax.random.randint(k, (r, c), -8, 8, jnp.int32)
        lo, hi = vals[: r // 2], vals[r // 2 :]
        return ((lo & 0xF) | (hi << 4)).astype(jnp.int8)

    wg_p = pack(E, I, ks[1])
    wu_p = pack(E, I, ks[2])
    wd_p = pack(I, E, ks[3])
    gs = jnp.ones((1, I), jnp.float32)
    ds = jnp.ones((1, E), jnp.float32)

    # int8 production tail (no wo, same shapes) for the in-process baseline
    wg8 = quantized.quantize_matrix(jax.random.normal(ks[4], (E, I)) / E**0.5)
    wu8 = quantized.quantize_matrix(jax.random.normal(ks[5], (E, I)) / E**0.5)
    wgu8 = {"q": jnp.concatenate([wg8["q"], wu8["q"]], -1),
            "s": jnp.concatenate([wg8["s"], wu8["s"]], -1)}
    wd8 = quantized.quantize_matrix(
        jax.random.normal(ks[6], (I, E)) / I**0.5
    )
    jax.block_until_ready((wg_p, wgu8))

    int4_bytes = E * I + I * E // 2  # gate+up packed + down packed
    int8_bytes = E * 2 * I + I * E

    for rnd in range(2):
        t4 = chain_bench(
            lambda x, a, b, c: tail_int4(x, norm, a, b, gs, gs, c, ds),
            (x, wg_p, wu_p, wd_p), iters=256, reps=3, perturb=0,
        )
        print(json.dumps({
            "variant": f"tail_int4_r{rnd}", "ms": round(t4 * 1e3, 3),
            "weight_GBs": round(int4_bytes / t4 / 1e9, 1),
        }), flush=True)
        t8 = chain_bench(
            lambda x, gu, d: qmlp.fused_layer_tail(
                x, norm[0], gu, d, eps=1e-5, interpret=False
            ),
            (x, wgu8, wd8), iters=256, reps=3, perturb=0,
        )
        print(json.dumps({
            "variant": f"tail_int8_r{rnd}", "ms": round(t8 * 1e3, 3),
            "weight_GBs": round(int8_bytes / t8 / 1e9, 1),
        }), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
