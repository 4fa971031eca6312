"""Where does the fused layer tail's time go?  Kernel-level chained
timing of ops/qmlp.fused_layer_tail variants vs the two-qmm-call path it
replaces, at Llama-3-8B decode shapes, round-robin in ONE process.

Hypothesis under test: the gate/up tiles are COLUMN blocks of the
row-major (E, 2I) int8 matrix — a strided DMA (block_i-byte chunks,
2I-byte stride), the exact pattern benchmarks/qmm_floor_probe.py measured
at ~291 GB/s vs ~760+ contiguous — so the fused kernel wins its op-count
bet but loses it back on DMA efficiency.

Usage: python benchmarks/qmlp_probe.py   (TPU; ONE process only)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu.models import llama, quantized
from quantumattention_tpu.ops import qmlp, qmm
from quantumattention_tpu.utils.profiling import chain_bench

cfg = llama.llama3_8b()
E, I, Q = cfg.hidden_size, cfg.intermediate_size, cfg.q_dim
M = 16
key = jax.random.PRNGKey(0)
kx, ka, k1, k2, k3, k4 = jax.random.split(key, 6)

wg = quantized.quantize_matrix(jax.random.normal(k1, (E, I), jnp.float32) / E**0.5)
wu = quantized.quantize_matrix(jax.random.normal(k2, (E, I), jnp.float32) / E**0.5)
wgu = {
    "q": jnp.concatenate([wg["q"], wu["q"]], axis=-1),
    "s": jnp.concatenate([wg["s"], wu["s"]], axis=-1),
}
wd = quantized.quantize_matrix(
    jax.random.normal(k3, (I, E), jnp.float32) / I**0.5
)
wo = quantized.quantize_matrix(
    jax.random.normal(k4, (Q, E), jnp.float32) / Q**0.5
)
norm = jnp.ones((E,), jnp.float32)
x = jax.random.normal(kx, (M, E)).astype(jnp.bfloat16)
attn = jax.random.normal(ka, (M, Q)).astype(jnp.bfloat16)
jax.block_until_ready((wgu, wd, wo))

GU_B, D_B, O_B = E * 2 * I, I * E, Q * E


def report(name, t, bytes_):
    print(json.dumps({
        "variant": name,
        "ms": round(t * 1e3, 3),
        "weight_GBs": round(bytes_ / t / 1e9, 1),
    }), flush=True)


# Weights ride as chain_bench ARGS, not closures: closed-over device
# arrays become XLA program constants, and ~0.5 GB constant blobs hang or
# kill the tunnel relay (CLAUDE.md; reproduced by prefill_probe's first
# lm_head attempt).
def time_tail(name, bytes_, **kw):
    with_wo = kw.pop("with_wo", True)

    def fn(x, attn, wgu, wd, wo):
        return qmlp.fused_layer_tail(
            x, norm, wgu, wd, eps=1e-5, interpret=False,
            **(dict(attn_out=attn, wo=wo) if with_wo else {}), **kw,
        )
    t = chain_bench(fn, (x, attn, wgu, wd, wo), iters=256, reps=3, perturb=0)
    report(name, t, bytes_)
    return t


def time_qmm_pair():
    def fn(x, wgu, wd):
        h = qmm.quantized_matmul(x, wgu["q"], wgu["s"])
        gate, up = jnp.split(h, 2, axis=-1)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
        return qmm.quantized_matmul(act, wd["q"], wd["s"])
    t = chain_bench(fn, (x, wgu, wd), iters=256, reps=3, perturb=0)
    report("qmm_pair(gate_up+down)", t, GU_B + D_B)
    return t


def time_qmm_single():
    t = chain_bench(
        lambda x, w: qmm.quantized_matmul(x, w["q"], w["s"]),
        (x, wgu), iters=256, reps=3, perturb=0,
    )
    report("qmm_gate_up_only", t, GU_B)
    t2 = chain_bench(
        lambda a, w: qmm.quantized_matmul(a, w["q"], w["s"]),
        (jax.random.normal(kx, (M, I)).astype(jnp.bfloat16), wd),
        iters=256, reps=3, perturb=0,
    )
    report("qmm_down_only", t2, D_B)


def main():
    # round-robin: tail variants interleaved with the qmm pair, twice
    for rnd in range(2):
        time_tail(f"tail_wo_auto_r{rnd}", GU_B + D_B + O_B)
        time_qmm_pair()
        time_tail(f"tail_nowo_auto_r{rnd}", GU_B + D_B, with_wo=False)
        time_tail(f"tail_wo_bi512_r{rnd}", GU_B + D_B + O_B, block_i=512)
        time_tail(
            f"tail_nowo_bi2048_r{rnd}", GU_B + D_B, with_wo=False,
            block_i=2048,
        )
    time_qmm_single()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
