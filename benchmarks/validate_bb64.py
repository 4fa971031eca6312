"""Compiled-chip validation + A/B for the large batch-block decode path.

Round 4 extended `_pick_block_batch` to bb up to 64 (short-cache serving
shapes stream bigger slabs).  CPU interpret tests only exercise small
batches, so: (1) check bb=64/32/16 against the fp32 oracle ON CHIP at the
serving shape, (2) A/B block_kv 512 (whole-cache read) vs 256 (skip
blocks past each row's length) at half-full caches.

Usage: python benchmarks/validate_bb64.py   (TPU; ONE process only)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu.ops.decode import decode_attention
from quantumattention_tpu.ops.quant import dynamically_quantize_int8
from quantumattention_tpu.ops.sdpa import sdpa_reference
from quantumattention_tpu.utils.profiling import chain_bench

B, Hq, Hkv, D, S = 64, 32, 8, 128, 512
G = Hq // Hkv
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(k1, (B, Hq, D), jnp.bfloat16)
kraw = jax.random.normal(k2, (B, Hkv, S, D), jnp.float32)
vraw = jax.random.normal(k3, (B, Hkv, S, D), jnp.float32)
kc, ks = dynamically_quantize_int8(kraw)
vc, vs = dynamically_quantize_int8(vraw)
# ragged lengths, mid-generation shape (mean ~ S/2)
lens_np = np.asarray([(137 + 11 * i) % S or S for i in range(B)], np.int32)
lens = jnp.asarray(lens_np)

# oracle rows
def oracle_row(b):
    n = int(lens_np[b])
    o = sdpa_reference(
        q[b][None, :, None, :].astype(jnp.float32),
        jnp.repeat(kraw[b][None, :, :n], G, 1),
        jnp.repeat(vraw[b][None, :, :n], G, 1),
    )
    return np.asarray(o[0, :, 0], np.float32)


ref = np.stack([oracle_row(b) for b in range(B)])

for bb in (64, 32, 16, 8):
    out = decode_attention(
        q, kc, vc, lens, k_scale=ks, v_scale=vs, block_kv=512,
        block_batch=bb,
    )
    err = float(np.sqrt(np.mean((np.asarray(out, np.float32) - ref) ** 2)))
    print(json.dumps({"check": f"bb={bb} vs oracle", "rmse": round(err, 5)}),
          flush=True)
    assert err < 1e-2, (bb, err)

# A/B: whole-cache block (512) vs length-skipping blocks (256, 128)
for rnd in range(2):
    for bkv in (512, 256, 128):
        t = chain_bench(
            lambda q, k, v, ks, vs, l, bkv=bkv: decode_attention(
                q, k, v, l, k_scale=ks, v_scale=vs, block_kv=bkv
            ),
            (q, kc, vc, ks, vs, lens),
            iters=128,
        )
        print(json.dumps({"round": rnd, "block_kv": bkv,
                          "us_per_call": round(t * 1e6, 1)}), flush=True)
print("DONE", flush=True)
