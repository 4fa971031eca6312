"""Compiled-mode (real TPU) validation of int4 token-packed paged pages.

The int4 page layout (serving/paged_cache.init_layer_pages) packs two
tokens per byte along each page's token axis; the DMA kernel unpacks on
the sublane axis (ops/paged.py).  Interpret tests cover semantics; this
validates the compiled Mosaic path (page DMA slices have a ps/2 sublane
extent) and measures the stream halving vs int8 pages.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from quantumattention_tpu.ops.paged import paged_decode_attention
from quantumattention_tpu.ops.quant import (
    dynamically_quantize_int8,
    pack_int4,
    quantize_int4_values,
    unpack_int4,
)
from quantumattention_tpu.ops.sdpa import sdpa_reference
from quantumattention_tpu.utils.profiling import chain_bench

FAILED = []


def rmse(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def stamp(msg):
    print(f"--- {msg} ({time.strftime('%H:%M:%S')})", flush=True)


print(f"devices: {jax.devices()}", flush=True)

# ---- correctness: int4 pages vs dequantized oracle ----
stamp("compile+run: paged int4 DMA kernel (ps=128, D=128)")
B, Hkv, pps, ps, D = 2, 2, 8, 128, 128
Hq = Hkv * 4
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 3)
total_pages = B * pps + 3
k_pages = jax.random.normal(k1, (Hkv, total_pages, ps, D), jnp.float32)
v_pages = jax.random.normal(k2, (Hkv, total_pages, ps, D), jnp.float32)
rng = np.random.RandomState(0)
table = jnp.asarray(
    rng.permutation(total_pages - 1)[: B * pps].reshape(B, pps), jnp.int32
)
q = jax.random.normal(k3, (B, Hq, D), jnp.float32)
lengths = jnp.array([1024, 300], jnp.int32)

kq, ks = quantize_int4_values(k_pages, reduction_dim=-1)
vq, vs = quantize_int4_values(v_pages, reduction_dim=-1)
kp4, vp4 = pack_int4(kq, axis=2), pack_int4(vq, axis=2)

out = paged_decode_attention(
    q.astype(jnp.bfloat16), kp4, vp4, lengths, table,
    k_scale_pages=ks, v_scale_pages=vs, pages_per_block=2,
    use_dma=True, interpret=False,
)

kd = np.asarray(unpack_int4(kp4, jnp.float32, axis=2)) * np.asarray(ks)[..., None]
vd = np.asarray(unpack_int4(vp4, jnp.float32, axis=2)) * np.asarray(vs)[..., None]
tbl = np.asarray(table)
for b in range(B):
    n = int(lengths[b])
    kc = np.concatenate([kd[:, p] for p in tbl[b]], axis=1)[:, :n]
    vc = np.concatenate([vd[:, p] for p in tbl[b]], axis=1)[:, :n]
    ref = sdpa_reference(
        q[b][None, :, None, :], jnp.asarray(kc)[None], jnp.asarray(vc)[None]
    )[0, :, 0, :]
    r = rmse(out[b], ref)
    ok = r < 1e-2
    print(f"[{'PASS' if ok else 'FAIL'}] paged int4 seq {b}: rmse={r:.2e}",
          flush=True)
    if not ok:
        FAILED.append(f"seq{b}")

# ---- timing: int8 vs int4 pages at serving shapes ----
stamp("timing: paged decode int8 vs int4 pages (B=32, S=4096, 8B shapes)")
B, Hkv, Hq, D, S, ps = 32, 8, 32, 128, 4096, 128
pps = S // ps
total_pages = B * pps + 1
t1, t2, t3 = jax.random.split(jax.random.PRNGKey(9), 3)
q = jax.random.normal(t1, (B, Hq, D), jnp.bfloat16)
k8 = jax.random.randint(t2, (Hkv, total_pages, ps, D), -127, 127, jnp.int8)
v8 = jax.random.randint(t3, (Hkv, total_pages, ps, D), -127, 127, jnp.int8)
ksc = jnp.full((Hkv, total_pages, ps), 0.01, jnp.float32)
vsc = jnp.full((Hkv, total_pages, ps), 0.01, jnp.float32)
table = jnp.arange(B * pps, dtype=jnp.int32).reshape(B, pps)
lengths = jnp.full((B,), S, jnp.int32)

t_i8 = chain_bench(
    lambda q, k, v, ks, vs, l, t: paged_decode_attention(
        q, k, v, l, t, k_scale_pages=ks, v_scale_pages=vs,
        pages_per_block=4, use_dma=True, interpret=False,
    ),
    (q, k8, v8, ksc, vsc, lengths, table), iters=128,
)
k4 = pack_int4(jnp.clip(k8 // 16, -7, 7).astype(jnp.int8), axis=2)
v4 = pack_int4(jnp.clip(v8 // 16, -7, 7).astype(jnp.int8), axis=2)
t_i4 = chain_bench(
    lambda q, k, v, ks, vs, l, t: paged_decode_attention(
        q, k, v, l, t, k_scale_pages=ks, v_scale_pages=vs,
        pages_per_block=4, use_dma=True, interpret=False,
    ),
    (q, k4, v4, ksc, vsc, lengths, table), iters=128,
)
hbm8 = 2 * Hkv * B * pps * ps * D + 2 * Hkv * B * pps * ps * 4
print(
    f"int8 pages: {t_i8*1e3:.3f} ms/step ({hbm8/t_i8/1e9:.0f} GB/s)\n"
    f"int4 pages: {t_i4*1e3:.3f} ms/step (ratio {t_i8/t_i4:.2f}x; capacity "
    f"feature — halved pool residency)",
    flush=True,
)

print(f"\nDONE failed={FAILED}", flush=True)
sys.exit(1 if FAILED else 0)
