"""Windowed-decode block-size sweep: does a window-matched block_kv unlock
the full fetch-elision ratio?

validate_decode_modes.py measured window(1023) at block_kv=4096 = 1.55x over
full — consistent with streaming ONE 4096-block (half the 8192 cache).  The
elision granularity is the KV block, so block_kv should track the window.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from quantumattention_tpu.ops.decode import decode_attention
from quantumattention_tpu.utils.profiling import chain_bench

Bt, Hkvt, Hqt, Dt, St = 32, 8, 32, 128, 8192
t1, t2, t3 = jax.random.split(jax.random.PRNGKey(9), 3)
qt = jax.random.normal(t1, (Bt, Hqt, Dt), jnp.bfloat16)
ktc = jax.random.randint(t2, (Bt, Hkvt, St, Dt), -127, 127, jnp.int8)
vtc = jax.random.randint(t3, (Bt, Hkvt, St, Dt), -127, 127, jnp.int8)
kts = jnp.full((Bt, Hkvt, St), 0.01, jnp.float32)
vts = jnp.full((Bt, Hkvt, St), 0.01, jnp.float32)
lt = jnp.full((Bt,), St, jnp.int32)
bytes_full = Bt * Hkvt * St * Dt * 2 + Bt * Hkvt * St * 4 * 2

print(f"devices: {jax.devices()}", flush=True)
print(f"full-cache stream: {bytes_full/1e6:.0f} MB", flush=True)

for label, window, bkv in [
    ("full  bkv=4096", None, 4096),
    ("w1023 bkv=4096", (1023, 0), 4096),
    ("w1023 bkv=2048", (1023, 0), 2048),
    ("w1023 bkv=1024", (1023, 0), 1024),
    ("w1023 bkv=512 ", (1023, 0), 512),
    ("full  bkv=1024", None, 1024),
]:
    t = chain_bench(
        lambda q, k, v, ks, vs, l, w=window, b=bkv: decode_attention(
            q, k, v, l, k_scale=ks, v_scale=vs, window=w, block_kv=b,
            interpret=False
        ),
        (qt, ktc, vtc, kts, vts, lt), iters=256,
    )
    print(
        f"{label}: {t*1e3:.3f} ms/step  "
        f"({bytes_full/t/1e9:.0f} GB/s-equivalent if full)  "
        f"[{time.strftime('%H:%M:%S')}]",
        flush=True,
    )
print("DONE", flush=True)
