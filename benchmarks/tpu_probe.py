"""Tiny TPU liveness probe: init backend, run one matmul, fetch."""
import sys
sys.path.insert(0, "/root/repo")
import time

t0 = time.time()
import jax
import jax.numpy as jnp

print(f"jax imported {time.time()-t0:.1f}s", flush=True)
devs = jax.devices()
print(f"devices: {devs} ({time.time()-t0:.1f}s)", flush=True)
x = jnp.ones((256, 256), jnp.bfloat16)
y = x @ x
print(f"matmul sum: {float(jnp.sum(y)):.1f} ({time.time()-t0:.1f}s)", flush=True)
print("TPU_OK", flush=True)
