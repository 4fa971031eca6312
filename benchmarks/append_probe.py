"""Isolate the decode cache-append cost at 64 slots x 32 layers.

megastep_step_probe measured the full mega step at 21.3 ms vs 13.1
without the append — ~8 ms for what should be a ~130 KB-per-layer row
write.  This probe times JUST the append in the engine's real structure
(caches carried through a scan) under several formulations:

  batched   — kvc.append_quantized_token (one hinted scatter per array)
  perslot   — per-slot dynamic_update_slice fori loop (the pre-r4 form)
  nothing   — carry the caches untouched (loop/carry floor)
  onerow    — single dynamic_update_slice at a shared row (in-place
              update floor: what a copy-free write should cost)

Usage: python benchmarks/append_probe.py  (TPU; ONE process only)
"""

import dataclasses
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu.serving import kv_cache as kvc

B, Hkv, MAXLEN, D, L, STEPS = 64, 8, 512, 128, 32, 64


def fresh_caches():
    out = []
    for _ in range(L):
        c = kvc.init_cache(B, Hkv, MAXLEN, D, jnp.int8)
        out.append(dataclasses.replace(
            c, lengths=jnp.full((B,), 128, jnp.int32)
        ))
    return out


kq = jnp.ones((B, Hkv, D), jnp.int8)
ks = jnp.ones((B, Hkv), jnp.float32)


def append_batched(c, positions, nval):
    return kvc.append_quantized_token(c, kq, ks, kq, ks, positions, nval)


def append_perslot(c, positions, nval):
    def body(i, carry):
        ck, cv, cks, cvs = carry
        ck = jax.lax.dynamic_update_slice(
            ck, kq[i][None, :, None, :], (i, 0, positions[i], 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cv, kq[i][None, :, None, :], (i, 0, positions[i], 0)
        )
        cks = jax.lax.dynamic_update_slice(
            cks, ks[i][None, :, None], (i, 0, positions[i])
        )
        cvs = jax.lax.dynamic_update_slice(
            cvs, ks[i][None, :, None], (i, 0, positions[i])
        )
        return ck, cv, cks, cvs

    ck, cv, cks, cvs = jax.lax.fori_loop(
        0, B, body, (c.k, c.v, c.k_scale, c.v_scale)
    )
    return kvc.KVCache(k=ck, v=cv, lengths=positions + nval,
                       k_scale=cks, v_scale=cvs)


def append_onerow(c, positions, nval):
    # One contiguous (B, Hkv, 1, D) write at a SHARED row — the floor a
    # copy-free in-place write should hit.
    row = positions[0]
    ck = jax.lax.dynamic_update_slice(
        c.k, kq[:, :, None, :], (0, 0, row, 0)
    )
    cv = jax.lax.dynamic_update_slice(
        c.v, kq[:, :, None, :], (0, 0, row, 0)
    )
    cks = jax.lax.dynamic_update_slice(
        c.k_scale, ks[:, :, None], (0, 0, row)
    )
    cvs = jax.lax.dynamic_update_slice(
        c.v_scale, ks[:, :, None], (0, 0, row)
    )
    return kvc.KVCache(k=ck, v=cv, lengths=positions + nval,
                       k_scale=cks, v_scale=cvs)


def append_nothing(c, positions, nval):
    return dataclasses.replace(c, lengths=positions + nval)


for mode, fn in (
    ("nothing", append_nothing),
    ("onerow", append_onerow),
    ("batched", append_batched),
    ("perslot", append_perslot),
):
    def burst(caches):
        def one(carry, _):
            caches, step = carry
            positions = caches[0].lengths
            nval = jnp.ones((B,), jnp.int32)
            caches = [fn(c, positions, nval) for c in caches]
            return (caches, step + 1), None

        (caches, _), _ = jax.lax.scan(
            one, (caches, jnp.int32(0)), None, length=STEPS
        )
        return caches[0].lengths

    jitted = jax.jit(burst, donate_argnums=(0,))
    out = np.asarray(jitted(fresh_caches()))  # compile + warm
    times = []
    for _ in range(3):
        caches = fresh_caches()
        jax.block_until_ready(caches[-1].k)
        t0 = time.perf_counter()
        out = np.asarray(jitted(caches))
        times.append((time.perf_counter() - t0) / STEPS)
    t = sorted(times)[1]
    print(json.dumps({"mode": mode, "ms_per_step": round(t * 1e3, 3)}),
          flush=True)
print("DONE", flush=True)


# ---- interaction: does a pallas consumer of the scatter output force
# ---- the scatter to copy?
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _read_kernel(k_ref, o_ref):
    o_ref[...] = k_ref[0, 0].astype(jnp.float32)


def pallas_read(c):
    return pl.pallas_call(
        _read_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(
            (1, 1, MAXLEN, D), lambda i: (0, 0, 0, 0)
        )],
        out_specs=pl.BlockSpec((MAXLEN, D), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((MAXLEN, D), jnp.float32),
    )(c.k)


def xla_read(c):
    return c.k[0, 0].astype(jnp.float32)


_appenders = {"app": append_batched, "dusapp": append_perslot,
              "onerowapp": append_onerow, "noapp": append_nothing}


for mode, reader in (
    ("app+xla_read", xla_read),
    ("app+pallas_read", pallas_read),
    ("dusapp+pallas_read", pallas_read),
    ("onerowapp+pallas_read", pallas_read),
    ("noapp+pallas_read", pallas_read),
):
    def burst(caches, x0):
        def one(carry, _):
            caches, acc = carry
            positions = caches[0].lengths
            nval = jnp.ones((B,), jnp.int32)
            app = _appenders[mode.split("+")[0]]
            caches = [app(c, positions, nval) for c in caches]
            for c in caches:
                acc = acc + reader(c)[0, 0]
            return (caches, acc), None

        (caches, acc), _ = jax.lax.scan(
            one, (caches, x0), None, length=STEPS
        )
        return acc

    jitted = jax.jit(burst, donate_argnums=(0,))
    out = float(jitted(fresh_caches(), jnp.float32(0)))
    times = []
    for _ in range(3):
        caches = fresh_caches()
        jax.block_until_ready(caches[-1].k)
        t0 = time.perf_counter()
        out = float(jitted(caches, jnp.float32(0)))
        times.append((time.perf_counter() - t0) / STEPS)
    t = sorted(times)[1]
    print(json.dumps({"mode": mode, "ms_per_step": round(t * 1e3, 3)}),
          flush=True)
print("DONE2", flush=True)
