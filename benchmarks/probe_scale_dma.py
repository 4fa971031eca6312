"""Which page_size=256 scale-page layout can Mosaic DMA?

The paged kernel's per-page scale slice works at page_size=128 (a (128,)
1-D slab) but ps=256 trips "dimension 1 must be aligned to tiling (8)"
(README:261, VERDICT r4 item 4).  This probe compiles a minimal
one-page-gather kernel against candidate scale layouts and reports which
lower + run:

  a) (H, P, 256)        slice (256,)        — the failing baseline
  b) (H, P, 2, 128)     slice (2, 128)      — minor realigned to 128
  c) (H, P, 8, 32)      slice (8, 32)       — sublane-padded
  d) (H, P, 2, 128) two (128,) sub-row DMAs — known-good shape, 2 copies

Usage: python benchmarks/probe_scale_dma.py   (TPU; ONE process only)
"""

import functools
import json
import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")

H, P, PS = 2, 16, 256


def kernel(pages_ref, out_ref, buf, sem, *, mode):
    if mode == "d":
        c0 = pltpu.make_async_copy(pages_ref.at[0, 3, 0], buf.at[0], sem)
        c1 = pltpu.make_async_copy(pages_ref.at[0, 3, 1], buf.at[1], sem)
        c0.start(); c1.start(); c0.wait(); c1.wait()
    else:
        c = pltpu.make_async_copy(pages_ref.at[0, 3], buf, sem)
        c.start(); c.wait()
    out_ref[...] = buf[...].reshape(out_ref.shape)


def try_mode(mode, shape, buf_shape):
    pages = jnp.arange(np.prod(shape), dtype=jnp.float32).reshape(shape)
    try:
        out = pl.pallas_call(
            functools.partial(kernel, mode=mode),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(buf_shape, lambda: (0,) * len(buf_shape)),
            out_shape=jax.ShapeDtypeStruct(buf_shape, jnp.float32),
            scratch_shapes=[
                pltpu.VMEM(buf_shape, jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(pages)
        got = np.asarray(out).reshape(-1)
        want = np.asarray(pages[0, 3]).reshape(-1)
        ok = bool((got == want).all())
        print(json.dumps({"mode": mode, "shape": list(shape),
                          "compiles": True, "correct": ok}), flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(json.dumps({"mode": mode, "shape": list(shape),
                          "compiles": False, "err": msg}), flush=True)


if "--all" in sys.argv:
    try_mode("a", (H, P, PS), (PS,))
    try_mode("b", (H, P, 2, 128), (2, 128))
    try_mode("c", (H, P, 8, 32), (8, 32))
    try_mode("d", (H, P, 2, 128), (2, 128))
    print("DONE", flush=True)


def kernel_e(pages_ref, out_ref, buf, sem):
    c0 = pltpu.make_async_copy(
        pages_ref.at[0, 3, pl.ds(0, 128)], buf.at[pl.ds(0, 128)], sem
    )
    c1 = pltpu.make_async_copy(
        pages_ref.at[0, 3, pl.ds(128, 128)], buf.at[pl.ds(128, 128)], sem
    )
    c0.start(); c1.start(); c0.wait(); c1.wait()
    out_ref[...] = buf[...]


def try_e():
    pages = jnp.arange(H * P * PS, dtype=jnp.float32).reshape(H, P, PS)
    try:
        out = pl.pallas_call(
            kernel_e,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((PS,), lambda: (0,)),
            out_shape=jax.ShapeDtypeStruct((PS,), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((PS,), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(pages)
        got = np.asarray(out)
        want = np.asarray(pages[0, 3])
        print(json.dumps({"mode": "e", "compiles": True,
                          "correct": bool((got == want).all())}), flush=True)
    except Exception as e:
        print(json.dumps({"mode": "e", "compiles": False,
                          "err": str(e).split("\n")[0][:160]}), flush=True)


try_e()
print("DONE-E", flush=True)
