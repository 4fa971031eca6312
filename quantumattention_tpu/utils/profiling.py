"""Profiling / timing utilities (SURVEY.md §5 tracing subsystem).

The reference's profiling story is nvcc ``-lineinfo`` plus
``triton.testing.do_bench`` inside tests; the TPU-native equivalents are
XProf traces via ``jax.profiler`` and a forced-fetch timing helper that is
robust to async dispatch (plain ``block_until_ready`` can lie through RPC
tunnels — a device fetch cannot).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/quantumattention_xprof") -> Iterator[None]:
    """Capture an XProf trace of the enclosed block.

    View with ``xprof`` / TensorBoard's profile plugin.  The analogue of
    profiling the reference's kernels with Nsight via -lineinfo.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def do_bench(
    fn: Callable[[], jax.Array],
    iters: int = 10,
    warmup: int = 2,
    reps: int = 3,
) -> float:
    """Median seconds/iteration of ``fn`` with forced device fetches.

    The contract of ``triton.testing.do_bench`` (reference
    tests/test_interface.py:127,136) re-expressed for TPU: every rep chains
    ``iters`` executions and ends with a scalar fetch so the async runtime
    must drain.

    CAVEAT (measured, see bench.py): each async dispatch still costs
    ~1.5 ms through the device tunnel, and the final fetch ~30 ms — fine
    for multi-ms kernels, but sub-ms kernels need :func:`chain_bench`
    (iterations chained inside ONE jitted program).
    """
    for _ in range(warmup):
        float(jnp.sum(fn()).astype(jnp.float32))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        float(jnp.sum(out).astype(jnp.float32))
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[len(times) // 2]


def chain_bench(
    fn: Callable[..., jax.Array],
    args,
    iters: int = 64,
    reps: int = 3,
    perturb: int = 0,
) -> float:
    """Median seconds/iteration of ``fn(*args)`` with iterations chained
    through a data dependency inside ONE jitted scan.

    One host dispatch+fetch roundtrip costs a fixed ~33 ms (t(I) =
    fixed/I + t_true, measured in bench.py); chaining amortizes it to
    fixed/iters.  ``perturb`` names the positional arg that gets the
    running carry folded in so XLA cannot hoist or dedupe iterations —
    pick a small input (e.g. q), its extra read+write is part of every
    iteration.

    SOUND ONLY FOR PALLAS KERNELS (opaque to XLA).  For XLA-native
    matmuls the additive perturbation is distributable —
    dot(x + bcast(c), w) = dot(x, w) + dot(bcast(c), w) — and XLA hoists
    the loop-invariant dot out of the scan: measured 1102 TFLOP/s
    (5.6x MXU peak) for a plain bf16 einsum this way
    (benchmarks/exp_w8a16.py).  Time XLA matmuls with a data-dependent
    jnp.roll of the activation instead (benchmarks/qmm_sweep.py's
    roll_chain_bench).
    """

    @jax.jit
    def run_n(*a):
        def body(c, _):
            pa = list(a)
            pa[perturb] = pa[perturb] + c.astype(pa[perturb].dtype)
            o = fn(*pa)
            return jnp.float32(o.reshape(-1)[0]) * 0.0, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run_n(*args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run_n(*args))
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[len(times) // 2]


def attention_tflops(
    seconds: float,
    batch: int,
    heads: int,
    q_len: int,
    kv_len: int,
    head_dim: int,
    causal: bool = False,
) -> float:
    """Reference FLOP model (tests/test_interface.py:121-126)."""
    flops = 2 * (2 * batch * heads * q_len * kv_len * head_dim)
    if causal:
        flops //= 2
    return flops / seconds / 1e12
