"""A/B: multi-stream qmm on the LM-head decode shape.

The head (M=64..96, K=4096, N=128256 int8) runs one big matmul whose
weight stream sits at the ~293 GB/s single-stream DMA floor (1.8 ms of a
35 ms 96-slot step — decode_phase_probe).  ``n_streams`` splits the K
range into concurrent weight streams (the tail kernel's multi-operand
streaming aggregates ~500 GB/s the same way).

Usage: python benchmarks/exp_qmm_streams.py   (TPU; ONE process only)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu.ops import qmm
from quantumattention_tpu.utils.profiling import chain_bench

M, K, N = 96, 4096, 128256
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
x = jax.random.normal(k1, (M, K), jnp.bfloat16)
w = jax.random.randint(k2, (K, N), -127, 128, jnp.int8)
scale = jnp.full((N,), 1e-2, jnp.float32)
wbytes = K * N

# numerics first
ref = np.asarray(qmm.quantized_matmul(x, w, scale, n_streams=1), np.float32)
for s in (2, 4):
    out = np.asarray(qmm.quantized_matmul(x, w, scale, n_streams=s), np.float32)
    err = float(np.sqrt(np.mean((out - ref) ** 2))) / max(
        float(np.sqrt(np.mean(ref**2))), 1e-9
    )
    print(json.dumps({"check": f"s={s} vs s=1 rel-rmse", "err": err}),
          flush=True)
    assert err < 1e-5, err

for rnd in range(2):
    for s in (1, 2, 4):
        t = chain_bench(
            lambda x, w, sc, s=s: qmm.quantized_matmul(x, w, sc, n_streams=s),
            (x, w, scale),
            iters=64,
        )
        print(json.dumps({
            "round": rnd, "n_streams": s, "ms": round(t * 1e3, 3),
            "gb_s": round(wbytes / t / 1e9, 1),
        }), flush=True)
print("DONE", flush=True)
