"""Compiled-TPU validation of the decode mega-kernel (ops/megastep.py).

Interpret mode is laxer than Mosaic (CLAUDE.md), so every new kernel
needs one compiled run: this script checks the mega decode step against
the unfused step on the real chip at a mid-size config (multi-block
sweep + ragged lengths + inactive slots), then times both at that size.

Usage: python benchmarks/validate_megastep.py   (TPU; ONE process only)
"""

import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu import config
from quantumattention_tpu.models import llama, quantized
from quantumattention_tpu.ops import megastep as mega
from quantumattention_tpu.ops import quant
from quantumattention_tpu.serving.backends import SlotsBackend

cfg = llama.LlamaConfig(
    vocab_size=1024,
    hidden_size=512,
    intermediate_size=1024,
    num_layers=2,
    num_q_heads=8,
    num_kv_heads=2,
    head_dim=128,
    rope_theta=10000.0,
)
SLOTS, MAXLEN = 16, 2048

params = quantized.fuse_projections(
    quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
)
lengths = [1500, 5, 0, 1023, 1024, 1025, 40, 7] + [64] * 8
active = np.asarray([1] * 6 + [0, 1] + [1] * 8, bool)
tokens = np.arange(SLOTS, dtype=np.int32) % cfg.vocab_size


def fill(backend, seed=0):
    key = jax.random.PRNGKey(seed)
    out = []
    for c in backend.caches:
        k1, k2, key = jax.random.split(key, 3)
        kf = jax.random.normal(k1, c.k.shape, jnp.float32)
        vf = jax.random.normal(k2, c.k.shape, jnp.float32)
        kq, ks = quant.dynamically_quantize_int8(kf, reduction_dim=-1)
        vq, vs = quant.dynamically_quantize_int8(vf, reduction_dim=-1)
        out.append(dataclasses.replace(
            c, k=kq, v=vq, k_scale=ks, v_scale=vs,
            lengths=jnp.asarray(lengths, jnp.int32),
        ))
    backend.caches = out


def one_step(flag):
    be = SlotsBackend(cfg, num_slots=SLOTS, max_len=MAXLEN,
                      cache_dtype=jnp.int8)
    fill(be)
    with config.patch({"kernel.megastep": flag}):
        caches, logits = jax.jit(be._decode_step_impl)(
            params, be.caches, jnp.asarray(tokens), jnp.asarray(active)
        )
    return np.asarray(logits), [
        (np.asarray(c.k), np.asarray(c.lengths)) for c in caches
    ]


print("running unfused reference...", flush=True)
ref_logits, ref_caches = one_step(False)
print("running mega kernel (compiles through remote Mosaic)...", flush=True)
mega_logits, mega_caches = one_step(True)

scale = max(float(np.std(ref_logits)), 1e-6)
rmse = float(np.sqrt(np.mean((mega_logits - ref_logits) ** 2))) / scale
for (rk, rl), (mk, ml) in zip(ref_caches, mega_caches):
    np.testing.assert_array_equal(rl, ml)
print(json.dumps({"phase": "correctness", "logit_rmse_rel": round(rmse, 6),
                  "ok": rmse < 1e-2}), flush=True)
assert rmse < 1e-2

# quick relative timing at this size (chained scan over layers x steps)
from quantumattention_tpu.utils.profiling import chain_bench

for flag in (False, True):
    be = SlotsBackend(cfg, num_slots=SLOTS, max_len=MAXLEN,
                      cache_dtype=jnp.int8)
    fill(be)

    with config.patch({"kernel.megastep": flag}):
        def step(tok):
            caches, logits = be._decode_step_impl(
                params, be.caches, tok, jnp.asarray(active)
            )
            # Touch every layer's written cache so no append scatter is
            # dead code in the timing loop (the real burst threads the
            # caches through the scan carry).
            alive = sum(
                c.k[0, 0, 0, 0].astype(jnp.int32) for c in caches
            )
            nxt = jnp.argmax(logits, -1).astype(jnp.int32) + alive
            return nxt % cfg.vocab_size  # stays live AND a valid token

        t = chain_bench(step, (jnp.asarray(tokens),), iters=64)
    print(json.dumps({"phase": f"time flag={flag}",
                      "ms_per_step": round(t * 1e3, 3)}), flush=True)
print("DONE", flush=True)
