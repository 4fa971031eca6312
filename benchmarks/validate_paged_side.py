"""Chip validation + A/B for the paged side-buffer burst (round 5).

Phase 1 (correctness, small model, compiled DMA kernel):
  a. paged_decode_attention with a side buffer vs the gathered oracle
     (RMSE) — the compiled Mosaic side block vs the splice-in reference.
  b. Engine paged burst with the side impl vs the per-step scatter impl
     from identical state: token traces compared (greedy; near-tie token
     divergence is reported, first tokens must match).
  c. Same at page_size=256 (folded scale pages) — side flush through the
     4-D scale-page layout.

Phase 2 (perf, 8B shapes, ONE process): paged burst side vs scatter at
64 slots / max_len 1024 / int8 W+KV, slots-mega printed for context.

Usage: run as the ONLY TPU process; output is line-buffered JSON.
"""

import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu import config as qa_config
from quantumattention_tpu.models import llama, quantized
from quantumattention_tpu.ops.paged import MASK_VALUE, paged_decode_attention
from quantumattention_tpu.ops.quant import dynamically_quantize_int8
from quantumattention_tpu.serving.engine import Engine


def fetch(x):
    return np.asarray(jax.device_get(x))


# ---------------- phase 1a: kernel vs gathered oracle --------------------
B, Hkv, group, pps, ps, D, tpad = 4, 2, 4, 4, 128, 128, 16
key = jax.random.PRNGKey(0)
ks_ = jax.random.split(key, 8)
k_pages = jax.random.normal(ks_[0], (Hkv, B * pps + 1, ps, D), jnp.float32)
v_pages = jax.random.normal(ks_[1], (Hkv, B * pps + 1, ps, D), jnp.float32)
table = jnp.asarray(
    np.random.RandomState(0).permutation(B * pps).reshape(B, pps), jnp.int32
)
q = jax.random.normal(ks_[2], (B, Hkv * group, D), jnp.bfloat16)
lengths = jnp.array([300, 130, 1, 512], jnp.int32)
n_side = np.array([9, 16, 1, 0])
k8, ksc = dynamically_quantize_int8(k_pages, reduction_dim=-1)
v8, vsc = dynamically_quantize_int8(v_pages, reduction_dim=-1)
kf = jax.random.normal(ks_[3], (B, Hkv, tpad, D), jnp.float32)
vf = jax.random.normal(ks_[4], (B, Hkv, tpad, D), jnp.float32)
sk8, sks = dynamically_quantize_int8(kf, reduction_dim=-1)
sv8, svs = dynamically_quantize_int8(vf, reduction_dim=-1)
mask = jnp.where(
    jnp.arange(tpad)[None, :] < jnp.asarray(n_side)[:, None], 0.0, MASK_VALUE
).astype(jnp.float32)
side = {"k": sk8, "v": sv8, "ks": sks, "vs": svs, "mask": mask}

run = jax.jit(
    lambda q, side: paged_decode_attention(
        q, k8, v8, lengths, table, k_scale_pages=ksc, v_scale_pages=vsc,
        pages_per_block=2, side=side, use_dma=True,
    )
)
gold = jax.jit(
    lambda q, side: paged_decode_attention(
        q, k8, v8, lengths, table, k_scale_pages=ksc, v_scale_pages=vsc,
        pages_per_block=2, side=side, use_dma=False,
    )
)
out = fetch(run(q, side))
ref = fetch(gold(q, side))
rmse = float(np.sqrt(np.mean((out - ref) ** 2)))
print(json.dumps({"phase": "1a_kernel_rmse", "rmse": rmse,
                  "ok": rmse < 1e-2}), flush=True)

# ---------------- phase 1b/1c: engine burst side vs scatter --------------
cfg_s = llama.tiny(
    hidden_size=256, num_q_heads=8, num_kv_heads=2, head_dim=128,
    intermediate_size=512, attention_impl="sdpa",
)
params_s = quantized.fuse_projections(
    quantized.init_quantized_params(jax.random.PRNGKey(1), cfg_s)
)
prompts = [[(13 * i + j) % 250 + 1 for j in range(64)] for i in range(4)]


def engine_tokens(side_on, page_size):
    with qa_config.patch({"kernel.paged_side_burst": side_on}):
        eng = Engine(
            params_s, cfg_s, num_slots=4, max_len=512,
            cache_dtype=jnp.int8, cache_backend="paged",
            page_size=page_size, prefill_bucket=page_size,
        )
        reqs = [eng.submit(p, max_new_tokens=33) for p in prompts]
        eng.run_to_completion(decode_burst=16)
        assert all(r.done for r in reqs)
        toks = [list(r.output) for r in reqs]
        del eng
        gc.collect()
        return toks


for page_size, tag in ((128, "1b_engine_ps128"), (256, "1c_engine_ps256")):
    a = engine_tokens(True, page_size)
    b = engine_tokens(False, page_size)
    firsts = all(x[0] == y[0] for x, y in zip(a, b))
    mism = sum(
        sum(1 for u, v in zip(x, y) if u != v) for x, y in zip(a, b)
    )
    total = sum(len(x) for x in a)
    print(json.dumps({"phase": tag, "first_tokens_match": firsts,
                      "token_mismatches": mism, "total_tokens": total,
                      "ok": firsts and mism <= total * 0.05}), flush=True)

# ---------------- phase 2: 8B perf A/B ----------------------------------
SLOTS, MAXLEN, PROMPT, NEW, BURST = 64, 1024, 128, 257, 64
cfg = llama.llama3_8b()
params = quantized.fuse_projections(
    quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
)
jax.block_until_ready(params)
print("8B weights ready", flush=True)
prompts = [
    [(7 * i + j) % 1000 + 1 for j in range(PROMPT)] for i in range(SLOTS)
]


def run_cfg(name, side_on, **kw):
    with qa_config.patch({"kernel.paged_side_burst": side_on}):
        eng = Engine(params, cfg, num_slots=SLOTS, max_len=MAXLEN,
                     cache_dtype=jnp.int8, prefill_bucket=PROMPT, **kw)
        reqs = [eng.submit(p, max_new_tokens=BURST + 1) for p in prompts]
        eng.run_to_completion(decode_burst=BURST)  # warm/compile
        assert all(r.done for r in reqs)
        best = float("inf")
        for _ in range(2):
            reqs = [eng.submit(p, max_new_tokens=NEW) for p in prompts]
            while eng.waiting or eng.prefilling:
                eng.step()
            t0 = time.perf_counter()
            eng.run_to_completion(decode_burst=BURST)
            best = min(best, time.perf_counter() - t0)
            assert all(r.done and len(r.output) == NEW for r in reqs)
        steps = NEW - 1
        out = {"config": name,
               "decode_ms_per_step": round(best / steps * 1e3, 2),
               "decode_tok_s": round(SLOTS * steps / best, 1)}
        print(json.dumps(out), flush=True)
        del eng
        gc.collect()
        return out


paged_side = run_cfg("paged64_side", True, cache_backend="paged",
                     page_size=128)
paged_scat = run_cfg("paged64_scatter", False, cache_backend="paged",
                     page_size=128)
slots_mega = run_cfg("slots64_megastep", True)
paged_side2 = run_cfg("paged64_side_again", True, cache_backend="paged",
                      page_size=128)
best_side = min(paged_side["decode_ms_per_step"],
                paged_side2["decode_ms_per_step"])
print(json.dumps({
    "side_vs_scatter_speedup": round(
        paged_scat["decode_ms_per_step"] / best_side, 3),
    "paged_vs_slots_step_ratio": round(
        best_side / slots_mega["decode_ms_per_step"], 3),
}), flush=True)
print("DONE", flush=True)
