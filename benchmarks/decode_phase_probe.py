"""Decompose the 8B decode step at the 64-slot operating point.

VERDICT r3: serving sits at ~37% of its own weight-stream roofline
(2397 tok/s @64 slots vs ~6.5k ceiling).  This probe splits one decode
step into its component budgets — fused layer tail (weights), decode
attention (cache DMA), cache append + RoPE + glue, LM head, sampling —
each timed as a 32-layer chained scan in the SAME process, so the gap
between sum-of-parts and the real step isolates the per-op dispatch/
boundary overhead that deeper fusion could recover.

Usage: python benchmarks/decode_phase_probe.py   (TPU; ONE process only)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu.models import llama, quantized
from quantumattention_tpu.ops.decode import decode_attention
from quantumattention_tpu.ops import qmlp
from quantumattention_tpu.ops.quant import dynamically_quantize_int8
from quantumattention_tpu.serving import kv_cache as kvc
from quantumattention_tpu.serving.engine import Engine
from quantumattention_tpu.utils.profiling import chain_bench

import argparse

_ap = argparse.ArgumentParser()
_ap.add_argument("--slots", type=int, default=64)
_args = _ap.parse_args()
SLOTS, MAXLEN, PROMPT = _args.slots, 512, 128
cfg = llama.llama3_8b()
L = cfg.num_layers

params = quantized.fuse_projections(
    quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
)
jax.block_until_ready(params)
print("weights ready", flush=True)

# ---- real engine step time (burst amortized) ----
eng = Engine(params, cfg, num_slots=SLOTS, max_len=MAXLEN,
             cache_dtype=jnp.int8, prefill_bucket=PROMPT)
prompts = [[(7 * i + j) % 1000 + 1 for j in range(PROMPT)]
           for i in range(SLOTS)]
import time

for rnd in range(2):
    reqs = [eng.submit(p, max_new_tokens=257) for p in prompts]
    while eng.waiting or eng.prefilling:
        eng.step()
    jax.block_until_ready(eng.caches[0].k)
    t0 = time.perf_counter()
    eng.run_to_completion(decode_burst=64)
    dec = time.perf_counter() - t0
    print(json.dumps({"phase": f"full_step r{rnd}",
                      "ms": round(dec / 256 * 1e3, 3),
                      "tok_s": round(SLOTS * 256 / dec, 1)}), flush=True)
full_ms = dec / 256 * 1e3

layer = eng.params["layers"][0]
del eng

# ---- component scans (each x L layers inside one jit) ----
B, E, Q, KVD, I = SLOTS, cfg.hidden_size, cfg.q_dim, cfg.kv_dim, (
    cfg.intermediate_size
)
Hkv, D, G = cfg.num_kv_heads, cfg.head_dim, cfg.num_q_heads


def scan_layers(fn, x0):
    def body(c, _):
        return fn(c), None

    def run(x):
        c, _ = jax.lax.scan(body, x, None, length=L)
        return c

    return run


x = jax.random.normal(jax.random.PRNGKey(1), (B, E), jnp.bfloat16)
attn_out = jax.random.normal(jax.random.PRNGKey(2), (B, Q), jnp.bfloat16)

# 1. fused layer tail (wo + norm + gate/up + down + next qkv)
def tail(c):
    y, qkv = qmlp.fused_layer_tail(
        c, layer["mlp_norm"], layer["w_gate_up"], layer["w_down"],
        eps=cfg.rms_norm_eps, attn_out=attn_out, wo=layer["wo"],
        next_attn_norm=layer["attn_norm"], next_w_qkv=layer["w_qkv"],
    )
    return y + qkv[:, :E].astype(y.dtype) * 0  # keep both outputs live


t = chain_bench(scan_layers(tail, x), (x,), iters=8)
print(json.dumps({"phase": "tail_x32", "ms": round(t * 1e3, 3)}), flush=True)
tail_ms = t * 1e3

# 2. decode attention over the int8 cache at PROMPT+128 typical length
q_att = jax.random.normal(jax.random.PRNGKey(3), (B, G, D), jnp.bfloat16)
kc8, kcs = dynamically_quantize_int8(
    jax.random.normal(jax.random.PRNGKey(4), (B, Hkv, MAXLEN, D), jnp.float32)
)
vc8, vcs = dynamically_quantize_int8(
    jax.random.normal(jax.random.PRNGKey(5), (B, Hkv, MAXLEN, D), jnp.float32)
)
lens = jnp.full((B,), PROMPT + 128, jnp.int32)


def att(c):
    o = decode_attention(c, kc8, vc8, lens, k_scale=kcs, v_scale=vcs,
                         block_kv=2048)
    return o.astype(jnp.bfloat16)


t = chain_bench(scan_layers(att, q_att), (q_att,), iters=8)
print(json.dumps({"phase": "attention_x32", "ms": round(t * 1e3, 3)}),
      flush=True)
att_ms = t * 1e3

# 3. cache append (quantize + scatter) per layer
cache = kvc.init_cache(SLOTS, Hkv, MAXLEN, D, jnp.int8)
k_new = jax.random.normal(jax.random.PRNGKey(6), (B, Hkv, 1, D), jnp.float32)
slot_ids = jnp.arange(SLOTS, dtype=jnp.int32)
offs = jnp.full((B,), PROMPT, jnp.int32)
nval = jnp.ones((B,), jnp.int32)


def app(c):
    nc = kvc.append(cache, slot_ids, k_new + c[0, 0, 0, 0] * 0, k_new,
                    offs, nval)
    return k_new + nc.k[0, 0, 0, 0].astype(jnp.float32) * 0


t = chain_bench(scan_layers(app, k_new), (k_new,), iters=8)
print(json.dumps({"phase": "append_x32", "ms": round(t * 1e3, 3)}),
      flush=True)
app_ms = t * 1e3

# 4. RoPE + reshapes glue per layer (qkv split -> heads -> rope -> back)
qkv_flat = jax.random.normal(
    jax.random.PRNGKey(7), (B, Q + 2 * KVD), jnp.bfloat16
)
pos = jnp.full((B, 1), PROMPT, jnp.int32)
cos, sin = llama.rope_table(pos, D, cfg.rope_theta)


def glue(c):
    q, k, v = jnp.split(c[:, None, :], [Q, Q + KVD], axis=-1)
    qh = q.reshape(B, 1, G, D).transpose(0, 2, 1, 3)
    kh = k.reshape(B, 1, Hkv, D).transpose(0, 2, 1, 3)
    qh = llama.apply_rope(qh, cos, sin)
    kh = llama.apply_rope(kh, cos, sin)
    out = qh.transpose(0, 2, 1, 3).reshape(B, 1, Q)[:, 0]
    return c + jnp.pad(out, ((0, 0), (0, 2 * KVD))).astype(c.dtype) * 0


t = chain_bench(scan_layers(glue, qkv_flat), (qkv_flat,), iters=8)
print(json.dumps({"phase": "rope_glue_x32", "ms": round(t * 1e3, 3)}),
      flush=True)
glue_ms = t * 1e3

# 5. LM head (int8 qmm) + final norm, once per step.  The 0.5 GB head
# weight MUST ride as a jit parameter — a closure would embed it as a
# program constant and break the remote compiler (CLAUDE.md HTTP-413
# hazard; the first version of this probe did exactly that).
head = params["lm_head"]
head_args = (
    (head["q"], head["s"]) if isinstance(head, dict) else (head, None)
)


def head_fn(c, hq, hs, norm_w):
    w = {"q": hq, "s": hs} if hs is not None else hq
    h = llama.rms_norm(c[:, None, :], norm_w, cfg.rms_norm_eps)
    logits = quantized.matmul("bse,ev->bsv", h, w)
    return c + logits[:, 0, :1].astype(c.dtype) * 0


t = chain_bench(
    head_fn, (x,) + head_args + (params["final_norm"],), iters=32
)
print(json.dumps({"phase": "lm_head", "ms": round(t * 1e3, 3)}), flush=True)
head_ms = t * 1e3

parts = tail_ms + att_ms + app_ms + glue_ms + head_ms
print(json.dumps({
    "summary": {
        "full_step_ms": round(full_ms, 2),
        "tail_x32_ms": round(tail_ms, 2),
        "attention_x32_ms": round(att_ms, 2),
        "append_x32_ms": round(app_ms, 2),
        "rope_glue_x32_ms": round(glue_ms, 2),
        "lm_head_ms": round(head_ms, 2),
        "sum_of_parts_ms": round(parts, 2),
        "unattributed_ms": round(full_ms - parts, 2),
    }
}), flush=True)
print("DONE", flush=True)
