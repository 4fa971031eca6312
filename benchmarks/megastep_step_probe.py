"""Where do the ~3 ms between sum-of-parts and the engine's mega decode
step go?  Times a 64-step burst-style scan (the engine's real structure:
caches in the carry, sampling on device) in three variants:

  full       — the real step (append + attention + tails + head + argmax)
  no_append  — identical but the scatter writes are dropped (timing-only:
               shows whether XLA copies the carried cache buffers)
  no_head    — full minus the LM head + sampling

Usage: python benchmarks/megastep_step_probe.py  (TPU; ONE process only)
"""

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu.models import llama, quantized
from quantumattention_tpu.ops import megastep as mega
from quantumattention_tpu.ops import quant
from quantumattention_tpu.serving import kv_cache as kvc

ap = argparse.ArgumentParser()
ap.add_argument("--slots", type=int, default=64)
ap.add_argument("--max-len", type=int, default=512)
ap.add_argument("--steps", type=int, default=64)
args = ap.parse_args()
B, MAXLEN, STEPS = args.slots, args.max_len, args.steps

cfg = llama.llama3_8b()
G, Hkv, D, E = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim, cfg.hidden_size

params = quantized.fuse_projections(
    quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
)
jax.block_until_ready(params)
print("weights ready", flush=True)


def fresh_caches():
    out = []
    key = jax.random.PRNGKey(1)
    for _ in range(cfg.num_layers):
        key, k1 = jax.random.split(key)
        c = kvc.init_cache(B, Hkv, MAXLEN, D, jnp.int8)
        kf = jax.random.normal(k1, c.k.shape, jnp.float32)
        kq, ks = quant.dynamically_quantize_int8(kf, reduction_dim=-1)
        out.append(dataclasses.replace(
            c, k=kq, v=kq, k_scale=ks, v_scale=ks,
            lengths=jnp.full((B,), 128, jnp.int32),
        ))
    return out


def step_fn(params, caches, tokens, mode):
    positions = caches[0].lengths
    active = jnp.ones((B,), bool)
    bkv = mega._pick_bkv(MAXLEN, B, D, Hkv)
    ctx = mega.build_decode_ctx(positions, active, MAXLEN, bkv)
    cos, sin = llama.rope_table(positions, D, cfg.rope_theta)
    cosb, sinb = cos[:, None, :], sin[:, None, :]
    x = quantized.embed_lookup(params["embed"], tokens[:, None], cfg.dtype)[:, 0]
    layers = params["layers"]
    h0 = llama.rms_norm(x, layers[0]["attn_norm"], cfg.rms_norm_eps)
    qkv = quantized.matmul("be,ef->bf", h0, layers[0]["w_qkv"])
    nval = active.astype(jnp.int32)
    for idx, layer in enumerate(layers):
        qk = qkv[:, : (G + Hkv) * D].reshape(B, G + Hkv, 2, D // 2).astype(
            jnp.float32
        )
        x1r, x2r = qk[:, :, 0], qk[:, :, 1]
        qk_rot = jnp.stack(
            [x1r * cosb - x2r * sinb, x2r * cosb + x1r * sinb], axis=2
        ).reshape(B, G + Hkv, D).astype(cfg.dtype)
        q3, k3 = qk_rot[:, :G], qk_rot[:, G:]
        v3 = qkv[:, (G + Hkv) * D:].reshape(B, Hkv, D)
        kq, ks = quant.dynamically_quantize_int8(
            k3.astype(jnp.float32), reduction_dim=-1
        )
        vq, vs = quant.dynamically_quantize_int8(
            v3.astype(jnp.float32), reduction_dim=-1
        )
        if mode != "no_append":
            caches[idx] = kvc.append_quantized_token(
                caches[idx], kq, ks, vq, vs, positions, nval
            )
        else:
            caches[idx] = dataclasses.replace(
                caches[idx], lengths=positions + nval
            )
        c = caches[idx]
        nxt = layers[idx + 1] if idx + 1 < len(layers) else None
        x, qkv = mega.fused_decode_layer(
            x, q3, c.k, c.v, c.k_scale, c.v_scale, ctx, layer,
            next_attn_norm=nxt["attn_norm"] if nxt is not None else None,
            next_w_qkv=nxt["w_qkv"] if nxt is not None else None,
            eps=cfg.rms_norm_eps,
        )
    if mode == "no_head":
        nxt_tok = (tokens + x[:, 0].astype(jnp.int32) % 7) % cfg.vocab_size
        return caches, nxt_tok
    xf = llama.rms_norm(x[:, None, :], params["final_norm"], cfg.rms_norm_eps)
    logits = quantized.matmul("bse,ev->bsv", xf, params["lm_head"])
    return caches, jnp.argmax(logits[:, 0, :], -1).astype(jnp.int32)


for mode in ("full", "no_append", "no_head"):
    def burst(params, caches, tokens):
        def one(carry, _):
            caches, toks = carry
            caches, toks = step_fn(params, caches, toks, mode)
            return (caches, toks), None

        (caches, toks), _ = jax.lax.scan(
            one, (caches, tokens), None, length=STEPS
        )
        return toks

    jitted = jax.jit(burst, donate_argnums=(1,))
    caches = fresh_caches()
    toks = jnp.arange(B, dtype=jnp.int32)
    out = np.asarray(jitted(params, caches, toks))  # compile + warm
    times = []
    for _ in range(3):
        caches = fresh_caches()
        jax.block_until_ready(caches[0].k)
        t0 = time.perf_counter()
        out = np.asarray(jitted(params, caches, toks))
        times.append((time.perf_counter() - t0) / STEPS)
    t = sorted(times)[1]
    print(json.dumps({"mode": mode, "ms_per_step": round(t * 1e3, 3),
                      "tok_s": round(B / t)}), flush=True)
print("DONE", flush=True)
