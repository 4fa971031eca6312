"""Decompose the mega-kernel decode step at the 64-slot 8B operating
point: mega kernel chain (attention + tails) vs per-layer XLA glue
(RoPE + quantize + append scatter) vs LM head, each as an L-layer chained
scan — the gap between sum-of-parts and the engine's measured step is the
remaining scheduling/dispatch overhead.

All weight trees ride as jit PARAMETERS (closure constants break the
remote compiler — CLAUDE.md).

Usage: python benchmarks/megastep_phase_probe.py [--slots 64]
       (TPU; ONE process only)
"""

import argparse
import dataclasses
import json
import sys

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
from quantumattention_tpu.utils.profiling import chain_bench

ap = argparse.ArgumentParser()
ap.add_argument("--slots", type=int, default=64)
ap.add_argument("--max-len", type=int, default=512)
ap.add_argument("--fill", type=int, default=256)
ap.add_argument("--bkv", type=int, default=0,
                help="override the attention cache block (0 = auto)")
args = ap.parse_args()
B, MAXLEN, FILL = args.slots, args.max_len, args.fill

cfg = llama.llama3_8b()
L = cfg.num_layers
G, Hkv, D = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
E = cfg.hidden_size

params = quantized.fuse_projections(
    quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
)
jax.block_until_ready(params)
print("weights ready", flush=True)

layer = params["layers"][0]
cache = kvc.init_cache(B, Hkv, MAXLEN, D, jnp.int8)
key = jax.random.PRNGKey(1)
kf = jax.random.normal(key, cache.k.shape, jnp.float32)
kq0, ks0 = quant.dynamically_quantize_int8(kf, reduction_dim=-1)
cache = dataclasses.replace(
    cache, k=kq0, v=kq0, k_scale=ks0, v_scale=ks0,
    lengths=jnp.full((B,), FILL, jnp.int32),
)
positions = cache.lengths
active = jnp.ones((B,), bool)
bkv = args.bkv or mega._pick_bkv(MAXLEN, B, D, Hkv)
print(json.dumps({"bkv": bkv}), flush=True)

x0 = jax.random.normal(jax.random.PRNGKey(2), (B, E), jnp.bfloat16)
q0 = jax.random.normal(jax.random.PRNGKey(3), (B, G, D), jnp.bfloat16)
knq = jnp.zeros((B, Hkv, D), jnp.int8) + 3
kns = jnp.ones((B, Hkv), jnp.float32) * 0.01

# 1. mega kernel chain: L layers of fused_decode_layer, same weights,
#    x chained through, fixed cache (attention reads it every layer).
def mega_chain(x, ck, cv, cks, cvs, wo_q, wo_s, nrm, gu_q, gu_s, dn_q,
               dn_s, anrm, qk_q, qk_s):
    lyr = {"wo": {"q": wo_q, "s": wo_s}, "mlp_norm": nrm,
           "w_gate_up": {"q": gu_q, "s": gu_s},
           "w_down": {"q": dn_q, "s": dn_s}}
    ctx = mega.build_decode_ctx(positions, active, MAXLEN, bkv)

    def body(c, _):
        y, qkv = mega.fused_decode_layer(
            c, q0, ck, cv, cks, cvs, ctx, lyr,
            next_attn_norm=anrm, next_w_qkv={"q": qk_q, "s": qk_s},
            eps=cfg.rms_norm_eps,
        )
        return y + qkv[:, :E] * 0, None

    c, _ = jax.lax.scan(body, x, None, length=L)
    return c


t = chain_bench(
    mega_chain,
    (x0, cache.k, cache.v, cache.k_scale, cache.v_scale,
     layer["wo"]["q"], layer["wo"]["s"], layer["mlp_norm"],
     layer["w_gate_up"]["q"], layer["w_gate_up"]["s"],
     layer["w_down"]["q"], layer["w_down"]["s"],
     layer["attn_norm"], layer["w_qkv"]["q"], layer["w_qkv"]["s"]),
    iters=8,
)
print(json.dumps({"phase": "mega_kernel_x32", "ms": round(t * 1e3, 3)}),
      flush=True)

# 2. per-layer glue: packed RoPE + quantize + append scatter + aux
#    transposes (everything the mega driver does between kernel calls).
qkv0 = jax.random.normal(
    jax.random.PRNGKey(4), (B, (G + 2 * Hkv) * D), jnp.bfloat16
)
cos, sin = llama.rope_table(positions, D, cfg.rope_theta)
cosb, sinb = cos[:, None, :], sin[:, None, :]


def glue_chain(qkv, ck, cv, cks, cvs):
    cache_l = dataclasses.replace(
        cache, k=ck, v=cv, k_scale=cks, v_scale=cvs
    )

    def body(c, _):
        qk = c[:, : (G + Hkv) * D].reshape(B, G + Hkv, 2, D // 2).astype(
            jnp.float32
        )
        x1r, x2r = qk[:, :, 0], qk[:, :, 1]
        qk_rot = jnp.stack(
            [x1r * cosb - x2r * sinb, x2r * cosb + x1r * sinb], axis=2
        ).reshape(B, G + Hkv, D).astype(jnp.bfloat16)
        q3, k3 = qk_rot[:, :G], qk_rot[:, G:]
        v3 = c[:, (G + Hkv) * D:].reshape(B, Hkv, D)
        kq, ks = quant.dynamically_quantize_int8(
            k3.astype(jnp.float32), reduction_dim=-1
        )
        vq, vs = quant.dynamically_quantize_int8(
            v3.astype(jnp.float32), reduction_dim=-1
        )
        nc = kvc.append_quantized_token(
            cache_l, kq, ks, vq, vs, positions,
            active.astype(jnp.int32),
        )
        qg = q3.reshape(B, Hkv, G // Hkv, D).transpose(1, 0, 2, 3)
        knt = kq.transpose(1, 0, 2)
        alive = (
            nc.k[0, 0, 0, 0].astype(jnp.bfloat16)
            + qg[0, 0, 0, 0] + knt[0, 0, 0].astype(jnp.bfloat16)
        )
        return c + alive * 0, None

    c, _ = jax.lax.scan(body, qkv, None, length=L)
    return c


t = chain_bench(
    glue_chain,
    (qkv0, cache.k, cache.v, cache.k_scale, cache.v_scale),
    iters=8,
)
print(json.dumps({"phase": "glue_x32", "ms": round(t * 1e3, 3)}), flush=True)

# 3. LM head + final norm (once per step)
head = params["lm_head"]


def head_fn(c, hq, hs, nw):
    h = llama.rms_norm(c[:, None, :], nw, cfg.rms_norm_eps)
    logits = quantized.matmul("bse,ev->bsv", h, {"q": hq, "s": hs})
    return c + logits[:, 0, :1].astype(c.dtype) * 0


t = chain_bench(
    head_fn, (x0, head["q"], head["s"], params["final_norm"]), iters=32
)
print(json.dumps({"phase": "lm_head", "ms": round(t * 1e3, 3)}), flush=True)

# 4. LM-head qmm stream/block variants (VERDICT r4 item 8): bare
#    quantized_matmul timings on the exact (B, 4096) x (4096, 128256)
#    shape, several structures in ONE process (within-window comparison).
from quantumattention_tpu.ops import qmm

gb = 4096 * 128256 / 1e9
for name, kw in (
    ("auto", {}),
    ("k2_bk2048", dict(block_k=2048, block_n=512, n_streams=2)),
    ("k2_bk1024", dict(block_k=1024, block_n=512, n_streams=2)),
    ("k4_bk1024", dict(block_k=1024, block_n=512, n_streams=4)),
    ("k2_bn1024", dict(block_k=2048, block_n=1024, n_streams=2)),
    ("k2_bn2048", dict(block_k=2048, block_n=2048, n_streams=2)),
    ("k1_bn512", dict(block_k=4096, block_n=512, n_streams=1)),
):
    def f(xx, wq, ws):
        return qmm.quantized_matmul(xx, wq, ws, **kw)

    try:
        t = chain_bench(f, (x0, head["q"], head["s"]), iters=64)
        print(json.dumps({"lm_head_variant": name,
                          "ms": round(t * 1e3, 3),
                          "gb_s": round(gb / t, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"lm_head_variant": name,
                          "err": str(e).split(chr(10))[0][:120]}), flush=True)
print("DONE", flush=True)
