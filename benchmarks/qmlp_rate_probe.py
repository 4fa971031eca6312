"""Tail-kernel weight-DMA rate vs block_i (serving-roofline follow-up).

decode_phase_probe measured the fused tails streaming ~530 GB/s aggregate
(14.1 ms for ~7.4 GB) — well under the ~810 GB/s marginal rate.  If the
rate moves with block_i (fewer, bigger DMAs per grid step), a block-
interleaved [gate_j|up_j] weight layout could close the gap; if it is
flat (like the earlier tile-stride sweep, qmlp_probe.py), the plateau is
the DMA engine's aggregate limit and the tail is done.

Usage: python benchmarks/qmlp_rate_probe.py   (TPU; ONE process only)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu.models import llama, quantized
from quantumattention_tpu.ops import qmlp
from quantumattention_tpu.utils.profiling import chain_bench

cfg = llama.llama3_8b()
B = 64
layer = quantized.fuse_projections(
    {"layers": [
        {k: v for k, v in quantized.init_quantized_params(
            jax.random.PRNGKey(0),
            llama.llama3_8b(num_layers=1),
        )["layers"][0].items()}
    ], "embed": jnp.zeros((1, 1)), "final_norm": jnp.ones((cfg.hidden_size,))}
)["layers"][0]
jax.block_until_ready(layer)
print("layer ready", flush=True)

x = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.hidden_size), jnp.bfloat16)
attn = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.q_dim), jnp.bfloat16)

wbytes = (
    cfg.hidden_size * 2 * cfg.intermediate_size
    + cfg.intermediate_size * cfg.hidden_size
    + cfg.q_dim * cfg.hidden_size
    + cfg.hidden_size * (cfg.q_dim + 2 * cfg.kv_dim)
)

L = 32
# (qkv_fold, block_i): with the fold, wo (16 MB) + w_qkv (24 MB) sit
# VMEM-resident and only bi=512 fits the 64 MB scoped budget (bi >= 1024
# fails Mosaic compile — measured).  Without the fold the budget allows
# bigger stream tiles; the question is whether the bigger DMAs beat the
# extra dispatch the fold saves.
wbytes_nofold = wbytes - cfg.hidden_size * (cfg.q_dim + 2 * cfg.kv_dim)
for fold, bi in ((True, 512), (False, 512), (False, 1024), (False, 2048)):
    # Weights ride as jit PARAMETERS (a closure would embed the 215 MB
    # layer as program constants and break the remote compiler — the
    # first version of this probe did exactly that).
    def tail(c, layer, attn, bi=bi, fold=fold):
        kw = {}
        if fold:
            kw = dict(
                next_attn_norm=layer["attn_norm"],
                next_w_qkv=layer["w_qkv"],
            )

        def body(cc, _):
            res = qmlp.fused_layer_tail(
                cc, layer["mlp_norm"], layer["w_gate_up"], layer["w_down"],
                eps=cfg.rms_norm_eps, attn_out=attn, wo=layer["wo"],
                block_i=bi, **kw,
            )
            if fold:
                y, qkv = res
                return y + qkv[:, : cfg.hidden_size].astype(y.dtype) * 0, None
            return res, None

        o, _ = jax.lax.scan(body, c, None, length=L)
        return o

    wb = wbytes if fold else wbytes_nofold
    try:
        t = chain_bench(tail, (x, layer, attn), iters=8)
    except Exception as e:
        print(json.dumps({"fold": fold, "block_i": bi,
                          "error": str(e)[:120]}), flush=True)
        continue
    print(json.dumps({
        "fold": fold, "block_i": bi, "ms_x32": round(t * 1e3, 2),
        "agg_gb_s": round(L * wb / t / 1e9, 1),
    }), flush=True)
print("DONE", flush=True)
