"""Where does model-level prefill time go at Llama-3-8B shapes?

model_bench measures 1700-2900 tok/s prefill for a 16x256 batch, but the
matmul roofline (qmm prefill regime ~144-150 TFLOP/s over ~57 TFLOP of
projections) predicts ~9-10k tok/s.  This probe times the pieces:

  1. the whole jitted forward_prefill dispatch (logits fetch forced);
  2. the per-layer matmul stack at M=4096, chained (pallas -> sound);
  3. the fused causal flash at (16, 32, 256, 128), chained;
  4. forward minus parts = XLA glue (rope/norm/embed/append...).

Usage: python benchmarks/prefill_probe.py   (TPU; ONE process only)
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu.models import llama, quantized
from quantumattention_tpu.ops.flash import flash_attention
from quantumattention_tpu.utils.profiling import chain_bench

cfg = llama.llama3_8b()
B, S = 16, 256
M = B * S


def main():
    params = quantized.fuse_projections(
        quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
    )
    jax.block_until_ready(params)
    print("weights ready", flush=True)

    tokens = jnp.asarray(
        [[(7 * i + j) % 1000 + 1 for j in range(S)] for i in range(B)],
        jnp.int32,
    )
    last = jnp.full((B,), S - 1, jnp.int32)
    fwd = jax.jit(functools.partial(llama.forward_prefill, cfg=cfg))

    logits, kv = fwd(params, tokens, last_pos=last)
    jax.block_until_ready(logits)  # compile
    reps = []
    for _ in range(4):
        t0 = time.perf_counter()
        logits, kv = fwd(params, tokens, last_pos=last)
        float(jnp.sum(logits))
        jax.block_until_ready(kv)
        reps.append(time.perf_counter() - t0)
    fwd_s = min(reps)
    print(json.dumps({
        "piece": "forward_prefill(16x256)", "ms": round(fwd_s * 1e3, 1),
        "prefill_tok_s": round(M / fwd_s, 1),
    }), flush=True)

    # per-layer matmul stack, chained (one layer's worth at M=4096).
    # Weights are jit PARAMETERS (args), never closures — closed-over
    # device arrays become giant XLA program constants and can kill the
    # tunnel relay (CLAUDE.md).
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.PRNGKey(1), (M, cfg.hidden_size),
                          jnp.bfloat16)

    def layer_matmuls(x, layer):
        qkv = quantized.matmul("me,ef->mf", x, layer["w_qkv"])
        q = qkv[:, : cfg.q_dim]
        o = quantized.matmul("mq,qe->me", q, layer["wo"])
        gu = quantized.matmul("me,ef->mf", o, layer["w_gate_up"])
        gate, up = jnp.split(gu, 2, axis=-1)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
        return quantized.matmul("mi,ie->me", act, layer["w_down"])

    t = chain_bench(layer_matmuls, (x, layer), iters=32, reps=3, perturb=0)
    fl = 2 * M * cfg.hidden_size * (
        cfg.q_dim + 2 * cfg.kv_dim + cfg.hidden_size  # qkv + (wo via q_dim)
    ) + 2 * M * cfg.hidden_size * 2 * cfg.intermediate_size \
        + 2 * M * cfg.intermediate_size * cfg.hidden_size
    print(json.dumps({
        "piece": "layer_matmuls(M=4096)", "ms": round(t * 1e3, 2),
        "tflops": round(fl / t / 1e12, 1),
        "x32_ms": round(32 * t * 1e3, 1),
    }), flush=True)

    # fused causal attention at prefill shape
    q = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.num_q_heads, S,
                                                  cfg.head_dim), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.num_kv_heads, S,
                                                  cfg.head_dim), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(4), (B, cfg.num_kv_heads, S,
                                                  cfg.head_dim), jnp.bfloat16)
    ta = chain_bench(
        lambda q, k, v: flash_attention(q, k, v, is_causal=True),
        (q, k, v), iters=64, reps=3, perturb=0,
    )
    print(json.dumps({
        "piece": "flash(16,32,256,128)", "ms": round(ta * 1e3, 3),
        "x32_ms": round(32 * ta * 1e3, 1),
    }), flush=True)

    # lm_head on the gathered rows (B x vocab)
    xh = jax.random.normal(jax.random.PRNGKey(5), (B, cfg.hidden_size),
                           jnp.bfloat16)
    th = chain_bench(
        lambda xh, w: quantized.matmul("me,ev->mv", xh, w),
        (xh, params["lm_head"]), iters=64, reps=3, perturb=0,
    )
    print(json.dumps({"piece": "lm_head(B rows)",
                      "ms": round(th * 1e3, 2)}), flush=True)

    acc = 32 * (t + ta) + th
    print(json.dumps({
        "piece": "accounted", "ms": round(acc * 1e3, 1),
        "unaccounted_ms": round((fwd_s - acc) * 1e3, 1),
    }), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
