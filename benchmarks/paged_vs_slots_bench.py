"""Chip A/B: paged-backend burst decode vs slots burst at 8B shapes.

VERDICT r3 item 2's done-criterion: paged burst within ~10% of the slots
burst at equal batch, measured in ONE process (chip throughput drifts
across process windows).  Round 4 gave the paged backend a true on-device
burst (fixed pre-reserved page tables, positions in the scan carry);
this quantifies the remaining gap (the paged kernel's per-page async-DMA
gather + in-jit page writes vs the contiguous kernel's block streams).

Usage: python benchmarks/paged_vs_slots_bench.py  (TPU; ONE process only)
"""

import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/quantumattention_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantumattention_tpu.models import llama, quantized
from quantumattention_tpu.serving.engine import Engine

SLOTS, MAXLEN, PROMPT, NEW, BURST = 16, 512, 128, 257, 64

cfg = llama.llama3_8b()
params = quantized.fuse_projections(
    quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
)
jax.block_until_ready(params)
print("weights ready", flush=True)

prompts = [
    [(7 * i + j) % 1000 + 1 for j in range(PROMPT)] for i in range(SLOTS)
]


def run(name, **kw):
    bucket = max(PROMPT, kw.get("page_size", PROMPT))
    eng = Engine(params, cfg, num_slots=SLOTS, max_len=MAXLEN,
                 cache_dtype=jnp.int8, prefill_bucket=bucket, **kw)
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
    out = {"config": name, "decode_ms_per_step": round(best / steps * 1e3, 2),
           "decode_tok_s": round(SLOTS * steps / best, 1)}
    print(json.dumps(out), flush=True)
    del eng
    gc.collect()
    return out


from quantumattention_tpu import config as qa_config

# Like-for-like storage comparison: the slots burst now routes through
# the mega kernel (ops/megastep.py), which the paged backend does not
# have — the ratio is defined against the UNFUSED slots step (same
# kernel architecture on both sides), with the mega number printed for
# context.
with qa_config.patch({"kernel.megastep": False}):
    slots = run("slots_unfused")
slots_mega = run("slots_megastep")
paged = run("paged_ps128", cache_backend="paged", page_size=128)
paged256 = run("paged_ps256", cache_backend="paged", page_size=256)
with qa_config.patch({"kernel.megastep": False}):
    slots2 = run("slots_unfused_again")  # drift control
best_slots = min(slots["decode_ms_per_step"], slots2["decode_ms_per_step"])
best_paged = min(paged["decode_ms_per_step"], paged256["decode_ms_per_step"])
ratio = best_paged / best_slots
print(json.dumps({"paged_vs_slots_step_ratio": round(ratio, 3),
                  "within_10pct": ratio <= 1.10,
                  "paged_vs_megastep_ratio": round(
                      best_paged / slots_mega["decode_ms_per_step"], 3)}),
      flush=True)
print("DONE", flush=True)
