"""Synthesize a full-size Llama-3-8B-architecture HF checkpoint on disk.

VERDICT r4 item 2: nothing had ever served a real on-disk checkpoint
end-to-end — every serving number came from `init_quantized_params`
random weights that never touch the `models/hf.py` load path.  This
script materializes the real thing at design scale: `config.json` +
sharded bf16 `*.safetensors` in the exact HF Llama layout (the layout
`transformers.LlamaForCausalLM.save_pretrained` writes and
`models/hf.load_hf_checkpoint` reads — tested against each other in
tests/test_hf.py).  The sandbox has no network, so the weight VALUES are
synthesized (1/sqrt(fan_in)-scaled normal, the same family as
`models/llama.init_params`); throughput and the load path do not depend
on values, only on shapes/dtypes/layout, which are exact.

~16 GB on disk; runs on CPU only (safe next to a TPU job).

Usage: python benchmarks/make_hf_checkpoint.py [--out /tmp/llama3_8b_synth]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, "/root/repo")

import ml_dtypes
import numpy as np
from safetensors import numpy as st_np

CONFIG = {
    "architectures": ["LlamaForCausalLM"],
    "model_type": "llama",
    "vocab_size": 128256,
    "hidden_size": 4096,
    "intermediate_size": 14336,
    "num_hidden_layers": 32,
    "num_attention_heads": 32,
    "num_key_value_heads": 8,
    "head_dim": 128,
    "max_position_embeddings": 8192,
    "rope_theta": 500000.0,
    "rms_norm_eps": 1e-5,
    "tie_word_embeddings": False,
    "attention_bias": False,
    "torch_dtype": "bfloat16",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/llama3_8b_synth")
    ap.add_argument("--shard-gb", type=float, default=4.5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "config.json").write_text(json.dumps(CONFIG, indent=2))

    c = CONFIG
    E, I, V = c["hidden_size"], c["intermediate_size"], c["vocab_size"]
    Q = c["num_attention_heads"] * c["head_dim"]
    KV = c["num_key_value_heads"] * c["head_dim"]
    rng = np.random.default_rng(args.seed)

    def dense(out_dim, in_dim):
        # HF stores (out, in); scale by 1/sqrt(fan_in) like init_params.
        w = rng.standard_normal((out_dim, in_dim), dtype=np.float32)
        return (w / np.sqrt(in_dim)).astype(ml_dtypes.bfloat16)

    def norm(dim):
        # Realistic RMSNorm weights sit near 1 with spread.
        return (
            1.0 + 0.1 * rng.standard_normal((dim,), dtype=np.float32)
        ).astype(ml_dtypes.bfloat16)

    def tensors():
        yield "model.embed_tokens.weight", dense(V, E)
        for i in range(c["num_hidden_layers"]):
            p = f"model.layers.{i}"
            yield f"{p}.input_layernorm.weight", norm(E)
            yield f"{p}.self_attn.q_proj.weight", dense(Q, E)
            yield f"{p}.self_attn.k_proj.weight", dense(KV, E)
            yield f"{p}.self_attn.v_proj.weight", dense(KV, E)
            yield f"{p}.self_attn.o_proj.weight", dense(E, Q)
            yield f"{p}.post_attention_layernorm.weight", norm(E)
            yield f"{p}.mlp.gate_proj.weight", dense(I, E)
            yield f"{p}.mlp.up_proj.weight", dense(I, E)
            yield f"{p}.mlp.down_proj.weight", dense(E, I)
        yield "model.norm.weight", norm(E)
        yield "lm_head.weight", dense(V, E)

    shard_budget = int(args.shard_gb * 2**30)
    shards, cur, cur_bytes = [], {}, 0
    for name, arr in tensors():
        if cur_bytes + arr.nbytes > shard_budget and cur:
            shards.append(cur)
            cur, cur_bytes = {}, 0
        cur[name] = arr
        cur_bytes += arr.nbytes
    shards.append(cur)

    index = {"metadata": {"total_size": 0}, "weight_map": {}}
    n = len(shards)
    for i, shard in enumerate(shards):
        fname = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
        st_np.save_file(shard, str(out / fname))
        for name, arr in shard.items():
            index["weight_map"][name] = fname
            index["metadata"]["total_size"] += arr.nbytes
        print(
            f"wrote {fname}: {sum(a.nbytes for a in shard.values()) / 2**30:.2f}"
            f" GiB, {len(shard)} tensors",
            flush=True,
        )
        shards[i] = None  # free
    (out / "model.safetensors.index.json").write_text(json.dumps(index))
    print(
        f"DONE {out}: {index['metadata']['total_size'] / 2**30:.2f} GiB total",
        flush=True,
    )


if __name__ == "__main__":
    main()
