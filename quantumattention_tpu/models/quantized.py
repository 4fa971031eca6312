"""Weight-only int8 quantization (w8a16) for the decoder parameter tree.

Beyond the reference (an attention kernel library — SURVEY.md §0), and the
piece that makes single-chip serving of 8B-class models REAL on a 16 GB
part: bf16 Llama-3-8B weights alone are ~16 GB, so they must be stored
int8 (~8 GB) to coexist with a KV cache.  Decode is weight-bandwidth
bound at batch 1-64, so halving weight bytes also halves the non-attention
HBM traffic per token.

Scheme: symmetric per-output-channel scales (reduce |w| over the
contracted input axis), bf16 compute — the standard w8a16 recipe.  A
quantized matrix is ``{"q": int8 (…, in, out), "s": fp32 (…, 1, out)}``;
``matmul()`` consumes either representation so every projection site in
``models/llama.py`` / ``models/moe.py`` works with mixed trees.  The
int8->bf16 convert fuses into the XLA dot's operand read on TPU.

Inference-only: int8 leaves are not differentiable — ``train_step`` on a
quantized tree fails loudly (use the full-precision tree + the fp8/STE
attention path for QAT).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

#: Keys holding (…, in, out) projection matrices, quantized per-output-
#: channel.  Norms and biases stay full precision (tiny, accuracy-critical).
_MATRIX_KEYS = frozenset(
    ["wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "lm_head"]
)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def quantize_matrix(w: jax.Array) -> Dict[str, jax.Array]:
    """(…, in, out) float -> {"q": int8, "s": (…, 1, out) fp32}."""
    wf = w.astype(jnp.float32)
    amax = jnp.maximum(
        jnp.max(jnp.abs(wf), axis=-2, keepdims=True), 1e-12
    )
    s = amax / 127.0
    q = jnp.round(wf / s).astype(jnp.int8)
    return {"q": q, "s": s}


def matmul(spec: str, x: jax.Array, w: Any) -> jax.Array:
    """``einsum(spec, x, w)`` where ``w`` may be quantized.

    The output channel must be the LAST result axis (true of every
    projection in the decoder), so the (…, 1, out) scale broadcasts onto
    the product by trailing alignment after dropping its keepdim.
    """
    if not is_quantized(w):
        return jnp.einsum(spec, x, w)
    y = jnp.einsum(spec, x, w["q"].astype(x.dtype))
    # The keepdims scale (…, 1, out) broadcasts onto (…, rows, out) for
    # both plain (in, out) weights and batched (E, in, out) expert stacks.
    return (y.astype(jnp.float32) * w["s"]).astype(x.dtype)


def embed_lookup(embed: Any, tokens: jax.Array, dtype) -> jax.Array:
    """Token embedding lookup over a full or row-quantized table."""
    if not is_quantized(embed):
        return embed[tokens].astype(dtype)
    rows = embed["q"][tokens].astype(jnp.float32)
    return (rows * embed["s"][tokens]).astype(dtype)


def quantize_embed(embed: jax.Array) -> Dict[str, jax.Array]:
    """(V, H) float -> {"q": int8, "s": (V, 1) fp32} per-row scales.

    Row scales serve both the lookup and (for tied embeddings) the output
    head, where the row IS the output channel.
    """
    ef = embed.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(ef), axis=-1, keepdims=True), 1e-12)
    s = amax / 127.0
    return {"q": jnp.round(ef / s).astype(jnp.int8), "s": s}


def tied_head_matmul(x: jax.Array, embed: Any) -> jax.Array:
    """logits = x @ embed.T for a full or row-quantized embedding table."""
    if not is_quantized(embed):
        return jnp.einsum("bse,ve->bsv", x, embed)
    y = jnp.einsum("bse,ve->bsv", x, embed["q"].astype(x.dtype))
    return y.astype(jnp.float32) * embed["s"][:, 0]


def quantize_params(params: Params) -> Params:
    """Quantize every projection matrix in a ``models/llama.init_params``
    tree (embed per-row; norms/biases/router untouched)."""

    def one_layer(layer: Params) -> Params:
        out = dict(layer)
        for k in _MATRIX_KEYS:
            if k in out and not is_quantized(out[k]):
                out[k] = quantize_matrix(out[k])
        if "moe" in out:
            moe = dict(out["moe"])
            for k in ("w_gate", "w_up", "w_down"):
                moe[k] = quantize_matrix(moe[k])
            out["moe"] = moe  # router stays fp32
        return out

    out: Params = {
        "embed": quantize_embed(params["embed"]),
        "final_norm": params["final_norm"],
        "layers": [one_layer(l) for l in params["layers"]],
    }
    if "lm_head" in params:
        out["lm_head"] = quantize_matrix(params["lm_head"])
    return out
