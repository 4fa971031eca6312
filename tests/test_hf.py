"""Cross-framework parity: HF transformers checkpoints load and the two
frameworks produce the same logits.

The strongest correctness oracle available — an entirely independent
implementation (torch, CPU) of the same architectures.  Exercises
models/hf.py's weight mapping plus every convention the decoder claims to
share with HF (rotate-half RoPE, GQA head grouping, RMSNorm epsilon
placement, SwiGLU, tied embeddings, qkv bias, sliding window, MoE
routing).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from quantumattention_tpu.models import hf as hf_lib
from quantumattention_tpu.models import llama


def _logits_ours(params, cfg, tokens_np):
    toks = jnp.asarray(tokens_np, jnp.int32)
    return np.asarray(
        llama.forward(params, toks, cfg).astype(jnp.float32)
    )


def _logits_hf(model, tokens_np):
    with torch.no_grad():
        out = model(torch.tensor(tokens_np, dtype=torch.long))
    return out.logits.float().numpy()


def _assert_close(a, b, tol):
    scale = np.maximum(np.std(b), 1e-6)
    rmse = float(np.sqrt(np.mean((a - b) ** 2))) / scale
    assert rmse < tol, f"relative logit rmse {rmse}"


def test_hf_llama_logit_parity():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_bias=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()

    cfg = hf_lib.config_from_hf(
        hf_cfg, dtype=jnp.float32, attention_impl="sdpa"
    )
    params = hf_lib.params_from_hf(model.state_dict(), cfg)

    tokens = np.array([[3, 17, 42, 99, 7, 23, 56, 81]], np.int64)
    _assert_close(
        _logits_ours(params, cfg, tokens), _logits_hf(model, tokens), 2e-3
    )


def test_hf_llama_tied_embeddings_parity():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=96,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=4,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = hf_lib.config_from_hf(
        hf_cfg, dtype=jnp.float32, attention_impl="sdpa"
    )
    assert cfg.tie_embeddings
    params = hf_lib.params_from_hf(model.state_dict(), cfg)
    tokens = np.array([[5, 9, 2, 41, 8]], np.int64)
    _assert_close(
        _logits_ours(params, cfg, tokens), _logits_hf(model, tokens), 2e-3
    )


def test_hf_qwen2_bias_parity():
    hf_cfg = transformers.Qwen2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        use_sliding_window=False,
    )
    torch.manual_seed(2)
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    # Qwen2 puts bias on q/k/v with NO config flag — the loader must
    # detect it from the state dict (a silent qkv_bias=False would drop
    # the bias tensors and produce garbage logits).
    params, cfg = hf_lib.load_hf_model(model, dtype=jnp.float32)
    assert cfg.qkv_bias, "loader failed to detect q/k/v biases"
    cfg = hf_lib.config_from_hf(
        hf_cfg, dtype=jnp.float32, attention_impl="sdpa",
        qkv_bias=cfg.qkv_bias,
    )
    tokens = np.array([[12, 4, 77, 31, 9, 64]], np.int64)
    _assert_close(
        _logits_ours(params, cfg, tokens), _logits_hf(model, tokens), 2e-3
    )


def test_hf_mixtral_moe_parity():
    hf_cfg = transformers.MixtralConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        sliding_window=None,
    )
    torch.manual_seed(3)
    model = transformers.MixtralForCausalLM(hf_cfg).eval()
    cfg = hf_lib.config_from_hf(
        hf_cfg,
        dtype=jnp.float32,
        attention_impl="sdpa",
        # ample capacity: HF computes every routed token (no dropping), so
        # parity requires the dense-dispatch capacity to hold them all.
        capacity_factor=4.0,
    )
    assert cfg.num_experts == 4
    params = hf_lib.params_from_hf(model.state_dict(), cfg)
    tokens = np.array([[3, 17, 42, 99, 7, 23]], np.int64)
    _assert_close(
        _logits_ours(params, cfg, tokens), _logits_hf(model, tokens), 5e-3
    )


def test_hf_checkpoint_dir_roundtrip(tmp_path):
    """load_hf_checkpoint reads config.json + safetensors with no torch in
    the loop and reproduces the same logits."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=96,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=2,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
    )
    torch.manual_seed(4)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    params, cfg = hf_lib.load_hf_checkpoint(
        str(tmp_path), dtype=jnp.float32, attention_impl="sdpa"
    )
    tokens = np.array([[1, 2, 3, 44, 55]], np.int64)
    _assert_close(
        _logits_ours(params, cfg, tokens), _logits_hf(model, tokens), 4e-3
    )


def test_engine_from_hf_checkpoint(tmp_path):
    from quantumattention_tpu.serving.engine import Engine

    hf_cfg = transformers.LlamaConfig(
        vocab_size=96,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=2,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
    )
    torch.manual_seed(5)
    transformers.LlamaForCausalLM(hf_cfg).eval().save_pretrained(
        tmp_path, safe_serialization=True
    )
    eng = Engine.from_hf(str(tmp_path), num_slots=2, max_len=128)
    req = eng.submit([3, 7, 11], max_new_tokens=4)
    eng.run_to_completion()
    assert len(req.output) == 4


def test_params_from_hf_rejects_dropped_biases():
    """A cfg that would silently drop q/k/v bias tensors must be refused."""
    hf_cfg = transformers.Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        use_sliding_window=False,
    )
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    cfg = hf_lib.config_from_hf(hf_cfg)  # no bias flag in the config
    if cfg.qkv_bias:
        pytest.skip("this transformers version exposes a bias flag")
    with pytest.raises(ValueError, match="qkv_bias"):
        hf_lib.params_from_hf(model.state_dict(), cfg)


def test_hf_checkpoint_streaming_quantize(tmp_path):
    """quantize_weights streams per-tensor through jitted quantization
    (hf.params_from_hf(quantize=...)) — required at 8B scale where the
    full-precision tree exceeds HBM.  The result must be bit-identical to
    quantizing the full-precision tree after the fact."""
    from quantumattention_tpu.models import quantized as qz

    hf_cfg = transformers.LlamaConfig(
        vocab_size=96,
        hidden_size=256,
        intermediate_size=256,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=2,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
    )
    torch.manual_seed(6)
    transformers.LlamaForCausalLM(hf_cfg).eval().save_pretrained(
        tmp_path, safe_serialization=True
    )
    full, cfg = hf_lib.load_hf_checkpoint(str(tmp_path))
    for mode, post in (
        ("int8", qz.quantize_params),
        ("int4", qz.quantize_params_int4),
    ):
        streamed, _ = hf_lib.load_hf_checkpoint(
            str(tmp_path), quantize_weights=mode
        )
        expect = post(full)

        def close(path, a, b):
            packed = str(path[-1]) == "['q4']"
            a, b = np.asarray(a), np.asarray(b)
            if a.dtype == np.int8:
                # jit-vs-eager fp rounding can flip values sitting exactly
                # on a round-to-nearest boundary (same allowance as
                # quantized.init_quantized_params documents).  Packed int4
                # bytes compare nibble-wise (a high-nibble flip is ±16 in
                # the byte).
                if packed:
                    a = np.asarray(qz.unpack_int4_rows(a))
                    b = np.asarray(qz.unpack_int4_rows(b))
                diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
                # 4-bit grids hit equal-distance boundaries ~16x as often
                # as 8-bit ones; a ±1 flip there is the same value either
                # way, so only the fraction is bounded.
                assert diff.max() <= 1 and (diff != 0).mean() < 0.01
            else:
                np.testing.assert_allclose(
                    a.astype(np.float32), b.astype(np.float32), rtol=1e-6
                )

        jax.tree_util.tree_map_with_path(close, streamed, expect)
        # int4 must actually engage on the 256-divisible projections.
        if mode == "int4":
            assert "q4" in streamed["layers"][0]["w_gate"]


def test_params_from_hf_rejects_bad_quantize_mode(tmp_path):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = hf_lib.config_from_hf(hf_cfg)
    with pytest.raises(ValueError, match="quantize"):
        hf_lib.params_from_hf(model.state_dict(), cfg, quantize="fp4")
