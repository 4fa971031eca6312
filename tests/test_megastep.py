"""Differential tests for the layer-granular decode mega-kernel
(ops/megastep.py): one Pallas call per decode layer must reproduce the
unfused decode step (decode_attention + qmlp tail + append) — logits AND
cache state — on ragged, partially-active slot batches."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantumattention_tpu import config
from quantumattention_tpu.models import llama, quantized
from quantumattention_tpu.ops import megastep as mega
from quantumattention_tpu.ops import quant
from quantumattention_tpu.serving import kv_cache as kvc
from quantumattention_tpu.serving.backends import SlotsBackend


def _cfg(**kw):
    return llama.LlamaConfig(
        vocab_size=256,
        hidden_size=256,
        intermediate_size=256,
        num_layers=2,
        num_q_heads=4,
        num_kv_heads=2,
        head_dim=128,
        rope_theta=10000.0,
        **kw,
    )


def _fill_caches(backend, lengths, seed=0):
    """Random token-wise-quantized cache content up to each slot's
    length (rows beyond are garbage by contract)."""
    key = jax.random.PRNGKey(seed)
    out = []
    for li, c in enumerate(backend.caches):
        k1, k2, key = jax.random.split(key, 3)
        kf = jax.random.normal(k1, c.k.shape[:3] + (c.k.shape[3],), jnp.float32)
        vf = jax.random.normal(k2, c.k.shape[:3] + (c.k.shape[3],), jnp.float32)
        kq, ks = quant.dynamically_quantize_int8(kf, reduction_dim=-1)
        vq, vs = quant.dynamically_quantize_int8(vf, reduction_dim=-1)
        out.append(
            dataclasses.replace(
                c, k=kq, v=vq, k_scale=ks, v_scale=vs,
                lengths=jnp.asarray(lengths, jnp.int32),
            )
        )
    backend.caches = out


def _step(backend, params, tokens, active, flag):
    with config.patch({"kernel.megastep": flag, "kernel.qmlp": "force"}):
        caches, logits = backend._decode_step_impl(
            params, backend.caches, jnp.asarray(tokens), jnp.asarray(active)
        )
    return jax.tree_util.tree_map(np.asarray, (caches, logits))


@pytest.mark.parametrize("max_len,lengths,active", [
    # single cache block, ragged lengths, inactive + empty slots
    (128, [5, 37, 127, 0, 17, 90, 1, 33] + [9] * 8,
     [1, 1, 0, 1, 1, 1, 0, 1] + [1] * 8),
    # all-empty first step
    (128, [0] * 16, [1] * 16),
    # multi-block sweep + valid-block clamp (bkv=1024 -> 2 blocks, most
    # rows far below the second block)
    (2048, [1500, 5, 0, 1023, 1024, 1025, 40, 7] + [64] * 8,
     [1] * 6 + [0, 1] + [1] * 8),
])
def test_megastep_matches_unfused_decode(max_len, lengths, active):
    cfg = _cfg()
    params = quantized.fuse_projections(
        quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
    )
    tokens = np.arange(16, dtype=np.int32) % cfg.vocab_size
    active = np.asarray(active, bool)

    be_a = SlotsBackend(
        cfg, num_slots=16, max_len=max_len, cache_dtype=jnp.int8
    )
    be_b = SlotsBackend(
        cfg, num_slots=16, max_len=max_len, cache_dtype=jnp.int8
    )
    _fill_caches(be_a, lengths)
    _fill_caches(be_b, lengths)

    with config.patch({"kernel.megastep": "force"}):
        assert mega.megastep_supported(cfg, params, be_a.caches[0], 16)
    caches_ref, logits_ref = _step(be_a, params, tokens, active, False)
    caches_mega, logits_mega = _step(be_b, params, tokens, active, "force")

    scale = max(float(np.std(logits_ref)), 1e-6)
    rmse = float(np.sqrt(np.mean((logits_mega - logits_ref) ** 2))) / scale
    assert rmse < 1e-2, f"relative logit rmse {rmse}"

    # The cache write is the same quantize + scatter; values may differ
    # by the jit-vs-eager round-to-nearest boundary only (kvc.append is
    # jitted, the mega driver's quantize traces in the caller's context).
    # The appended row derives from the previous layer's output, which
    # differs between the paths at bf16-ulp level (softmax merge order),
    # so ±1 int8 flips occur at a few percent; anything larger (or a
    # misplaced write) would blow the max/fraction bounds.
    # Layer 0's appended row is computed from bit-identical inputs in
    # both paths (only jit-vs-eager rounding may flip it ±1); later
    # layers' inputs already differ at bf16-ulp level, so their written
    # rows wobble a little more.  A misplaced write would blow the max.
    flips, total = 0, 0
    for li, (cr, cm) in enumerate(zip(caches_ref, caches_mega)):
        np.testing.assert_array_equal(cr.lengths, cm.lengths)
        for b in range(16):
            n = int(cr.lengths[b])
            for a_arr, b_arr in (
                (cr.k[b, :, :n], cm.k[b, :, :n]),
                (cr.v[b, :, :n], cm.v[b, :, :n]),
            ):
                diff = np.abs(
                    a_arr.astype(np.int32) - b_arr.astype(np.int32)
                )
                assert diff.max() <= (1 if li == 0 else 3), (li, b)
                flips += int((diff != 0).sum())
                total += diff.size
            np.testing.assert_allclose(
                cr.k_scale[b, :, :n], cm.k_scale[b, :, :n], rtol=1e-2
            )
    assert flips / max(total, 1) < 0.02, (flips, total)


def test_megastep_gate_rejects_unsupported():
    cfg = _cfg()
    params = quantized.fuse_projections(
        quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
    )
    be = SlotsBackend(cfg, num_slots=16, max_len=128, cache_dtype=jnp.int8)
    with config.patch({"kernel.megastep": "force"}):
        # windowed configs route per-step (window rides the additive
        # column mask), but a burst whose side buffer could outgrow the
        # window falls back
        wcfg = dataclasses.replace(cfg, window=32)
        assert mega.megastep_supported(wcfg, params, be.caches[0], 16)
        assert not mega.megastep_supported(
            wcfg, params, be.caches[0], 16, side_tokens=64
        )
        # bf16 cache (no scales) falls back
        be_bf = SlotsBackend(
            cfg, num_slots=16, max_len=128, cache_dtype=jnp.bfloat16
        )
        assert not mega.megastep_supported(cfg, params, be_bf.caches[0], 16)
        # unfused tree falls back
        params_unfused = quantized.init_quantized_params(
            jax.random.PRNGKey(0), cfg
        )
        assert not mega.megastep_supported(
            cfg, params_unfused, be.caches[0], 16
        )
        # batch not a multiple of 16 falls back
        assert not mega.megastep_supported(cfg, params, be.caches[0], 12)


def test_megastep_burst_scan_consistency():
    """Three single steps through the mega path == the same three steps
    of the unfused path (teacher-forced), exercising the append-then-
    attend cache threading across steps."""
    cfg = _cfg()
    params = quantized.fuse_projections(
        quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
    )
    lengths = [3, 0, 11, 7] + [1] * 12
    tokens = np.arange(16, dtype=np.int32)
    active = np.ones(16, bool)

    outs = {}
    for flag in (False, "force"):
        be = SlotsBackend(cfg, num_slots=16, max_len=128, cache_dtype=jnp.int8)
        _fill_caches(be, lengths)
        toks = tokens
        trace = []
        for _ in range(3):
            with config.patch({"kernel.megastep": flag, "kernel.qmlp": "force"}):
                be.caches, logits = be._decode_step_impl(
                    params, be.caches, jnp.asarray(toks), jnp.asarray(active)
                )
            # Teacher-forced next tokens (logit-independent): greedy
            # continuations on untrained models are near-tie flaky.
            toks = (toks * 7 + 1) % cfg.vocab_size
            trace.append(np.asarray(logits))
        outs[flag] = trace

    for a, b in zip(outs[False], outs["force"]):
        scale = max(float(np.std(a)), 1e-6)
        rmse = float(np.sqrt(np.mean((a - b) ** 2))) / scale
        assert rmse < 2e-2, f"relative logit rmse {rmse}"


def test_megastep_burst_invariants_and_flush_placement():
    """The mega burst (invariant caches + side buffer + one flush) must
    produce the same SCHEDULE as the unfused burst (lengths, emit
    counts, completion) and land its side tokens at exactly the rows the
    per-step append would have used (scale rows move off their init
    value only inside [base, base+emitted))."""
    cfg = _cfg()
    params = quantized.fuse_projections(
        quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
    )
    base_lengths = [5, 37, 101, 1] + [9] * 12

    def run(flag, burst):
        be = SlotsBackend(cfg, num_slots=16, max_len=128,
                          cache_dtype=jnp.int8)
        _fill_caches(be, base_lengths, seed=3)
        # zero the unwritten scale rows so flush placement is observable
        be.caches = [
            dataclasses.replace(
                c,
                k_scale=jnp.where(
                    jnp.arange(128)[None, None, :] < c.lengths[:, None, None],
                    c.k_scale, 0.0,
                ),
            )
            for c in be.caches
        ]
        tokens = np.arange(16, dtype=np.int32)
        active = np.ones(16, bool)
        remaining = np.full(16, 7, np.int32)
        eos = np.full(16, -1, np.int32)
        from quantumattention_tpu.serving.sampling import SamplingParams

        with config.patch({"kernel.megastep": flag}):
            packed = be.burst(
                params, tokens, active, remaining, eos,
                jax.random.PRNGKey(7), burst, SamplingParams(), False,
            )
        return be, packed

    be_m, packed_m = run("force", 4)
    be_u, packed_u = run(False, 4)

    # schedule: same emit mask everywhere (no EOS, ample budget)
    np.testing.assert_array_equal(packed_m[1], packed_u[1])
    np.testing.assert_array_equal(
        np.asarray(be_m.caches[0].lengths), np.asarray(be_u.caches[0].lengths)
    )
    for c in be_m.caches:
        ksc = np.asarray(c.k_scale)
        for b in range(16):
            lo, hi = base_lengths[b], base_lengths[b] + 4
            assert (ksc[b, :, lo:hi] != 0).all(), (b, "flush missing rows")
            assert (ksc[b, :, hi:] == 0).all(), (b, "flush wrote past end")


def test_megastep_burst_first_tokens_match_step():
    """The first burst step starts from state identical to a single mega
    decode step; its sampled tokens must match (greedy).  Merge-order fp
    noise can flip a genuine near-tie on an untrained model, so one
    mismatching slot out of 16 is tolerated (CLAUDE.md testing notes)."""
    cfg = _cfg()
    params = quantized.fuse_projections(
        quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
    )
    lengths = [5, 37, 101, 1] + [9] * 12
    tokens = np.arange(16, dtype=np.int32)
    active = np.ones(16, bool)
    from quantumattention_tpu.serving.sampling import SamplingParams

    be_a = SlotsBackend(cfg, num_slots=16, max_len=128, cache_dtype=jnp.int8)
    _fill_caches(be_a, lengths, seed=5)
    with config.patch({"kernel.megastep": "force"}):
        packed = be_a.burst(
            params, tokens, active, np.full(16, 3, np.int32),
            np.full(16, -1, np.int32), jax.random.PRNGKey(7), 3,
            SamplingParams(), False,
        )
    first_burst = packed[0][0]

    be_b = SlotsBackend(cfg, num_slots=16, max_len=128, cache_dtype=jnp.int8)
    _fill_caches(be_b, lengths, seed=5)
    with config.patch({"kernel.megastep": "force"}):
        be_b.caches, logits = be_b._decode_step_impl(
            params, be_b.caches, jnp.asarray(tokens), jnp.asarray(active)
        )
    first_step = np.asarray(jnp.argmax(logits, -1))
    assert (first_burst != first_step).sum() <= 1, (first_burst, first_step)


def test_megastep_window_matches_unfused_decode():
    """Sliding-window (Mistral-style) decode through the mega kernel:
    the window bound rides build_decode_ctx's additive column mask (no
    kernel change), so fused logits must match the unfused windowed
    decode step on lengths straddling the window extent."""
    cfg = _cfg(window=40)
    params = quantized.fuse_projections(
        quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
    )
    lengths = [5, 37, 127, 0, 39, 40, 41, 90] + [64] * 8
    tokens = np.arange(16, dtype=np.int32) % cfg.vocab_size
    active = np.ones(16, bool)
    active[3] = False

    be_a = SlotsBackend(cfg, num_slots=16, max_len=128, cache_dtype=jnp.int8)
    be_b = SlotsBackend(cfg, num_slots=16, max_len=128, cache_dtype=jnp.int8)
    _fill_caches(be_a, lengths, seed=11)
    _fill_caches(be_b, lengths, seed=11)

    with config.patch({"kernel.megastep": "force"}):
        assert mega.megastep_supported(cfg, params, be_a.caches[0], 16)
    caches_ref, logits_ref = _step(be_a, params, tokens, active, False)
    caches_mega, logits_mega = _step(be_b, params, tokens, active, "force")

    scale = max(float(np.std(logits_ref)), 1e-6)
    rmse = float(np.sqrt(np.mean((logits_mega - logits_ref) ** 2))) / scale
    assert rmse < 1e-2, f"relative logit rmse {rmse}"
    for cr, cm in zip(caches_ref, caches_mega):
        np.testing.assert_array_equal(cr.lengths, cm.lengths)


def test_megastep_window_burst_schedule_matches_unfused():
    """Windowed mega BURST (per-step rebuilt cache mask, side columns
    in-window by the gate): same emit schedule and final lengths as the
    unfused windowed burst; first tokens match up to one near-tie."""
    cfg = _cfg(window=48)
    params = quantized.fuse_projections(
        quantized.init_quantized_params(jax.random.PRNGKey(0), cfg)
    )
    base_lengths = [5, 46, 101, 1] + [30] * 12
    from quantumattention_tpu.serving.sampling import SamplingParams

    def run(flag):
        be = SlotsBackend(cfg, num_slots=16, max_len=128,
                          cache_dtype=jnp.int8)
        _fill_caches(be, base_lengths, seed=13)
        tokens = np.arange(16, dtype=np.int32)
        with config.patch({"kernel.megastep": flag}):
            if flag == "force":
                assert mega.megastep_supported(
                    cfg, params, be.caches[0], 16, side_tokens=8,
                )
            packed = be.burst(
                params, tokens, np.ones(16, bool),
                np.full(16, 5, np.int32), np.full(16, -1, np.int32),
                jax.random.PRNGKey(7), 4, SamplingParams(), False,
            )
        return be, packed

    be_m, packed_m = run("force")
    be_u, packed_u = run(False)
    np.testing.assert_array_equal(packed_m[1], packed_u[1])
    np.testing.assert_array_equal(
        np.asarray(be_m.caches[0].lengths),
        np.asarray(be_u.caches[0].lengths),
    )
    assert (packed_m[0][0] != packed_u[0][0]).sum() <= 1
