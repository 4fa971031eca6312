"""Speculative decoding: greedy outputs must be BIT-IDENTICAL to plain
greedy decoding (the target's argmax decides every emitted token; the
draft only changes how many target passes it takes).

Beyond the reference (prefill-only kernels) — serving-stack extension.
"""

import jax
import jax.numpy as jnp
import pytest

from quantumattention_tpu.models import llama
from quantumattention_tpu.serving.engine import Engine

CFG = llama.tiny(attention_impl="sdpa", dtype=jnp.float32)
DRAFT_CFG = llama.tiny(
    attention_impl="sdpa",
    dtype=jnp.float32,
    num_layers=1,
    num_q_heads=4,
    num_kv_heads=2,
)


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def draft_params():
    return llama.init_params(jax.random.PRNGKey(7), DRAFT_CFG)


def greedy_engine_output(params, prompt, n_new, **kw):
    eng = Engine(params, CFG, num_slots=2, max_len=256,
                 cache_dtype=jnp.bfloat16, **kw)
    req = eng.submit(prompt, max_new_tokens=n_new)
    eng.run_to_completion()
    return req.output


def test_speculative_matches_plain_greedy(params, draft_params):
    prompt = [5, 9, 23, 51, 7]
    plain = greedy_engine_output(params, prompt, 12)
    spec = greedy_engine_output(
        params, prompt, 12,
        draft=(draft_params, DRAFT_CFG), spec_tokens=3,
    )
    assert spec == plain


def test_speculative_self_draft_accepts_everything(params):
    """Target as its own draft: every proposal must be accepted, so each
    round emits spec_tokens+1 tokens — and the output still matches."""
    prompt = [3, 17, 42]
    plain = greedy_engine_output(params, prompt, 9)
    eng = Engine(
        params, CFG, num_slots=2, max_len=256, cache_dtype=jnp.bfloat16,
        draft=(params, CFG), spec_tokens=2,
    )
    req = eng.submit(prompt, max_new_tokens=9)
    steps = 0
    while not req.done:
        eng.step()
        steps += 1
    assert req.output == plain
    # 9 tokens at 3 per round (2 accepted + bonus) => 3 decode rounds
    # (+1 step for prefill admission).
    assert steps <= 5, steps


def test_speculative_continuous_batching(params, draft_params):
    """Two concurrent requests through speculative rounds; each must equal
    its solo plain-greedy output."""
    eng = Engine(
        params, CFG, num_slots=2, max_len=256, cache_dtype=jnp.bfloat16,
        draft=(draft_params, DRAFT_CFG), spec_tokens=3,
    )
    r1 = eng.submit([1, 2, 3], max_new_tokens=7)
    r2 = eng.submit([9, 8, 7, 6], max_new_tokens=5)
    eng.run_to_completion()
    assert r1.output == greedy_engine_output(params, [1, 2, 3], 7)
    assert r2.output == greedy_engine_output(params, [9, 8, 7, 6], 5)


def test_speculative_eos_mid_round(params, draft_params):
    prompt = [3, 17, 42, 99, 7]
    plain = greedy_engine_output(params, prompt, 8)
    eos = plain[2]  # stop at the 3rd generated token
    expect = plain[: plain.index(eos) + 1]
    spec = greedy_engine_output(
        params, prompt, 8,
        draft=(draft_params, DRAFT_CFG), spec_tokens=4,
    )
    # sanity: same stream
    assert spec == plain
    eng = Engine(
        params, CFG, num_slots=2, max_len=256, cache_dtype=jnp.bfloat16,
        draft=(draft_params, DRAFT_CFG), spec_tokens=4,
    )
    req = eng.submit(prompt, max_new_tokens=8, eos_id=eos)
    eng.run_to_completion()
    assert req.output == expect


def test_speculative_rejects_paged_and_int4(params, draft_params):
    with pytest.raises(ValueError, match="slots backend"):
        Engine(params, CFG, num_slots=2, max_len=256,
               cache_backend="paged",
               draft=(draft_params, DRAFT_CFG))
    with pytest.raises(ValueError, match="kv_int4"):
        Engine(params, CFG, num_slots=2, max_len=256, kv_int4=True,
               draft=(draft_params, DRAFT_CFG))


def test_speculative_sampling_falls_back_to_plain(params, draft_params):
    """Non-greedy sampling bypasses speculative rounds (rejection-sampling
    speculative is future work) — requests still complete."""
    from quantumattention_tpu.serving.sampling import SamplingParams

    eng = Engine(
        params, CFG, num_slots=2, max_len=256, cache_dtype=jnp.bfloat16,
        draft=(draft_params, DRAFT_CFG),
    )
    req = eng.submit(
        [4, 5, 6], max_new_tokens=6,
        sampling=SamplingParams(temperature=0.8, top_k=10),
    )
    eng.run_to_completion()
    assert len(req.output) == 6


def test_speculative_near_max_len_falls_back(params, draft_params):
    """Verification appends spec_tokens+1 rows before acceptance; near
    max_len a clamped write would corrupt the cache tail, so the engine
    must fall back to per-token decoding and still finish correctly."""
    max_len = 32
    prompt = list(range(1, 25))  # 24 tokens; room for 8 more
    plain_eng = Engine(params, CFG, num_slots=1, max_len=max_len,
                       cache_dtype=jnp.bfloat16)
    pr = plain_eng.submit(prompt, max_new_tokens=8)
    plain_eng.run_to_completion()

    eng = Engine(
        params, CFG, num_slots=1, max_len=max_len,
        cache_dtype=jnp.bfloat16,
        draft=(draft_params, DRAFT_CFG), spec_tokens=4,
    )
    req = eng.submit(prompt, max_new_tokens=8)
    eng.run_to_completion()
    assert req.output == pr.output
