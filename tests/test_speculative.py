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


def test_speculative_kv_int4_matches_plain_greedy(params, draft_params):
    """Greedy speculative decoding over a packed-int4 slot cache must be
    bit-identical to plain int4 greedy decoding (per-token quantization is
    batch-invariant, and rollback only shrinks lengths)."""
    prompt = [5, 9, 23, 51, 7]

    def run(**kw):
        eng = Engine(params, CFG, num_slots=2, max_len=256,
                     cache_dtype=jnp.int8, kv_int4=True, **kw)
        req = eng.submit(prompt, max_new_tokens=12)
        eng.run_to_completion()
        return req.output, eng

    plain, _ = run()
    spec, eng = run(draft=(draft_params, DRAFT_CFG), spec_tokens=3)
    assert spec == plain
    assert eng.stats["spec_rounds"] > 0


def test_speculative_paged_backend(params, draft_params):
    """Speculative decoding on the PAGED backend: multi-token page writes +
    the paged kernel's multi-query verification.  CPU paged runs are
    schedule-invariant only (CLAUDE.md: the CPU runtime's paged flow is
    nondeterministic), so assert the speculative contract — rounds ran,
    budgets respected, first token matches the slots path — not exact
    token equality (chip runs assert that: benchmarks/
    validate_paged_spec.py)."""
    prompt = [5, 9, 23, 51, 7]
    n_new = 12

    slots_eng = Engine(params, CFG, num_slots=2, max_len=256,
                       cache_dtype=jnp.bfloat16,
                       draft=(draft_params, DRAFT_CFG), spec_tokens=3)
    r_slots = slots_eng.submit(prompt, max_new_tokens=n_new)
    slots_eng.run_to_completion()

    eng = Engine(params, CFG, num_slots=2, max_len=256,
                 cache_dtype=jnp.bfloat16, cache_backend="paged",
                 page_size=64, draft=(draft_params, DRAFT_CFG),
                 spec_tokens=3)
    req = eng.submit(prompt, max_new_tokens=n_new)
    eng.run_to_completion()
    assert req.done
    assert len(req.output) == n_new
    assert req.output[0] == r_slots.output[0]
    assert eng.stats["spec_rounds"] > 0
    # All pages returned after completion.
    assert int(eng.alloc.allocated.sum()) == 0


def test_speculative_paged_pool_pressure_falls_back(params, draft_params):
    """When the page pool cannot cover a verification round's growth the
    engine must fall back to per-token decoding (and still complete)
    rather than dying on an out-of-pages error mid-round."""
    prompt = list(range(1, 60))  # ~1 page of prompt at page_size=64
    eng = Engine(params, CFG, num_slots=2, max_len=256,
                 cache_dtype=jnp.bfloat16, cache_backend="paged",
                 page_size=64, num_pages=3,  # barely fits one request
                 draft=(draft_params, DRAFT_CFG), spec_tokens=3)
    req = eng.submit(prompt, max_new_tokens=6)
    eng.run_to_completion()
    assert req.done and len(req.output) == 6


def test_speculative_stochastic_requests_complete(params, draft_params):
    """Stochastic requests run the rejection-sampling speculative rounds
    (distributional exactness is the unit test below); here: scheduling
    completes, budgets respected, tokens in-vocab."""
    from quantumattention_tpu.serving.sampling import SamplingParams

    eng = Engine(
        params, CFG, num_slots=2, max_len=256, cache_dtype=jnp.bfloat16,
        draft=(draft_params, DRAFT_CFG), spec_tokens=3,
    )
    reqs = [
        eng.submit(
            [4, 5, 6], max_new_tokens=6,
            sampling=SamplingParams(temperature=0.8, top_k=10),
        ),
        eng.submit(
            [9, 1, 2, 7], max_new_tokens=4,
            sampling=SamplingParams(temperature=0.8, top_k=10),
        ),
    ]
    eng.run_to_completion()
    assert len(reqs[0].output) == 6 and len(reqs[1].output) == 4
    assert all(0 <= t < CFG.vocab_size for r in reqs for t in r.output)


def test_speculative_mixed_sampling_falls_back(params, draft_params):
    """Requests with DIFFERENT SamplingParams can't share a speculative
    round — the engine falls back to per-token decoding and completes."""
    from quantumattention_tpu.serving.sampling import SamplingParams

    eng = Engine(
        params, CFG, num_slots=2, max_len=256, cache_dtype=jnp.bfloat16,
        draft=(draft_params, DRAFT_CFG),
    )
    r1 = eng.submit([4, 5, 6], max_new_tokens=4)  # greedy
    r2 = eng.submit(
        [7, 8], max_new_tokens=3,
        sampling=SamplingParams(temperature=0.7),
    )
    eng.run_to_completion()
    assert len(r1.output) == 4 and len(r2.output) == 3


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


def test_rejection_scheme_preserves_target_distribution():
    """Core speculative-sampling invariant (Leviathan et al. Thm 1): the
    first emitted token is distributed EXACTLY as the target p, no matter
    how bad the draft q is.  50k vectorized trials, tiny vocab."""
    import numpy as np
    from quantumattention_tpu.serving.speculative import speculative_accept

    V, N = 8, 50_000
    kp, kq, kt = jax.random.split(jax.random.PRNGKey(0), 3)
    p = jax.nn.softmax(jax.random.normal(kp, (V,)) * 1.5)
    q = jax.nn.softmax(jax.random.normal(kq, (V,)) * 1.5)  # mismatched draft

    def one_trial(key):
        kd, ka = jax.random.split(key)
        x = jax.random.categorical(kd, jnp.log(q))  # proposal ~ q
        n_acc, final = speculative_accept(
            ka,
            q[None, None, :],                       # (B=1, gamma=1, V)
            jnp.stack([p, p])[None],                # (1, 2, V)
            x[None, None].astype(jnp.int32),        # (1, 1)
        )
        return jnp.where(n_acc[0] >= 1, x, final[0])

    toks = jax.vmap(one_trial)(jax.random.split(kt, N))
    emp = np.bincount(np.asarray(toks), minlength=V) / N
    # Multinomial std per bin ~ sqrt(p/N) <= 0.0025; allow 4 sigma + slack.
    assert np.abs(emp - np.asarray(p)).max() < 0.012, (
        emp, np.asarray(p),
    )


def test_rejection_scheme_self_draft_accepts_all():
    """q == p: accept probability is exactly 1, so n_acc == gamma and the
    final token comes from the bonus distribution."""
    from quantumattention_tpu.serving.speculative import speculative_accept

    V, gamma = 8, 3
    p = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (V,)))
    q_probs = jnp.tile(p[None, None], (1, gamma, 1))
    p_probs = jnp.tile(p[None, None], (1, gamma + 1, 1))
    props = jnp.array([[2, 5, 1]], jnp.int32)
    n_acc, final = speculative_accept(
        jax.random.PRNGKey(2), q_probs, p_probs, props
    )
    assert int(n_acc[0]) == gamma
    assert 0 <= int(final[0]) < V


def test_speculative_with_window_model(params, draft_params):
    """Speculative rounds on a sliding-window target: the multi-query
    verification must apply the window too — outputs equal plain greedy."""
    cfg_w = llama.tiny(attention_impl="sdpa", dtype=jnp.float32, window=8)
    params_w = llama.init_params(jax.random.PRNGKey(11), cfg_w)
    dcfg_w = llama.tiny(
        attention_impl="sdpa", dtype=jnp.float32, window=8,
        num_layers=1, num_q_heads=4, num_kv_heads=2,
    )
    dparams_w = llama.init_params(jax.random.PRNGKey(12), dcfg_w)
    prompt = list(range(1, 15))

    plain = Engine(params_w, cfg_w, num_slots=1, max_len=64,
                   cache_dtype=jnp.float32)
    pr = plain.submit(prompt, max_new_tokens=8)
    plain.run_to_completion()

    spec = Engine(
        params_w, cfg_w, num_slots=1, max_len=64,
        cache_dtype=jnp.float32,
        draft=(dparams_w, dcfg_w), spec_tokens=3,
    )
    sr = spec.submit(prompt, max_new_tokens=8)
    spec.run_to_completion()
    assert sr.output == pr.output
