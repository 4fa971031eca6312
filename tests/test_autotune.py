"""Autotuner unit tests (cache, pruning, sweep logic — no TPU needed)."""

import json

import jax.numpy as jnp
import pytest

from quantumattention_tpu import autotune


@pytest.fixture(autouse=True)
def isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("QUANTUM_ATTN_CACHE_DIR", str(tmp_path))
    autotune._CACHE = None
    yield
    autotune._CACHE = None


def test_shape_key_buckets_long_sequences():
    k1 = autotune.shape_key("flash", 1, 8, 8, 5000, 5000, 128, True, jnp.bfloat16)
    k2 = autotune.shape_key("flash", 1, 8, 8, 6000, 6000, 128, True, jnp.bfloat16)
    k3 = autotune.shape_key("flash", 1, 8, 8, 9000, 9000, 128, True, jnp.bfloat16)
    assert k1 == k2  # both bucket to 8192
    assert k1 != k3  # 16384 bucket


def test_prune_respects_vmem():
    # The fit model now follows the limit the kernel will actually request
    # (64 MiB on v5e+); pin it so the assertion is device-independent.
    # The measured-best (1024, 2048) must survive the v5e budget (the old
    # 32 MiB model wrongly rejected configs the kernel runs fine)...
    assert autotune.vmem_fits(1024, 2048, 128, limit_mb=64)
    assert autotune.vmem_fits(1024, 2048, 256, limit_mb=64)
    # ...but not the pre-v5 default budget.
    assert not autotune.vmem_fits(1024, 2048, 128, limit_mb=16)
    cands = autotune.prune_candidates(8192, 8192, 128)
    assert all(autotune.vmem_fits(bq, bkv, 128) for bq, bkv in cands)


def test_prune_shrinks_for_short_seqs():
    cands = autotune.prune_candidates(256, 256, 64)
    assert all(bq <= 512 and bkv <= 512 for bq, bkv in cands)


def test_tune_caches_winner(tmp_path):
    calls = []

    def runner(bq, bkv):
        def run():
            calls.append((bq, bkv))
            import jax.numpy as jnp
            import time

            time.sleep(0.01 if (bq, bkv) == (128, 128) else 0.05)
            return jnp.zeros((2, 2))

        return run

    key = "test|key"
    best = autotune.tune(key, runner, [(128, 128), (256, 256)])
    assert best == (128, 128)
    # Cached on disk.
    data = json.loads(autotune.cache_path().read_text())
    assert data[key] == [128, 128]
    # Second call short-circuits (no new timing runs).
    n = len(calls)
    best2 = autotune.tune(key, runner, [(128, 128), (256, 256)])
    assert best2 == (128, 128)
    assert len(calls) == n


def test_tune_skips_failing_candidates():
    def runner(bq, bkv):
        def run():
            if bq == 128:
                raise RuntimeError("compile OOM")
            import jax.numpy as jnp

            return jnp.zeros((2, 2))

        return run

    best = autotune.tune("test|fail", runner, [(128, 128), (256, 256)])
    assert best == (256, 256)


def test_tune_chained_runner_times_and_caches():
    """Runners taking an eps argument go through the chained-scan timer
    (the fixed ~33 ms dispatch+fetch roundtrip otherwise drowns sub-ms
    candidate differences; CLAUDE.md 'measured truths')."""
    import jax
    import jax.numpy as jnp

    def runner(bq, bkv):
        def run(eps):
            # Work scales with bq so the ordering is deterministic enough
            # on CPU; eps threads the chain dependency.
            x = jnp.ones((bq, 128), jnp.float32) + eps
            return (x * 2.0).sum(axis=1, keepdims=True)

        return run

    best = autotune.tune("test|chained", runner, [(128, 128), (256, 256)])
    assert best in [(128, 128), (256, 256)]
    data = json.loads(autotune.cache_path().read_text())
    assert data["test|chained"] == list(best)


def test_time_chained_matches_contract():
    import jax.numpy as jnp

    calls = []

    def run(eps):
        calls.append(1)
        return jnp.zeros((4, 4)) + eps

    t = autotune._time_chained(run)
    assert t >= 0.0
    # Traced a handful of times (warm + rough + chained compile), not once
    # per chained iteration.
    assert len(calls) <= 8


def test_run_outside_trace_escapes_ambient_trace():
    """run_outside_trace must execute jitted work eagerly even while an
    outer trace is active (the in-jit pre-tune path; a fresh thread sees
    no ambient trace — ensure_compile_time_eval cannot compile pallas)."""
    import jax
    import jax.numpy as jnp

    results = {}

    def f(x):
        def sweep():
            y = jax.jit(lambda a: a * 2.0)(jnp.ones((4,), jnp.float32))
            return float(y.sum())

        results["val"] = autotune.run_outside_trace(sweep)
        return x + 1

    jax.jit(f)(jnp.zeros((2,), jnp.float32))
    assert results["val"] == 8.0


def test_pretuned_defaults_merge(tmp_path, monkeypatch):
    """Packaged pretuned.json supplies defaults; the user cache wins."""
    import json as _json

    fake = tmp_path / "pretuned.json"
    fake.write_text(_json.dumps({"dev|flash|shipped": [512, 1024],
                                 "dev|flash|both": [256, 256]}))
    monkeypatch.setattr(autotune, "_pretuned_path", lambda: fake)
    autotune._CACHE = None
    assert autotune.lookup("dev|flash|shipped") == (512, 1024)
    # user record overrides the shipped value and persists
    autotune.record("dev|flash|both", 1024, 2048)
    autotune._CACHE = None
    assert autotune.lookup("dev|flash|both") == (1024, 2048)
    assert autotune.lookup("dev|flash|shipped") == (512, 1024)


def test_tune_accepts_runner_pairs():
    """(fn, args) runner pairs: buffers ride as jit parameters (the
    HTTP-413-safe contract used by the fused kernels)."""
    import jax.numpy as jnp

    big = jnp.ones((64, 128), jnp.float32)

    def runner(bq, bkv):
        def run(eps, x):
            return (x[:bq // 64 + 1] * 2.0 + eps).sum(
                axis=1, keepdims=True
            )

        return run, (big,)

    best = autotune.tune("test|pair", runner, [(128, 128), (256, 256)])
    assert best in [(128, 128), (256, 256)]
    data = json.loads(autotune.cache_path().read_text())
    assert data["test|pair"] == list(best)
