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
    cands = autotune.prune_candidates(8192, 8192, 128)
    assert (1024, 2048) in cands
    assert (2048, 2048) not in cands
    # 2*2048*2048*4 = 32 MiB of fp32 tiles alone exceeds the 32 MiB slice
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
