"""Continuous-batching decode pool: per-row parity with solo decodes.

The pool (``models/decode_pool.py``) admits requests into a RUNNING decode
at chunk boundaries — so the contract under test is: no matter when a row
joins, which slot it lands in, how long finished neighbors linger, or how
the chunk boundaries fall, its token sequence is bit-identical to a solo
``generate_greedy`` run at the same prompt bucket.
"""

import asyncio
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyrag_tpu.generation import ContinuousBatchingLocalLLM
from easyrag_tpu.models.decode_pool import DecodePool
from easyrag_tpu.models.layers import init_params

sys.path.insert(0, str(Path(__file__).parent))
from test_decode import VOCAB, run_cached, tiny_cfg  # noqa: E402

EOS = VOCAB - 1


class StubLLM:
    """The JaxCausalLM surface DecodePool consumes, minus the checkpoint:
    cfg/params/buckets/eos plus deterministic byte-level encode/decode for
    the async wrapper test."""

    def __init__(self, cfg, params, buckets=(4, 8), max_new=6, eos_ids=(EOS,),
                 spec_tokens=0, spec_ngram=2):
        self.cfg = cfg
        self.params = params
        self.buckets = tuple(buckets)
        self.max_new_tokens = max_new
        self.eos_ids = list(eos_ids)
        self.spec_tokens = spec_tokens
        self.spec_ngram = spec_ngram

        class Tok:
            pad_token_id = 0

        self.tokenizer = Tok()

    def _encode(self, q):
        ids = [1 + (b % (VOCAB - 2)) for b in q.encode()]
        return ids[: self.buckets[-1]]

    def _decode_row(self, toks):
        cut = min((toks.index(e) for e in self.eos_ids if e in toks), default=None)
        if cut is not None:
            toks = toks[:cut]
        return " ".join(str(t) for t in toks)


def solo(llm, prompt):
    """Oracle: generate_greedy at the bucket insert() would pick."""
    bucket = next(b for b in llm.buckets if len(prompt) <= b)
    return run_cached(
        llm.cfg, llm.params, prompt, llm.max_new_tokens, llm.eos_ids,
        bucket=bucket,
    )


def harvest(pool, results):
    for handle, toks in pool.run_chunk():
        results[handle] = toks


def test_staggered_joins_match_solo():
    """Three prompts of different lengths/buckets join a running pool at
    different chunk boundaries; every row equals its solo run."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(0))
    llm = StubLLM(cfg, params, buckets=(4, 8), max_new=6)
    pool = DecodePool(llm, pool_size=3, chunk_steps=2)
    prompts = {"a": [3, 1, 4], "b": [1, 5, 9, 2, 6, 5], "c": [8, 9]}

    results = {}
    pool.insert(prompts["a"], "a")
    harvest(pool, results)  # a is 2 steps in when b joins
    pool.insert(prompts["b"], "b")
    harvest(pool, results)
    pool.insert(prompts["c"], "c")  # two live rows at different progress
    assert pool.joins == 2
    while pool.active:
        harvest(pool, results)

    for name, prompt in prompts.items():
        assert results[name] == solo(llm, prompt), name


def test_slot_reuse_after_finish():
    """A freed slot's stale cache/mask must not leak into its next tenant."""
    cfg = tiny_cfg(num_key_value_heads=2)
    params = init_params(cfg, jax.random.key(1))
    llm = StubLLM(cfg, params, buckets=(4, 8), max_new=4)
    pool = DecodePool(llm, pool_size=1, chunk_steps=8)

    results = {}
    pool.insert([7, 2, 9, 4, 1], "first")
    while pool.active:
        harvest(pool, results)
    reused = pool.insert([2, 2], "second")  # same slot, smaller bucket
    assert reused == 0 and pool.free == []
    while pool.active:
        harvest(pool, results)

    assert results["first"] == solo(llm, [7, 2, 9, 4, 1])
    assert results["second"] == solo(llm, [2, 2])


def test_eos_terminates_row_and_suffix_is_eos_filled():
    """Rows stop at EOS mid-chunk; the emitted EOS is kept and the suffix
    is eos0-filled exactly like generate_greedy."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(2))
    probe = StubLLM(cfg, params, buckets=(4,), max_new=5)
    free_run = solo(probe, [3, 1, 4])  # no natural EOS expected
    eos = free_run[1]  # make the 2nd emitted token the EOS

    llm = StubLLM(cfg, params, buckets=(4,), max_new=5, eos_ids=(eos,))
    pool = DecodePool(llm, pool_size=2, chunk_steps=8)
    results = {}
    pool.insert([3, 1, 4], "x")
    while pool.active:
        harvest(pool, results)
    assert results["x"] == solo(llm, [3, 1, 4])
    assert results["x"] == free_run[:2] + [eos] * 3


def test_finished_row_output_survives_lingering():
    """A done row that stays in the pool while others decode keeps its
    emitted tokens (the out-write preserves current values)."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(3))
    llm = StubLLM(cfg, params, buckets=(4, 8), max_new=3)
    pool = DecodePool(llm, pool_size=2, chunk_steps=1)  # 1-step chunks

    results = {}
    pool.insert([5, 3], "short")
    pool.insert([1, 2, 3, 4, 5, 6], "long")
    for _ in range(12):
        if not pool.active:
            break
        harvest(pool, results)
    assert results["short"] == solo(llm, [5, 3])
    assert results["long"] == solo(llm, [1, 2, 3, 4, 5, 6])


def test_async_wrapper_joins_and_matches():
    """The acomplete contract end to end: more requests than slots, all
    resolve to their solo-run text, and at least one mid-flight join
    happened (the feature under test)."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(4))
    llm = StubLLM(cfg, params, buckets=(4, 8), max_new=4)
    wrapper = ContinuousBatchingLocalLLM(llm, pool_size=2, chunk_steps=2)

    prompts = ["ab", "cdef", "g", "hijk", "lm"]

    async def drive():
        async def staggered(i, p):
            await asyncio.sleep(0.002 * i)
            return await wrapper.acomplete(p)

        return await asyncio.gather(
            *(staggered(i, p) for i, p in enumerate(prompts))
        )

    outs = asyncio.run(drive())
    for p, resp in zip(prompts, outs):
        toks = solo(llm, llm._encode(p))
        assert resp.text == llm._decode_row(toks), p
    assert wrapper.dispatches == wrapper.pool.chunks > 0


def test_pool_warmup_compiles_and_resets():
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(5))
    llm = StubLLM(cfg, params, buckets=(4, 8), max_new=3)
    pool = DecodePool(llm, pool_size=2, chunk_steps=4)
    pool.warmup()
    assert not pool.active and sorted(pool.free) == [0, 1]
    # pool still correct after the warmup/reset cycle
    results = {}
    pool.insert([9, 8, 7], "q")
    while pool.active:
        harvest(pool, results)
    assert results["q"] == solo(llm, [9, 8, 7])


# --- speculative chunks (pool_chunk_spec) ---------------------------------


@pytest.mark.parametrize("draft_len", [1, 3])
def test_spec_pool_staggered_joins_match_solo(draft_len):
    """Spec-mode pool: rows join at different chunk boundaries, accept
    different draft counts, and every row must still equal its solo
    generate_greedy run (greedy acceptance is exact)."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(0))
    llm = StubLLM(cfg, params, buckets=(4, 8), max_new=6,
                  spec_tokens=draft_len)
    pool = DecodePool(llm, pool_size=3, chunk_steps=2)
    prompts = {"a": [3, 1, 4], "b": [1, 5, 9, 2, 6, 5], "c": [8, 9]}

    results = {}
    pool.insert(prompts["a"], "a")
    harvest(pool, results)
    pool.insert(prompts["b"], "b")
    harvest(pool, results)
    pool.insert(prompts["c"], "c")
    while pool.active:
        harvest(pool, results)
    for name, prompt in prompts.items():
        assert results[name] == solo(llm, prompt), name


@pytest.mark.parametrize("seed", range(4))
def test_spec_pool_matches_across_seeds(seed):
    """Random tiny models routinely fall into greedy cycles — the regime
    where drafts ACCEPT — so seed sweeps hit both accept and reject paths;
    EOS placement mid-block is covered by the solo-run equality."""
    cfg = tiny_cfg(num_key_value_heads=2)
    params = init_params(cfg, jax.random.key(10 + seed))
    llm = StubLLM(cfg, params, buckets=(8,), max_new=10, spec_tokens=3)
    pool = DecodePool(llm, pool_size=2, chunk_steps=3)
    prompts = {
        "x": [(seed * 7 + j * 3) % (VOCAB - 2) + 1 for j in range(7)],
        "y": [(seed * 5 + j) % (VOCAB - 2) + 1 for j in range(4)],
    }
    results = {}
    for name, p in prompts.items():
        pool.insert(p, name)
    while pool.active:
        harvest(pool, results)
    for name, p in prompts.items():
        assert results[name] == solo(llm, p), name


def test_spec_pool_eos_suffix_filled():
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(2))
    probe = StubLLM(cfg, params, buckets=(4,), max_new=5)
    free_run = solo(probe, [3, 1, 4])
    eos = free_run[1]
    llm = StubLLM(cfg, params, buckets=(4,), max_new=5, eos_ids=(eos,),
                  spec_tokens=3)
    pool = DecodePool(llm, pool_size=1, chunk_steps=8)
    results = {}
    pool.insert([3, 1, 4], "x")
    while pool.active:
        harvest(pool, results)
    assert results["x"] == solo(llm, [3, 1, 4])
    assert results["x"] == free_run[:2] + [eos] * 3


# --- per-bucket slot tiers -------------------------------------------------


def test_tiered_pool_routing_and_parity():
    """Short prompts land in the small tier, long ones in the large tier,
    overflow goes upward when the small tier is full — and every row still
    equals its solo run."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(6))
    llm = StubLLM(cfg, params, buckets=(4, 8), max_new=4)
    pool = DecodePool(llm, chunk_steps=2, tiers=[(4, 1), (8, 2)])
    assert pool.pool_size == 3

    results = {}
    s1 = pool.insert([5, 3], "short1")  # -> tier 0 (bucket 4)
    s2 = pool.insert([1, 2, 3, 4, 5, 6], "long")  # -> tier 1 (bucket 8)
    s3 = pool.insert([7, 2], "short2")  # tier 0 full -> overflows to tier 1
    assert s1 == 0 and s2 in (1, 2) and s3 in (1, 2) and s2 != s3
    assert not pool.can_admit([9] * 3) and not pool.can_admit([9] * 7)
    while pool.active:
        harvest(pool, results)
    assert results["short1"] == solo(llm, [5, 3])
    assert results["long"] == solo(llm, [1, 2, 3, 4, 5, 6])
    assert results["short2"] == solo(llm, [7, 2])
    # slots freed: everything admissible again
    assert pool.can_admit([9] * 7) and len(pool.free) == 3


def test_tiered_pool_rejects_unknown_bucket():
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(6))
    llm = StubLLM(cfg, params, buckets=(4, 8), max_new=4)
    with pytest.raises(ValueError, match="not prompt buckets"):
        DecodePool(llm, tiers=[(5, 2)])


def test_tiered_pool_kv_state_is_tier_sized():
    """The r3 OOM fix under test: small-tier slots must NOT reserve
    largest-bucket KV."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(6))
    llm = StubLLM(cfg, params, buckets=(4, 8), max_new=4)
    pool = DecodePool(llm, tiers=[(4, 2), (8, 1)])
    assert pool.tiers[0].state["kv_mask"].shape == (2, 8)
    assert pool.tiers[1].state["kv_mask"].shape == (1, 12)


def test_tiered_spec_warmup_and_async_driver():
    """Tiers + speculation together under the async driver: more requests
    than slots, long prompts wait for a fitting slot instead of failing,
    all resolve to solo-run text."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(4))
    llm = StubLLM(cfg, params, buckets=(4, 8), max_new=4, spec_tokens=2)
    wrapper = ContinuousBatchingLocalLLM(
        llm, chunk_steps=2, tiers=[(4, 1), (8, 1)]
    )
    wrapper.warmup()
    assert not wrapper.pool.active and len(wrapper.pool.free) == 2

    prompts = ["ab", "cdef", "g", "hijk", "lm"]

    async def drive():
        async def staggered(i, p):
            await asyncio.sleep(0.002 * i)
            return await wrapper.acomplete(p)

        return await asyncio.gather(
            *(staggered(i, p) for i, p in enumerate(prompts))
        )

    outs = asyncio.run(drive())
    for p, resp in zip(prompts, outs):
        toks = solo(llm, llm._encode(p))
        assert resp.text == llm._decode_row(toks), p
