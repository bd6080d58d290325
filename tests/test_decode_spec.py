"""Prompt-lookup speculative decoding vs the plain KV-cache greedy decoder.

Greedy acceptance is exact by construction — a drafted token is emitted only
when it equals the model's own argmax at that position — so
``generate_greedy_spec`` must produce BIT-IDENTICAL token sequences to
``generate_greedy`` for every config family, batch layout, EOS placement,
and padding. The draft source (the sequence's own earlier n-gram
continuations) only affects speed, never output; these tests pin that
contract. Reference semantics being accelerated: HF ``generate(top_k=1)``
(``/root/reference/src/easyrag/utils/llm_utils.py:58-73``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyrag_tpu.models.decode import (
    _ngram_draft,
    generate_greedy,
    generate_greedy_spec,
)
from easyrag_tpu.models.layers import init_params

from test_decode import VOCAB, tiny_cfg


def run_both(cfg, params, prompts, max_new, eos, bucket, **spec_kw):
    rows, masks = [], []
    for p in prompts:
        pad = bucket - len(p)
        rows.append([0] * pad + list(p))
        masks.append([0] * pad + [1] * len(p))
    ids = jnp.asarray(rows, jnp.int32)
    mask = jnp.asarray(masks, jnp.int32)
    eos_a = jnp.asarray(eos, jnp.int32)
    want = generate_greedy(cfg, params, ids, mask, eos_a, max_new)
    got = generate_greedy_spec(cfg, params, ids, mask, eos_a, max_new, **spec_kw)
    return np.asarray(got), np.asarray(want)


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"num_key_value_heads": 2},  # GQA
        {"scale_emb": 12.0, "scale_depth": 1.4, "dim_model_base": 256.0},  # minicpm
        {"gemma": True, "attn_logit_softcapping": 50.0, "query_pre_attn_scalar": 8.0},
    ],
)
def test_spec_matches_plain_greedy(kw):
    cfg = tiny_cfg(**kw)
    params = init_params(cfg, jax.random.key(0))
    got, want = run_both(
        cfg, params, [[3, 1, 4, 1, 5, 9, 2]], 12, [VOCAB - 1], bucket=8
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("draft_len", [1, 3, 7])
def test_spec_matches_across_seeds_and_draft_lens(seed, draft_len):
    """Random tiny models routinely fall into greedy cycles — exactly the
    regime where drafts get ACCEPTED — so sweeping seeds exercises both the
    full-accept and full-reject paths of the verify block."""
    cfg = tiny_cfg(num_key_value_heads=2)
    params = init_params(cfg, jax.random.key(seed))
    prompt = [(seed * 7 + j * 3) % (VOCAB - 2) + 1 for j in range(9)]
    got, want = run_both(
        cfg, params, [prompt], 16, [VOCAB - 1], bucket=16, draft_len=draft_len
    )
    np.testing.assert_array_equal(got, want)


def test_spec_batch_rows_diverge_independently():
    """Rows accept different draft counts, so per-row progress (cache slots,
    rope positions, output offsets) must not leak across rows; also covers
    mixed prompt lengths under one bucket."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(2))
    prompts = [[5, 3, 8], [11, 4, 6, 2, 9, 1], [7, 7, 7, 7], [2, 13]]
    got, want = run_both(cfg, params, prompts, 10, [VOCAB - 1], bucket=8)
    np.testing.assert_array_equal(got, want)


def test_spec_eos_mid_block():
    """An EOS landing in the middle of an accepted block must truncate the
    emission at the EOS (kept in place) and fill the tail with EOS."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(3))
    prompt = [2, 4, 6]
    free = np.asarray(
        generate_greedy(
            cfg, params,
            jnp.asarray([prompt], jnp.int32),
            jnp.ones((1, 3), jnp.int32),
            jnp.asarray([-1], jnp.int32), 8,
        )
    )[0]
    eos = [int(free[3])]  # force a stop at the 4th emitted token
    got, want = run_both(cfg, params, [prompt], 8, eos, bucket=4)
    np.testing.assert_array_equal(got, want)
    assert list(got[0][4:]) == [eos[0]] * 4


def test_spec_left_padding_invariance():
    cfg = tiny_cfg(num_key_value_heads=2)
    params = init_params(cfg, jax.random.key(4))
    prompt = [7, 7, 2, 9, 12]
    tight, _ = run_both(cfg, params, [prompt], 9, [VOCAB - 1], bucket=5)
    padded, _ = run_both(cfg, params, [prompt], 9, [VOCAB - 1], bucket=24)
    np.testing.assert_array_equal(tight, padded)


def test_spec_limit_and_active():
    """``limit`` (the warmup trick) and ``active`` (batch-padding rows) keep
    generate_greedy's semantics: limit bounds emitted tokens without
    changing the compiled shape; inactive rows emit EOS only."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(5))
    ids = jnp.asarray([[3, 1, 4, 1, 5], [9, 2, 6, 5, 3]], jnp.int32)
    mask = jnp.ones_like(ids)
    eos = jnp.asarray([VOCAB - 1], jnp.int32)
    full = generate_greedy_spec(cfg, params, ids, mask, eos, 8)
    lim = generate_greedy_spec(
        cfg, params, ids, mask, eos, 8, limit=jnp.int32(3)
    )
    np.testing.assert_array_equal(np.asarray(lim)[:, :3], np.asarray(full)[:, :3])
    assert (np.asarray(lim)[:, 3:] == VOCAB - 1).all()
    act = generate_greedy_spec(
        cfg, params, ids, mask, eos, 8, active=jnp.asarray([True, False])
    )
    np.testing.assert_array_equal(np.asarray(act)[0], np.asarray(full)[0])
    assert (np.asarray(act)[1] == VOCAB - 1).all()


def test_ngram_draft_copies_continuation():
    """The drafter must return the tokens that FOLLOWED the most recent
    earlier occurrence of the trailing n-gram (the prompt-lookup contract),
    searching prompt and generated regions alike, and never match through
    the left-padding."""
    #        pad pad [ 5  6  7  8  9 | 5  6 ]  (s=7, two emitted)
    buf = jnp.asarray([[0, 0, 5, 6, 7, 8, 9, 5, 6, 0, 0, 0]], jnp.int32)
    start = jnp.asarray([2], jnp.int32)  # s - prompt_len = 7 - 5
    end = jnp.asarray([9], jnp.int32)  # s + n = 7 + 2
    draft = _ngram_draft(buf, start, end, ngram=2, draft_len=3)
    assert list(np.asarray(draft)[0]) == [7, 8, 9]

    # trailing n-gram [0, 5]: a pad-region "0" must NOT produce the match
    # window [pad, 5] -> draft [6, 7, 8]; with no valid match the draft is
    # arbitrary but the function must not crash (clamped gathers)
    buf2 = jnp.asarray([[0, 0, 5, 6, 7, 8, 9, 0, 5, 0, 0, 0]], jnp.int32)
    _ = _ngram_draft(buf2, start, jnp.asarray([10], jnp.int32), 2, 3)


def test_spec_accepts_on_cyclic_continuation():
    """End-to-end acceptance check without real weights: when the greedy
    continuation is eventually periodic (a cycle the sequence has already
    traversed), prompt-lookup drafts are correct and MUST be accepted —
    pinned by forcing the no-match fallback to be wrong: if the verify
    block mistakenly accepted garbage drafts the outputs would diverge."""
    found = False
    for seed in range(24):
        cfg = tiny_cfg()
        params = init_params(cfg, jax.random.key(100 + seed))
        ids = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
        mask = jnp.ones_like(ids)
        eos = jnp.asarray([-1], jnp.int32)  # never stops
        toks = list(np.asarray(generate_greedy(cfg, params, ids, mask, eos, 24))[0])
        # detect a period-p suffix cycle
        tail = toks[8:]
        for p in range(1, 6):
            if all(tail[i] == tail[i % p] for i in range(len(tail))):
                got = np.asarray(
                    generate_greedy_spec(cfg, params, ids, mask, eos, 24)
                )[0]
                np.testing.assert_array_equal(got, np.asarray(toks))
                found = True
                break
        if found:
            break
    assert found, "no cyclic greedy continuation among 24 seeds (expected common)"
