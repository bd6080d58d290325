"""Two-stage cascade rerank (``use_efficient=3`` — TPU-native extension,
no reference counterpart; see ``rerankers.py`` module docstring).

Contract under test: stage 1 scores EVERY pair at the judge layer in
tail-bucketed batches, stage 2 re-scores only the top ``cascade_keep`` at
full depth; final order is survivors by full-depth score, the rest below
them in stage-1 order; works identically through the serving coalescer.
"""

import threading

import numpy as np

from easyrag_tpu.rerankers import LLMRerank
from easyrag_tpu.schema import NodeWithScore, QueryBundle, TextNode


class LayerScorer:
    """Deterministic layer-dependent scorer: at the judge layer pairs rank
    by passage length; at full depth the ranking FLIPS within the
    survivors (so the test can see stage 2 actually decide the order)."""

    def __init__(self, judge_layer=12, full=28):
        self.cutoff_layer = full
        self.full = full
        self.efficient_layers = (judge_layer,)
        self.calls = []  # (n_pairs, cutoff)
        self._lock = threading.Lock()

    def score_pairs(self, pairs, judge=False):
        assert not judge, "cascade must never run the judge protocol"
        with self._lock:
            self.calls.append((len(pairs), self.cutoff_layer))
        if self.cutoff_layer == self.full:
            scores = [-len(p) for _, p in pairs]  # full depth: short wins
        else:
            scores = [float(len(p)) for _, p in pairs]  # judge: long wins
        return np.asarray(scores, np.float32), self.cutoff_layer


def _nodes(n):
    # passage lengths 1..n -> judge-layer rank = descending length
    return [
        NodeWithScore(node=TextNode(text="x" * (i + 1), metadata={}), score=0.5)
        for i in range(n)
    ]


def test_cascade_dispatch_and_ordering():
    scorer = LayerScorer()
    rr = LLMRerank(scorer, top_n=3, embed_bs=8, embed_type=0,
                   use_efficient=3, cascade_keep=8)
    out = rr.postprocess_nodes(_nodes(20), QueryBundle(query_str="q"))

    # stage 1: 20 pairs at judge cutoff 12 in batches 8+8+8(tail 4 pads to
    # the halving bucket >= TAIL_BUCKET_MIN); stage 2: 8 survivors at 28
    assert scorer.calls == [(8, 12), (8, 12), (8, 12), (8, 28)], scorer.calls
    # survivors = longest 8 passages (judge rank); full depth flips them:
    # top_n comes from the SHORTEST of the survivors
    lens = [len(n.node.text) for n in out]
    assert lens == [13, 14, 15]
    # cutoff restored for the next query
    assert scorer.cutoff_layer == 28


def test_cascade_non_survivors_rank_below_all_survivors():
    scorer = LayerScorer()
    rr = LLMRerank(scorer, top_n=5, embed_bs=8, use_efficient=3,
                   cascade_keep=8)
    nodes = _nodes(20)
    scores = rr._score_cascade(nodes, "q")
    # survivors = judge-layer top 8 (lengths 13..20, node indices 12..19)
    surv, rest = scores[12:], scores[:12]
    assert surv.min() > rest.max()  # top_n can never reach past the cascade
    # non-survivors keep their stage-1 (length-descending) relative order
    assert list(np.argsort(-rest)) == list(range(11, -1, -1))
    out = rr.postprocess_nodes(nodes, QueryBundle(query_str="q"))
    # full depth flips the survivors: shortest survivor wins
    assert [len(n.node.text) for n in out] == [13, 14, 15, 16, 17]
    # retrieval score preserved
    assert all(n.node.metadata["retrieval_score"] == 0.5 for n in out)


def test_cascade_top_n_above_keep_rescore_everything():
    scorer = LayerScorer()
    rr = LLMRerank(scorer, top_n=20, embed_bs=8, use_efficient=3,
                   cascade_keep=8)
    out = rr.postprocess_nodes(_nodes(20), QueryBundle(query_str="q"))
    # keep clamps UP to top_n: all 20 re-scored at full depth, so the
    # final order is pure full-depth (ascending length)
    assert [len(n.node.text) for n in out] == list(range(1, 21))
    assert scorer.calls == [(8, 12)] * 3 + [(8, 28)] * 3, scorer.calls


def test_cascade_keep_clamps_to_n():
    scorer = LayerScorer()
    rr = LLMRerank(scorer, top_n=6, embed_bs=8, use_efficient=3,
                   cascade_keep=2)  # below top_n -> clamped up to 6
    rr.postprocess_nodes(_nodes(4), QueryBundle(query_str="q"))
    # 4 pairs total (< clamped keep): both stages run all 4, padded to the
    # minimum tail bucket (8)
    assert scorer.calls == [(8, 12), (8, 28)], scorer.calls


def test_cascade_through_coalescer_matches_plain():
    from easyrag_tpu.serving.coalesce import CoalescingScorer

    plain = LLMRerank(LayerScorer(), top_n=5, embed_bs=8,
                      use_efficient=3, cascade_keep=8)
    ref = [len(n.node.text) for n in
           plain.postprocess_nodes(_nodes(20), QueryBundle(query_str="q"))]

    scorer = LayerScorer()
    proxy = CoalescingScorer(scorer, max_batch=8, window_ms=5)
    rr = LLMRerank(proxy, top_n=5, embed_bs=8, use_efficient=3,
                   cascade_keep=8)
    out = rr.postprocess_nodes(_nodes(20), QueryBundle(query_str="q"))
    proxy.close()
    assert [len(n.node.text) for n in out] == ref
    # both stages went through the fused dispatcher at each stage's cutoff
    assert {c for _, c in scorer.calls} == {12, 28}


def test_cutoff_restored_when_a_batch_raises():
    """A scorer failure mid-protocol must not leak the stage/exit cutoff
    into the next query (postprocess_nodes try/finally)."""
    import pytest

    class Boom(LayerScorer):
        def score_pairs(self, pairs, judge=False):
            if self.cutoff_layer != self.full:
                raise RuntimeError("device fell over")
            return super().score_pairs(pairs, judge)

    scorer = Boom()
    rr = LLMRerank(scorer, top_n=3, embed_bs=8, use_efficient=3,
                   cascade_keep=8)
    with pytest.raises(RuntimeError):
        rr.postprocess_nodes(_nodes(20), QueryBundle(query_str="q"))
    assert scorer.cutoff_layer == 28  # restored despite the exception


# -- carry variant (tpu.cascade_carry) ---------------------------------------


def _real_scorer(padding_side=None):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_models import _scorer

    s = _scorer(use_efficient=3)
    if padding_side:
        s.padding_side = padding_side
    return s


def _run_cascade(carry, padding_side=None, n=11, bs=4, keep=4, seq_bucket=None):
    scorer = _real_scorer(padding_side)
    if seq_bucket:
        scorer.seq_bucket = seq_bucket
    rr = LLMRerank(
        scorer, top_n=2, embed_bs=bs, use_efficient=3,
        cascade_keep=keep, cascade_carry=carry,
    )
    # varied passage lengths force different per-chunk seq buckets
    nodes = [
        NodeWithScore(
            node=TextNode(text="doc " + "x y z " * (3 + 7 * (i % 3)) + str(i),
                          metadata={}),
            score=0.5,
        )
        for i in range(n)
    ]
    out = rr.postprocess_nodes(nodes, QueryBundle(query_str="q u e r y"))
    return [nd.node.text for nd in out], [nd.score for nd in out]


def test_cascade_carry_matches_rescore_path():
    """The carried stage 2 (resume from layer-j hidden) must reproduce the
    re-run-from-0 cascade: same output order, scores equal to float
    tolerance (f32 on CPU — the layer math is row-independent)."""
    texts_a, scores_a = _run_cascade(carry=False)
    texts_b, scores_b = _run_cascade(carry=True)
    assert texts_a == texts_b
    np.testing.assert_allclose(scores_a, scores_b, rtol=1e-4, atol=1e-5)


def test_cascade_carry_right_padding():
    texts_a, scores_a = _run_cascade(carry=False, padding_side="right")
    texts_b, scores_b = _run_cascade(carry=True, padding_side="right")
    assert texts_a == texts_b
    np.testing.assert_allclose(scores_a, scores_b, rtol=1e-4, atol=1e-5)


def test_cascade_carry_mixed_seq_buckets():
    """Survivors spanning chunks with DIFFERENT seq buckets re-pad into one
    stage-2 batch (the gather + re-pad path)."""
    texts_a, scores_a = _run_cascade(carry=False, seq_bucket=8, n=13, keep=6)
    texts_b, scores_b = _run_cascade(carry=True, seq_bucket=8, n=13, keep=6)
    assert texts_a == texts_b
    np.testing.assert_allclose(scores_a, scores_b, rtol=1e-4, atol=1e-5)


def test_cascade_carry_falls_back_for_incapable_scorers():
    """A scorer without score_pairs_carry (e.g. the fake LayerScorer, or
    yes-logit) silently uses the re-score path."""
    scorer = LayerScorer()
    rr = LLMRerank(scorer, top_n=2, embed_bs=4, use_efficient=3,
                   cascade_keep=4, cascade_carry=True)
    out = rr.postprocess_nodes(_nodes(9), QueryBundle(query_str="q"))
    assert len(out) == 2
    # both stages ran through score_pairs
    cutoffs = {c for _, c in scorer.calls}
    assert cutoffs == {12, 28}
