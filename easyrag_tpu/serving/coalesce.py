"""Cross-request reranker coalescing for the full-RAG serve path.

The reranker is the pipeline's dominant stage (SURVEY §3 hot loop #1 —
``src/easyrag/custom/rerankers.py:307-345`` batches one query's pairs at
``embed_bs``). Under concurrent serving, each request's tail batch wastes
padded slots; :class:`CoalescingScorer` shares dispatches ACROSS requests:
requests enqueue their (query, passage) pairs, a dispatcher thread drains
the queue every ``window_ms`` and packs pairs from different requests into
full ``max_batch``-sized device batches.

Semantics preserved:

* judge batches (the early-exit protocol) pass through un-coalesced — the
  exit criterion softmaxes over the batch, so foreign pairs would perturb it
  (``efficient_modeling_minicpm_reranker.py:1259-1276``);
* ``cutoff_layer`` is a per-thread view — each request's discovered exit
  layer applies only to its own remaining pairs, and dispatches are grouped
  by cutoff (different depths are different compiled programs anyway);
* tail chunks are padded by duplicating the last pair (scores sliced
  off) — to a halving bucket (``rerankers.tail_bucket``) once that
  bucket's program is warm, and to the always-warm ``max_batch`` shape
  before then; cold bucket shapes compile off the latency path, in
  queue-idle time on the dispatcher thread.

The pipeline runs its rerank stage in a worker thread when
``pipeline.rerank_in_thread`` is set (the serving layer sets it), so
concurrent requests overlap in this stage and their pairs actually meet in
the queue.
"""

from __future__ import annotations

import collections
import threading
import time
from typing import Any, Dict, List, Optional, Tuple

from ..rerankers import tail_bucket


class _Request:
    __slots__ = ("pairs", "cutoff", "event", "scores", "layer", "error")

    def __init__(self, pairs, cutoff):
        self.pairs = pairs
        self.cutoff = cutoff
        self.event = threading.Event()
        self.scores: Optional[Any] = None
        self.layer: Optional[int] = None
        self.error: Optional[BaseException] = None


class CoalescingScorer:
    """Thread-safe proxy over a pair scorer that fuses non-judge scoring
    work from concurrent threads into shared device dispatches."""

    #: LLMRerank checks this to hand over whole pair lists instead of
    #: pre-chunking (pre-chunked+padded batches could not be fused).
    coalesce = True

    def __init__(self, scorer, max_batch: int = 32, window_ms: float = 4.0) -> None:
        self.scorer = scorer
        self.max_batch = max_batch
        self.window = window_ms / 1000.0
        self._tls = threading.local()
        self._device_lock = threading.Lock()  # serializes real-scorer calls
        self._cond = threading.Condition()
        self._queue: List[_Request] = []
        self._thread: Optional[threading.Thread] = None
        self._closed = False
        # telemetry: batch sizes of recent real dispatches (tests +
        # observability); bounded so a long-running server doesn't leak
        self.dispatch_sizes: collections.deque = collections.deque(maxlen=4096)
        # tail-bucket shapes ((bsz, seq, cutoff)) whose compiled program is
        # known warm, plus warms deferred to queue-idle time — a new XLA
        # compile must never land on a request's latency path
        self._warm_shapes: set = set()
        self._pending_warms: List[Tuple[tuple, List[Tuple[str, str]]]] = []

    # -- per-thread cutoff view ------------------------------------------------

    @property
    def cutoff_layer(self) -> int:
        return getattr(self._tls, "cutoff", self.scorer.cutoff_layer)

    @cutoff_layer.setter
    def cutoff_layer(self, value: int) -> None:
        self._tls.cutoff = value

    # -- scoring ----------------------------------------------------------------

    def score_pairs(
        self, pairs: List[Tuple[str, str]], judge: bool = False
    ) -> Tuple[Any, int]:
        if judge:
            # early-exit protocol: batch composition is semantic, no fusing
            with self._device_lock:
                saved = self.scorer.cutoff_layer
                self.scorer.cutoff_layer = self.cutoff_layer
                try:
                    scores, layer = self.scorer.score_pairs(pairs, judge=True)
                finally:
                    self.scorer.cutoff_layer = saved
                self.dispatch_sizes.append(len(pairs))
            return scores, layer
        req = _Request(list(pairs), self.cutoff_layer)
        with self._cond:
            if self._closed:
                raise RuntimeError("CoalescingScorer is closed")
            self._queue.append(req)
            if self._thread is None or not self._thread.is_alive():
                self._thread = threading.Thread(
                    target=self._dispatch_loop, name="rerank-coalescer", daemon=True
                )
                self._thread.start()
            self._cond.notify()
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.scores, req.layer

    def close(self) -> None:
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        if self._thread is not None:
            self._thread.join(timeout=5)

    # -- dispatcher --------------------------------------------------------------

    def _dispatch_loop(self) -> None:
        while True:
            with self._cond:
                while not self._queue and not self._closed:
                    self._cond.wait()
                if self._closed and not self._queue:
                    return
            # collection window: let concurrent requests reach the queue
            time.sleep(self.window)
            with self._cond:
                batch, self._queue = self._queue, []
            if batch:
                self._run_batch(batch)
            self._drain_warms()

    def _run_batch(self, batch: List[_Request]) -> None:
        import numpy as np

        # group by cutoff: different depths are different compiled programs
        groups: Dict[int, List[_Request]] = {}
        for req in batch:
            groups.setdefault(req.cutoff, []).append(req)
        try:
            for cutoff, reqs in groups.items():
                flat: List[Tuple[str, str]] = []
                spans: List[Tuple[_Request, int, int]] = []
                for req in reqs:
                    spans.append((req, len(flat), len(flat) + len(req.pairs)))
                    flat.extend(req.pairs)
                all_scores: List[float] = []
                with self._device_lock:
                    saved = self.scorer.cutoff_layer
                    self.scorer.cutoff_layer = cutoff
                    try:
                        for lo in range(0, len(flat), self.max_batch):
                            chunk = flat[lo : lo + self.max_batch]
                            n_real = len(chunk)
                            if n_real < self.max_batch:
                                # tail pads to a halving bucket, not the
                                # full batch (rerankers.tail_bucket) — but
                                # only into a shape whose program is warm.
                                # A cold bucket shape dispatches at the
                                # always-warm full batch instead and is
                                # compiled later, off the latency path
                                # (_drain_warms): an XLA compile is seconds
                                # on TPU and would land inside a waiting
                                # request otherwise.
                                bucket = tail_bucket(n_real, self.max_batch)
                                padded = chunk + [chunk[-1]] * (bucket - n_real)
                                key = self._shape_key(padded, cutoff)
                                if key is None or key in self._warm_shapes:
                                    chunk = padded
                                else:
                                    chunk = chunk + [chunk[-1]] * (
                                        self.max_batch - n_real
                                    )
                                    self._pending_warms.append((key, padded))
                            scores, _ = self.scorer.score_pairs(chunk, judge=False)
                            all_scores.extend(np.asarray(scores)[:n_real])
                            self.dispatch_sizes.append(n_real)
                    finally:
                        self.scorer.cutoff_layer = saved
                for req, lo, hi in spans:
                    req.scores = np.asarray(all_scores[lo:hi], dtype=np.float32)
                    req.layer = cutoff
                    req.event.set()
        except BaseException as e:  # noqa: BLE001 — fail every waiter cleanly
            for req in batch:
                if not req.event.is_set():
                    req.error = e
                    req.event.set()

    def _shape_key(self, padded_chunk, cutoff: int):
        """Compiled-program signature for a padded chunk: (bsz, seq, cutoff).

        Uses the scorer's own tokenization so the key matches what XLA will
        actually see (seq depends on the scorer's compile buckets). Scorers
        without ``build_inputs`` (tests, non-model scorers) return None —
        treated as always-warm, i.e. bucketing applies unconditionally.
        """
        build = getattr(self.scorer, "build_inputs", None)
        if build is None:
            return None
        ids, _ = build(padded_chunk)
        return (ids.shape[0], ids.shape[1], cutoff)

    def _drain_warms(self) -> None:
        """Compile deferred tail-bucket shapes while no request is waiting.

        Runs on the dispatcher thread between windows; re-checks queue
        emptiness before each warm so arriving requests preempt it. A warm
        is one real (dummy-content) dispatch at the bucket shape; failures
        drop the warm rather than poisoning serving.
        """
        while self._pending_warms:
            with self._cond:
                if self._queue or self._closed:
                    return
            key, padded = self._pending_warms.pop(0)
            if key in self._warm_shapes:
                continue
            try:
                with self._device_lock:
                    saved = self.scorer.cutoff_layer
                    self.scorer.cutoff_layer = key[2]
                    try:
                        self.scorer.score_pairs(padded, judge=False)
                    finally:
                        self.scorer.cutoff_layer = saved
                self._warm_shapes.add(key)
            except BaseException:  # noqa: BLE001 — warms are best-effort
                return
