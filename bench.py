"""Benchmark: sparse (BM25) retrieval query throughput, TPU vs the
reference's CPU scoring path.

The reference scores every query over the full corpus in Python/numpy
(rank_bm25 at ``src/easyrag/custom/retrievers.py:113-151``: per query term,
a Python loop builds the term-frequency vector from per-doc dicts, then
numpy math + full argsort). The baseline below reproduces that cost model
faithfully (same data structures, same per-term O(N) dict walk, same
argsort). Ours is the device-resident index (``ops/bm25_resident.py``):
postings live in HBM, queries ship only term ids + counts, and the whole
query stream is scored in ONE compiled dispatch (64-query batches scanned
on device), with a 4-byte checksum readback as the completion barrier.

Both sides consume identical pre-tokenized queries (jieba cost is common
and excluded from both). Corpus is synthetic but statistically shaped like
the zedx chunk corpus (~20k chunks, Zipfian vocabulary, ~300 tokens/chunk).

Output contract (r5, VERDICT r4 #1): a CUMULATIVE JSON result line is
printed after EVERY completed stage — the driver parses the LAST JSON line
of the tail, so a wall-clock kill loses only the unfinished stages instead
of the whole record (r4's single-print design produced ``parsed: null``
when one cold compile overran). Stages run cheapest/warmest-first under a
global deadline (``EASYRAG_BENCH_DEADLINE_S``, default 1500 s — the r4
driver run was killed ~30 min in, so the budget is treated as 1800 s);
subprocess stages get deadline-aware budgets and their partial output is
salvaged on timeout.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BENCH_DEADLINE_S = float(os.environ.get("EASYRAG_BENCH_DEADLINE_S", "1500"))

N_DOCS = 20_000
VOCAB = 40_000
DOC_LEN_MEAN = 300
N_QUERIES = 4096  # large enough that the ~30ms tunnel round trip amortizes
QUERY_TERMS = 12
BATCH = 64
TOPK = 192
BASELINE_QUERIES = 64  # the python path is slow; extrapolate from fewer
BASELINE_PASSES = 3  # best-of-N: machine-load noise must not inflate our ratio


def make_corpus(rng):
    # Zipfian token distribution: a realistic postings skew. One vectorized
    # draw for all tokens (a per-doc rng.choice loop costs ~a minute).
    zipf = 1.0 / np.arange(1, VOCAB + 1)
    zipf /= zipf.sum()
    lengths = rng.poisson(DOC_LEN_MEAN, size=N_DOCS).clip(30)
    bounds = np.concatenate([[0], np.cumsum(lengths)])
    flat = rng.choice(VOCAB, size=int(bounds[-1]), p=zipf)
    names = np.array([f"t{t}" for t in range(VOCAB)])
    flat_names = names[flat]
    return [
        flat_names[bounds[i] : bounds[i + 1]].tolist() for i in range(N_DOCS)
    ]


def make_queries(rng, corpus):
    # real queries pass jieba + HIT-stopword removal, which strips the
    # highest-frequency function words; emulate by excluding the Zipf head
    stop = {f"t{t}" for t in range(32)}
    queries = []
    for _ in range(N_QUERIES):
        doc = [t for t in corpus[rng.integers(0, len(corpus))] if t not in stop]
        take = rng.choice(len(doc), size=min(QUERY_TERMS, len(doc)), replace=False)
        queries.append([doc[i] for i in take])
    return queries


class ReferenceBM25:
    """rank_bm25.BM25Okapi cost model: per-doc term-frequency dicts, per-term
    O(N) python walk, full argsort ranking."""

    def __init__(self, corpus, k1=1.5, b=0.75, epsilon=0.25):
        self.k1, self.b = k1, b
        self.corpus_size = len(corpus)
        self.doc_freqs = []
        nd = {}
        self.doc_len = []
        total = 0
        for doc in corpus:
            self.doc_len.append(len(doc))
            total += len(doc)
            freqs = {}
            for tok in doc:
                freqs[tok] = freqs.get(tok, 0) + 1
            self.doc_freqs.append(freqs)
            for tok in freqs:
                nd[tok] = nd.get(tok, 0) + 1
        self.avgdl = total / self.corpus_size
        idf_sum, negative = 0.0, []
        self.idf = {}
        for tok, df in nd.items():
            idf = np.log(self.corpus_size - df + 0.5) - np.log(df + 0.5)
            self.idf[tok] = idf
            idf_sum += idf
            if idf < 0:
                negative.append(tok)
        avg_idf = idf_sum / len(self.idf)
        for tok in negative:
            self.idf[tok] = epsilon * avg_idf
        self.doc_len = np.array(self.doc_len)

    def get_scores(self, query):
        score = np.zeros(self.corpus_size)
        for q in query:
            q_freq = np.array([doc.get(q) or 0 for doc in self.doc_freqs])
            score += (self.idf.get(q) or 0) * (
                q_freq * (self.k1 + 1)
                / (q_freq + self.k1 * (1 - self.b + self.b * self.doc_len / self.avgdl))
            )
        return score

    def query_topk(self, query, k):
        scores = self.get_scores(query)
        return scores.argsort()[::-1][:k]


def bench_sparse(rng, corpus, queries) -> tuple:
    """Headline metric: device-resident BM25 stream vs the reference CPU
    cost model. Returns (ours_qps, vs_baseline)."""
    import sys

    from easyrag_tpu.index.sparse import build_sparse_index
    from easyrag_tpu.ops.bm25_resident import ResidentSparseIndex

    def note(msg):
        # stderr progress markers: a hang inside this stage must be
        # attributable from the driver log (r5: a cold stream-graph compile
        # stalled silently for tens of minutes)
        print(f"[sparse] {msg}", file=sys.stderr, flush=True)

    # ---- baseline: reference CPU path (best of N passes over a widened
    # sample: machine-load noise must not inflate our ratio) ----
    note("cpu baseline...")
    ref = ReferenceBM25(corpus)
    best = float("inf")
    for _ in range(BASELINE_PASSES):
        t0 = time.perf_counter()
        for q in queries[:BASELINE_QUERIES]:
            ref.query_topk(q, TOPK)
        best = min(best, time.perf_counter() - t0)
    baseline_qps = BASELINE_QUERIES / best

    # ---- ours: device-resident index (HBM postings; queries ship only
    # term ids + counts, a few KB per batch) ----
    note(f"cpu baseline {baseline_qps:.0f} qps; building device index...")
    index = build_sparse_index(corpus, bm25_type=0)
    # retrieval-only deployment owns the chip's HBM: a 1 GB heavy budget
    # lets the auto light_cap land on the measured optimum (64 at this
    # corpus — the 512 MB default is the co-resident-with-models policy)
    resident = ResidentSparseIndex(
        index, max_query_terms=16, heavy_hbm_budget=1 << 30
    )

    def run_all():
        """Score the whole stream in ONE dispatch (batches lax.scan-ed on
        device), then force completion with a 4-byte scalar readback that
        depends on all outputs. NOTE: on this remote-attached backend
        ``block_until_ready`` does NOT synchronize (measured) and bulk
        downloads crawl, so a chained checksum is the only honest sync.
        """
        _, _, checksum, done = resident.stream_score_topk_device(
            queries, TOPK, batch=BATCH
        )
        int(checksum)  # device->host scalar: full pipeline barrier
        return done

    note("index resident; compiling + warming the stream graph...")
    run_all()  # warmup/compile
    note("warm; timing...")
    best = float("inf")
    for _ in range(2):  # best-of-2: the tunnel round trip is noisy
        t0 = time.perf_counter()
        done = run_all()
        best = min(best, time.perf_counter() - t0)
    ours_qps = done / best
    return ours_qps, ours_qps / baseline_qps


def main() -> None:
    """Stage runner: run every metric cheapest/warmest-first under the
    global deadline, printing the CUMULATIVE result line after each stage
    (the driver keeps the last line it can parse — see module docstring)."""
    from easyrag_tpu.utils.compile_cache import enable_compile_cache

    # persistent executable cache (verified to round-trip through the axon
    # remote-compile tunnel): the driver's bench run loads the big-graph
    # executables this session already compiled instead of re-paying
    # minutes-per-graph; subprocess tools enable it themselves
    enable_compile_cache()

    t_start = time.monotonic()
    deadline = t_start + BENCH_DEADLINE_S

    def remaining() -> float:
        return deadline - time.monotonic()

    result = {
        "metric": "sparse_bm25_query_throughput_20k_docs_top192",
        "value": 0.0,
        "unit": "queries/s",
        "vs_baseline": 0.0,
        "extra": {"bench_deadline_s": BENCH_DEADLINE_S, "stages": {}},
    }
    extra, stages = result["extra"], result["extra"]["stages"]

    def emit(stage: str, status: str) -> None:
        stages[stage] = f"{status} @{time.monotonic() - t_start:.0f}s"
        print(json.dumps(result), flush=True)

    def note(stage: str) -> None:
        import sys

        print(f"[bench] {stage} starting @{time.monotonic() - t_start:.0f}s",
              file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    corpus = make_corpus(rng)
    queries = make_queries(rng, corpus)

    # ---- stage 1: sparse (headline; fills value/vs_baseline) -------------
    try:
        note("sparse")
        ours_qps, ratio = bench_sparse(rng, corpus, queries)
        result["value"] = round(ours_qps, 2)
        result["vs_baseline"] = round(ratio, 2)
        emit("sparse", "ok")
    except Exception as e:  # noqa: BLE001
        emit("sparse", f"error: {type(e).__name__}: {e}"[:160])

    # ---- stage 2: dense ---------------------------------------------------
    try:
        note("dense")
        if remaining() < 120:
            raise TimeoutError(f"deadline: {remaining():.0f}s left")
        dense_qps, dense_ratio = bench_dense(rng)
        extra["dense_cosine_qps_20k_docs_3584d_top288"] = round(dense_qps, 2)
        extra["dense_vs_cpu_flat_scan"] = round(dense_ratio, 2)
        emit("dense", "ok")
    except Exception as e:  # noqa: BLE001
        emit("dense", f"error: {type(e).__name__}: {e}"[:160])

    # ---- stage 3: real-query sparse (reference QA text, VERDICT r4 #4) ---
    try:
        note("sparse_real_queries")
        if remaining() < 120:
            raise TimeoutError(f"deadline: {remaining():.0f}s left")
        rq = bench_real_queries()
        if rq:
            extra["sparse_real_zh_queries"] = rq
        emit("sparse_real_queries", "ok" if rq else "skipped: no QA data")
    except Exception as e:  # noqa: BLE001
        emit("sparse_real_queries", f"error: {type(e).__name__}: {e}"[:160])

    # ---- stages 4+5: reranker bf16, then w8a8 (the production config) ----
    for quant in ("", "w8a8"):
        name = "reranker_w8a8" if quant else "reranker_bf16"
        try:
            note(name)
            if remaining() < 240:
                raise TimeoutError(f"deadline: {remaining():.0f}s left")
            rr_ms, rr_mfu = bench_reranker(quant=quant)
            if quant:
                extra["reranker_2b_w8a8_ms"] = round(rr_ms, 1)
            else:
                extra["reranker_2b_batch32x1064_cutoff28_ms"] = round(rr_ms, 1)
                extra["reranker_mfu_pct"] = round(rr_mfu, 1)
            emit(name, "ok")
        except Exception as e:  # noqa: BLE001
            emit(name, f"error: {type(e).__name__}: {e}"[:160])

    # ---- stages 6+7: decode subprocesses (int8 continuity, int4 prod) ----
    for quant in ("int8", "int4"):
        key = "local_llm_decode" if quant == "int8" else "local_llm_decode_int4"
        budget = min(DECODE_BUDGET_S, remaining() - PIPELINE_RESERVE_S)
        if budget < 120:
            extra[key] = {"skipped": f"deadline: {remaining():.0f}s left"}
            emit(f"decode_{quant}", "skipped (deadline)")
            continue
        extra[key] = bench_decode_budgeted(quant, budget)
        emit(f"decode_{quant}", "ok" if "error" not in extra[key] else "error")

    # ---- stage 8: the four-tenant pipeline (most expensive, runs last
    # with everything that's left; its own output is cumulative too, so a
    # kill inside still salvages the completed milestones) ------------------
    budget = remaining() - 15
    if budget < 120:
        extra["pipeline"] = {"skipped": f"deadline: {remaining():.0f}s left"}
        emit("pipeline", "skipped (deadline)")
    else:
        extra["pipeline"] = bench_pipeline_budgeted(budget)
        st = ("skipped" if "skipped" in extra["pipeline"]
              else "partial" if "partial" in extra["pipeline"] else "ok")
        emit("pipeline", st)


def _run_tool(cmd: list, budget_s: float) -> tuple:
    """Run a bench tool subprocess under ``budget_s``, returning
    (stdout_lines, timed_out, returncode). Output goes through temp files
    so a timeout still yields every line the tool flushed — the tools
    print cumulative JSON as they go, which this salvages."""
    import subprocess
    import sys
    import tempfile

    here = os.path.dirname(os.path.abspath(__file__))
    with tempfile.TemporaryFile(mode="w+") as out_f, \
            tempfile.TemporaryFile(mode="w+") as err_f:
        proc = subprocess.Popen(
            [sys.executable, "-u"] + cmd, stdout=out_f, stderr=err_f, cwd=here,
        )
        timed_out = False
        try:
            rc = proc.wait(timeout=max(budget_s, 1))
        except subprocess.TimeoutExpired:
            proc.kill()
            rc = proc.wait()
            timed_out = True
        out_f.seek(0)
        err_f.seek(0)
        lines = out_f.read().strip().splitlines()
        if not any(l.startswith("{") for l in lines):
            lines += err_f.read().strip().splitlines()[-3:]
        return lines, timed_out, rc


DECODE_BUDGET_S = 900
PIPELINE_RESERVE_S = 420  # keep at least this much for the pipeline stage


def bench_decode_budgeted(quant: str, budget_s: float):
    """On-chip generation metric (7B-Instruct-scale KV-cache decode,
    ``models/decode.py``) via ``tools/bench_decode.py`` in a budgeted
    subprocess — same isolation rationale as the pipeline metric.
    ``quant="int4"`` is the r4 production decode config (nibble-packed
    weights + the in-VMEM unpack matvec kernel, the fastest measured
    B=1 step); int8 stays reported for continuity."""
    lines, timed_out, rc = _run_tool(
        ["tools/bench_decode.py", "--quant", quant,
         "--batch", "1", "--prompt", "1024", "--new", "16", "--json",
         "--spec", "7"],
        budget_s,
    )
    # --spec emits a second JSON line (the speculative-decoding rows);
    # merge every JSON line into one record. A stray '{'-prefixed
    # non-JSON line (a dict repr, a JAX warning) must degrade to a
    # skipped line, not abort the whole bench run.
    out = {}
    for line in lines:
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
            except ValueError:
                continue
            if isinstance(parsed, dict):
                out.update(parsed)
    if timed_out:
        out["partial"] = f"killed at budget {budget_s:.0f}s"
    tail = " | ".join(lines[-2:])[-300:] if lines else ""
    return out or {"error": f"no output (exit {rc}): {tail}"}


def bench_pipeline_budgeted(budget_s: float):
    """Whole-system co-resident metric (full ``run(query)`` p50 with the 2B
    reranker + 7B int4 embedder + int4 generator + both indexes on one
    chip — the four-tenant boot, ``configs/four_tenant.yaml``) via
    ``tools/bench_pipeline.py`` in a budgeted subprocess. The tool prints
    a cumulative JSON line after every milestone, so a budget kill yields
    the finished milestones instead of nothing."""
    try:
        lines, timed_out, rc = _run_tool(
            # the named four-tenant preset (VERDICT r4 #5) carries the
            # quant/cascade/generation knobs — w8a8 reranker + w4a8 7B
            # embedder + int4 7B generator + carried cascade keep=32,
            # gen_batch=4, 128 tokens/answer; the flags here are only the
            # bench shape: 3 timed full-route queries, a 256-query
            # retrieval stream, and a 32-query staged batch answer eval
            # (cli.py --batch-answers shape) -> answer_eval_qps
            ["tools/bench_pipeline.py",
             "--preset", "configs/four_tenant.yaml",
             "--queries", "3",
             "--retrieval-queries", "256",
             "--answer-eval", "32",
             # the tool sheds its low-priority tail (exit/cascade/dense
             # route) itself when the budget runs short, so the flagship
             # metrics never get killed mid-measurement
             "--budget", str(int(budget_s))],
            budget_s,
        )
        out = None
        for line in reversed(lines):
            if line.startswith("{"):
                try:
                    out = json.loads(line)
                    break
                except ValueError:
                    continue
        if out is None:
            tail = " | ".join(lines[-2:])[-200:] if lines else ""
            return {"skipped": f"no result line (exit {rc}): {tail}"}
        if timed_out:
            out["partial"] = f"killed at budget {budget_s:.0f}s"
        return out
    except Exception as e:  # noqa: BLE001
        return {"skipped": f"{type(e).__name__}: {e}"[:200]}


def bench_real_queries():
    """Sparse qps with REAL query text (VERDICT r4 #4): the reference's QA
    files (``/root/reference/src/data/question_new.jsonl`` + ``val.json``)
    through jieba + HIT stopwords, scored against a synthetic corpus drawn
    from the REAL question vocabulary distribution — the query-term side of
    the measurement is the actual deployment distribution instead of
    synthetic Zipf tokens. Returns {} when the QA files are absent."""
    from easyrag_tpu.index.sparse import build_sparse_index
    from easyrag_tpu.ops.bm25_resident import ResidentSparseIndex

    qa_texts = _load_reference_questions()
    if not qa_texts:
        return {}

    from easyrag_tpu.corpus.tokenizer import (
        JiebaTokenizer,
        default_stopwords,
        tokenize_and_remove_stopwords,
    )

    tok = JiebaTokenizer()
    stop = default_stopwords()
    tokenized = [tokenize_and_remove_stopwords(tok, t, stop) for t in qa_texts]
    tokenized = [t for t in tokenized if t]
    # real questions carry more distinct terms than the synthetic stream
    # (measured max 19 vs the headline's 16-term cap, which raised in the
    # r5 driver run); size the term slots to the actual distribution
    mqt = max(len(set(t)) for t in tokenized)
    mqt = (mqt + 7) // 8 * 8

    # corpus drawn from the question vocabulary's empirical distribution
    # (plus a synthetic long tail for realistic postings skew), so the real
    # queries actually hit postings of realistic length
    vocab, counts = {}, []
    for toks in tokenized:
        for t in toks:
            if t not in vocab:
                vocab[t] = len(vocab)
                counts.append(0)
            counts[vocab[t]] += 1
    words = list(vocab)
    probs = np.array(counts, np.float64)
    probs /= probs.sum()
    rng = np.random.default_rng(1)
    lengths = rng.poisson(DOC_LEN_MEAN, size=N_DOCS).clip(30)
    bounds = np.concatenate([[0], np.cumsum(lengths)])
    # 70% real-vocab tokens, 30% tail filler (realistic vocab breadth)
    flat_real = rng.choice(len(words), size=int(bounds[-1]), p=probs)
    names = np.array(words + [f"f{t}" for t in range(VOCAB)])
    filler = rng.integers(len(words), len(names), size=int(bounds[-1]))
    pick = rng.random(int(bounds[-1])) < 0.7
    flat = np.where(pick, flat_real, filler)
    flat_names = names[flat]
    corpus = [
        flat_names[bounds[i]: bounds[i + 1]].tolist() for i in range(N_DOCS)
    ]

    index = build_sparse_index(corpus, bm25_type=0)
    resident = ResidentSparseIndex(
        index, max_query_terms=mqt, heavy_hbm_budget=1 << 30
    )
    # repeat the question set out to a stream worth of queries
    reps = max(1, N_QUERIES // max(len(tokenized), 1))
    stream = (tokenized * reps)[:N_QUERIES]

    def run_all():
        _, _, checksum, done = resident.stream_score_topk_device(
            stream, TOPK, batch=BATCH
        )
        int(checksum)
        return done

    run_all()  # warmup/compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        done = run_all()
        best = min(best, time.perf_counter() - t0)
    return {
        "qps": round(done / best, 2),
        "n_unique_questions": len(tokenized),
        "mean_terms_per_query": round(
            float(np.mean([len(t) for t in tokenized])), 2
        ),
    }


def _load_reference_questions(limit: int = 2000) -> list:
    """Question strings from the reference's QA data if readable (list of
    str; [] when absent). Reads ``question_new.jsonl`` (test split) and
    ``val.json`` (keyword-eval split) — ``/root/reference/src/main.py:12-18``."""
    import pathlib

    base = pathlib.Path(
        os.environ.get("EASYRAG_QA_DIR", "/root/reference/src/data")
    )
    texts = []
    jl = base / "question_new.jsonl"
    if jl.is_file():
        for line in jl.read_text(encoding="utf-8").splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            q = rec.get("query") or rec.get("question")
            if q:
                texts.append(q)
    vj = base / "val.json"
    if vj.is_file():
        try:
            recs = json.loads(vj.read_text(encoding="utf-8"))
        except ValueError:
            recs = []
        for rec in recs if isinstance(recs, list) else []:
            q = rec.get("query") or rec.get("question")
            if q:
                texts.append(q)
    return texts[:limit]


def bench_dense(rng) -> tuple:
    """Dense route (the qdrant replacement) at the reference operating point
    (3584-d cosine, top-288, ``configs/easyrag.yaml:9,16``): the whole query
    stream in one compiled dispatch (``dense_score_topk_stream``), vs a
    numpy/BLAS flat scan standing in for a generous single-node baseline.
    Index and queries are generated ON DEVICE (host->device bulk uploads
    crawl through the axon tunnel and would dominate otherwise; a real
    deployment uploads the index once at boot)."""
    import jax
    import jax.numpy as jnp

    from easyrag_tpu.index.dense import dense_score_topk_stream

    # B=256: with selection cheap (pruned top-k), the stream is matrix-read
    # bound and bigger batches amortize reads (measured 57k/76k/79k qps at
    # B=64/128/256); sparse stays 64 (measured flat in B)
    N, D, K, B = N_DOCS, 3584, 288, 256
    nb = N_QUERIES // B
    key = jax.random.key(7)
    matrix = jax.random.normal(key, (N, D), jnp.bfloat16)
    matrix = matrix / jnp.linalg.norm(
        matrix.astype(jnp.float32), axis=1, keepdims=True
    ).astype(jnp.bfloat16)
    q = jax.random.normal(jax.random.fold_in(key, 1), (nb, B, D), jnp.bfloat16)

    def run_all():
        _, _, checksum = dense_score_topk_stream(q, matrix, K)
        return int(checksum)  # 4-byte readback: the only honest barrier here

    run_all()  # warmup/compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run_all()
        best = min(best, time.perf_counter() - t0)
    ours_qps = N_QUERIES / best

    # CPU flat-scan baseline on a handful of queries, extrapolated
    # (best-of-N passes, same policy as the sparse baseline)
    mat_np = rng.standard_normal((N, D), dtype=np.float32)
    q_np = rng.standard_normal((BASELINE_QUERIES, D), dtype=np.float32)
    cpu_best = float("inf")
    for _ in range(BASELINE_PASSES):
        t0 = time.perf_counter()
        scores = q_np @ mat_np.T
        np.argpartition(-scores, K, axis=1)[:, :K]
        cpu_best = min(cpu_best, time.perf_counter() - t0)
    cpu_qps = BASELINE_QUERIES / cpu_best
    return ours_qps, ours_qps / cpu_qps


# -- shared reranker-bench definitions (tools/bench_reranker.py imports
# these so the exploration tool and the driver metric can't drift) --------
V5E_BF16_PEAK = 197e12

# true bge-reranker-v2-minicpm-layerwise architecture
RERANKER_2B = dict(
    vocab_size=512,  # embed unused; _segment starts from hidden states
    hidden_size=2304, intermediate_size=5760,
    num_attention_heads=36, num_key_value_heads=36,
    scale_emb=12.0, scale_depth=1.4, dim_model_base=256.0,
)


def reranker_useful_flops(batch: int, seq: int, layers: int) -> float:
    """FLOPs of the UNPADDED reranker workload (dense projections + causal
    attention) — the MFU denominator."""
    d, i, h = 2304, 5760, 36
    dense = 2 * (4 * d * d + 3 * d * i) * batch * seq * layers
    attn = 4 * batch * h * seq * seq * 64 * layers // 2  # causal
    return dense + attn


def bench_reranker(quant: str = "") -> tuple:
    """The pipeline's dominant stage (SURVEY §3 hot loop #1): one reranker
    batch at true bge-reranker-v2-minicpm-layerwise scale — 32 pairs x 1064
    tokens through 28 layers with the flash64 kernel. Weights are random and
    generated ON DEVICE (uploads crawl through the tunnel); timing is
    identical to real weights. ``quant="w8a8"`` quantizes weights int8 and
    enables dynamic activation quant (the production-recommended config).
    Returns (ms_per_batch, useful-work bf16-peak MFU %)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from easyrag_tpu.models.layers import DecoderConfig, init_params
    from easyrag_tpu.models.minicpm import _segment

    B, S, L = 32, 1064, 28
    cfg = DecoderConfig(
        num_hidden_layers=L,
        use_flash=jax.default_backend() != "cpu",
        dtype=jnp.bfloat16,
        **RERANKER_2B,
    )
    params = init_params(cfg, jax.random.key(0))
    if quant == "w8a8":
        from easyrag_tpu.models.hf_loader import quantize_linear_int8_device

        cfg = dataclasses.replace(cfg, act_quant=True)
        q8 = jax.jit(quantize_linear_int8_device, donate_argnums=0)
        for layer in params["layers"]:
            for group in ("attn", "mlp"):
                for name in list(layer[group]):
                    rest = {k: v for k, v in layer[group][name].items() if k != "w"}
                    layer[group][name] = {**q8(layer[group][name]["w"]), **rest}
    hidden = jax.random.normal(jax.random.key(1), (B, S, 2304), jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.int32)

    def run():
        h = _segment(cfg, params, hidden, mask, 0, L)
        return float(h.astype(jnp.float32).sum())  # checksum barrier

    run()  # warmup/compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    mfu = reranker_useful_flops(B, S, L) / best / V5E_BF16_PEAK * 100
    return best * 1000.0, mfu


def main_mesh(spec: str) -> None:
    """``--mesh data=4,model=2``: run the SAME metrics through the sharded
    index classes (``tpu.shard_index`` surfaces) over a device mesh, so a
    future multi-chip attachment measures with one command. When the
    attachment has fewer devices than the mesh asks for, fall back to
    virtual CPU devices (correctness mode — throughput numbers then
    characterize the host, not TPU hardware, and are labeled as such)."""
    global N_DOCS, N_QUERIES  # make_corpus/make_queries read the module knobs
    import os

    axes = []
    for part in spec.split(","):
        name, _, size = part.partition("=")
        axes.append((name.strip(), int(size)))
    n_needed = 1
    for _, s in axes:
        n_needed *= s

    correctness_mode = False
    import jax

    if os.environ.get("_BENCH_MESH_REEXEC") == "1":
        # child: this container's site hook pins the axon TPU platform, so
        # (as in tests/conftest.py) the override must go through jax.config
        # — XLA_FLAGS from the parent still applies because the CPU backend
        # initializes on first use
        jax.config.update("jax_platforms", "cpu")
        correctness_mode = True
    elif len(jax.devices()) < n_needed:
        # not enough real devices: re-exec under a virtual CPU mesh (the
        # device-count flag must be in the environment before any backend
        # init, and this process has already initialized one)
        import subprocess
        import sys

        env = dict(os.environ)
        env["_BENCH_MESH_REEXEC"] = "1"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_needed}"
        )
        raise SystemExit(subprocess.call([sys.executable] + sys.argv, env=env))

    from easyrag_tpu.index.sparse import build_sparse_index
    from easyrag_tpu.parallel.mesh import make_mesh
    from easyrag_tpu.parallel.sharded import (
        ShardedDenseIndex,
        ShardedResidentSparseIndex,
    )

    mesh = make_mesh([s for _, s in axes], tuple(n for n, _ in axes))
    # CPU correctness mode shrinks the problem (the python-side prep and the
    # host "device" math would otherwise take minutes); real attachments run
    # the full bench shape
    n_docs = 4_000 if correctness_mode else N_DOCS
    n_queries = 512 if correctness_mode else N_QUERIES

    rng = np.random.default_rng(0)
    N_DOCS, N_QUERIES = n_docs, n_queries
    corpus = make_corpus(rng)
    queries = make_queries(rng, corpus)

    index = build_sparse_index(corpus, bm25_type=0)
    sharded = ShardedResidentSparseIndex(
        mesh, index, max_query_terms=16, heavy_hbm_budget=1 << 30
    )

    def run_sparse():
        tvs, tis = sharded.stream_score_topk(queries, TOPK, batch=BATCH)
        return int(np.asarray(tis).sum())  # host materialization barrier

    run_sparse()  # warmup/compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run_sparse()
        best = min(best, time.perf_counter() - t0)
    sparse_qps = n_queries / best

    # dense: same reference operating point, row-sharded matrix
    D, K, B = 3584, 288, 64
    mat = rng.standard_normal((n_docs, D)).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    dense = ShardedDenseIndex(mesh, mat)
    q = rng.standard_normal((n_queries, D)).astype(np.float32)

    def run_dense():
        tvs, tis = dense.query_stream(q, K, batch=B)
        return int(np.asarray(tis).sum())

    run_dense()  # warmup/compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run_dense()
        best = min(best, time.perf_counter() - t0)
    dense_qps = n_queries / best

    print(
        json.dumps(
            {
                "metric": "sharded_sparse_query_throughput",
                "value": round(sparse_qps, 2),
                "unit": "queries/s",
                "vs_baseline": 0.0,
                "extra": {
                    "mesh": {n: s for n, s in axes},
                    "backend": jax.default_backend(),
                    "correctness_mode": correctness_mode,
                    "n_docs": n_docs,
                    "sharded_dense_qps": round(dense_qps, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    import sys

    if "--mesh" in sys.argv:
        main_mesh(sys.argv[sys.argv.index("--mesh") + 1])
    else:
        main()
