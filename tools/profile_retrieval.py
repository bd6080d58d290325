"""Where does the co-resident retrieval-only batch path spend its time?

The device sparse scorer streams 4096-query sets at ~28k qps, but the
full ``run_retrieval_batch`` slice measures only ~500-600 qps — this
profiles one 512-query batch (cProfile, cumulative) to split device
dispatch from host work (query prep / node materialization / fusion /
content views).
"""

import argparse
import asyncio
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=512)
    ap.add_argument("--docs", type=int, default=20_000)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    from bench_pipeline import build_system, make_query  # noqa: E402

    ns = build_system(tiny=args.tiny, docs=args.docs, with_embedder=False)
    pipeline = ns.pipeline
    pipeline.reranker = None
    rq = [{"query": make_query(ns)} for _ in range(args.queries)]
    loop = asyncio.new_event_loop()
    loop.run_until_complete(pipeline.run_retrieval_batch(rq))  # warm

    t0 = time.perf_counter()
    loop.run_until_complete(pipeline.run_retrieval_batch(rq))
    wall = time.perf_counter() - t0
    print(f"[warm] {len(rq)/wall:.0f} qps ({wall*1000:.0f} ms / {len(rq)} queries)",
          flush=True)

    prof = cProfile.Profile()
    prof.enable()
    loop.run_until_complete(pipeline.run_retrieval_batch(rq))
    prof.disable()
    s = io.StringIO()
    ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    ps.print_stats(35)
    print(s.getvalue(), flush=True)


if __name__ == "__main__":
    main()
