"""Regenerate tests/fixtures/bm25_goldens.json from the REAL libraries.

Run on a machine where rank_bm25 / bm25s / jieba are installed:

    python tools/gen_bm25_goldens.py

Sections whose library is absent keep their current (hand-derived) values,
so partial regeneration is safe. The fixture exists to break the
oracle-vs-oracle symmetry in tests/test_bm25_parity.py: the packed TPU index
is tested against literal numbers vendored in git, and those numbers are
replaced by true library outputs wherever the libraries exist
(reference usage: /root/reference/src/easyrag/custom/retrievers.py:103-118).
"""

import json
import os

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "bm25_goldens.json",
)


def main() -> int:
    with open(FIXTURE, encoding="utf-8") as f:
        fix = json.load(f)

    try:
        from rank_bm25 import BM25Okapi

        p = fix["okapi"]["params"]
        for case in fix["okapi"]["cases"]:
            bm = BM25Okapi(
                case["corpus"], k1=p["k1"], b=p["b"], epsilon=p["epsilon"]
            )
            case["scores"] = [list(map(float, bm.get_scores(q))) for q in case["queries"]]
        fix["provenance"]["bm25_okapi"] = "generated from installed rank_bm25"
        print("okapi: regenerated from rank_bm25")
    except ImportError:
        print("okapi: rank_bm25 not installed, keeping existing values")

    try:
        import bm25s
        import numpy as np

        p = fix["lucene"]["params"]
        for case in fix["lucene"]["cases"]:
            # reference path (retrievers.py:106-111): corpus is pre-tokenized,
            # scoring over token lists with method="lucene" defaults
            bm = bm25s.BM25(k1=p["k1"], b=p["b"])
            vocab = {t: i for i, t in enumerate(sorted({t for d in case["corpus"] for t in d}))}
            ids = [[vocab[t] for t in d] for d in case["corpus"]]
            bm.index(ids)
            out = []
            for q in case["queries"]:
                qids = [vocab[t] for t in q if t in vocab]
                scores = bm.get_scores(np.asarray(qids, dtype=np.int32)) if qids else np.zeros(len(ids))
                out.append(list(map(float, scores)))
            case["scores"] = out
        fix["provenance"]["bm25_lucene"] = "generated from installed bm25s"
        print("lucene: regenerated from bm25s")
    except ImportError:
        print("lucene: bm25s not installed, keeping existing values")

    try:
        import jieba

        tk = jieba.Tokenizer()
        fix["jieba"] = {s: list(tk.cut(s)) for s in fix["jieba"]}
        fix["provenance"]["jieba"] = (
            f"generated from installed jieba {jieba.__version__} "
            "(jieba.Tokenizer().cut, HMM default)"
        )
        print("jieba: regenerated")
    except ImportError:
        print("jieba: not installed, keeping existing values")

    with open(FIXTURE, "w", encoding="utf-8") as f:
        json.dump(fix, f, ensure_ascii=False, indent=1)
    print(f"wrote {FIXTURE}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
