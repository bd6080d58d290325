"""End-to-end ``cli.py --split val`` exercise on the REAL val QA data
(VERDICT r4 #4).

The reference's batch eval (``/root/reference/src/main.py:48-91``) runs
the whole val split through ``run(query)`` and scores keyword accuracy.
The zedx corpus itself is absent from this environment, but the QA files
are readable — so this harness builds the closest exercisable analogue:

- **Corpus**: each val record's ground-truth ANSWER text becomes a corpus
  document under ``<document>/<id>.txt`` (plus a ``pathmap.json``), so the
  real Chinese questions retrieve over real Chinese answer text through
  the full jieba + HIT + BM25 path — retrieval has a real signal
  (the query's own answer doc), even though the LLM weights are random.
- **Local LLM**: a tiny random-weight Qwen2 checkpoint with a bpe
  tokenizer TRAINED on the val text (so Chinese encodes densely), wired as
  the on-chip answerer (``tpu.local_llm_answer``) — the full
  ``--batch-answers`` staged surface runs: one retrieval stream ->
  bucketed gen_batch decodes -> save_answers -> keyword_accuracy ->
  inter dumps.
- **Recall proxy**: from the inter dump, the fraction of queries whose
  top-k retrieved paths include the ground-truth ``document`` directory —
  the only quality number random weights cannot poison.

Keyword accuracy is printed but meaningless (random weights); the run's
value is the complete batch-eval surface + the retrieval document-hit
rate on real queries. Record both in BASELINE.md.

Run: python tools/run_val_e2e.py [--workdir /tmp/val_e2e] [--batch/--seq]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QA_DIR = os.environ.get("EASYRAG_QA_DIR", "/root/reference/src/data")


def build_corpus(recs, root):
    """val answers -> <document>/<id>.txt + pathmap.json."""
    os.makedirs(root, exist_ok=True)
    pathmap = {}
    for rec in recs:
        doc = rec.get("document") or "misc"
        d = os.path.join(root, doc)
        os.makedirs(d, exist_ok=True)
        rel = f"{doc}/{rec['id']}.txt"
        with open(os.path.join(root, rel), "w", encoding="utf-8") as f:
            f.write(str(rec["answer"]))
        pathmap[rel] = [doc, str(rec["id"])]
    with open(os.path.join(root, "pathmap.json"), "w", encoding="utf-8") as f:
        json.dump(pathmap, f, ensure_ascii=False)


def build_checkpoint(recs, out_dir, vocab=2048):
    """Tiny random-weight Qwen2 + a byte-level BPE trained on the val text
    (questions + answers), saved in the on-disk layout JaxCausalLM loads."""
    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast, Qwen2Config, Qwen2ForCausalLM

    texts = [str(r["query"]) for r in recs] + [str(r["answer"]) for r in recs]
    bpe = Tokenizer(models.BPE(unk_token=None))
    bpe.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=vocab - 2, special_tokens=["<|endoftext|>", "<|im_end|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    bpe.train_from_iterator(texts, trainer)
    tok = PreTrainedTokenizerFast(
        tokenizer_object=bpe,
        eos_token="<|im_end|>", pad_token="<|endoftext|>",
    )
    tok.chat_template = (
        "{% for m in messages %}{{ m['content'] }}{% endfor %}"
        "{% if add_generation_prompt %}\n{% endif %}"
    )
    n_vocab = max(bpe.get_vocab_size(), 64)
    torch.manual_seed(5)
    hf_cfg = Qwen2Config(
        vocab_size=n_vocab, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=8192, attn_implementation="eager",
        tie_word_embeddings=False,
        eos_token_id=tok.eos_token_id,
    )
    Qwen2ForCausalLM(hf_cfg).eval().float().save_pretrained(
        out_dir, safe_serialization=True
    )
    tok.save_pretrained(out_dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/val_e2e")
    ap.add_argument("--seq", action="store_true",
                    help="also run the sequential (non-batch) loop")
    ap.add_argument("--max-new", type=int, default=32)
    ap.add_argument("--gen-batch", type=int, default=4)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend in the CLI subprocess "
                         "(JAX_PLATFORMS is too late under the axon site "
                         "hook; this injects jax.config.update instead)")
    args = ap.parse_args()

    with open(os.path.join(QA_DIR, "val.json"), encoding="utf-8") as f:
        recs = json.load(f)
    print(f"{len(recs)} val records from {QA_DIR}", flush=True)

    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)
    corpus = os.path.join(wd, "corpus")
    ckpt = os.path.join(wd, "qwen2-tiny")
    build_corpus(recs, corpus)
    build_checkpoint(recs, ckpt)

    cfg_path = os.path.join(wd, "config.yaml")
    with open(cfg_path, "w", encoding="utf-8") as f:
        f.write(f"""
# val e2e: sparse-only retrieval over answer-derived corpus + tiny
# random-weight on-chip answerer (tools/run_val_e2e.py)
retrieval_type: 2
use_reranker: 0
f_topk_2: 6
f_topk_3: 6
r_topk: 6
chunk_size: 256
chunk_overlap: 32
data_path: {corpus}
local_llm_name: {ckpt}
cache_path: {os.path.join(wd, "cache")}
tpu:
  local_llm_quant: ""
  local_llm_answer: true
  local_llm_max_new: {args.max_new}
  local_llm_gen_batch: {args.gen_batch}
  compile_cache_dir: .jax_cache
""")

    env = {**os.environ, "PYTHONPATH": REPO + os.pathsep
           + os.environ.get("PYTHONPATH", "")}
    runs = [("batch", ["--batch-answers"])] + (
        [("sequential", [])] if args.seq else []
    )
    for tag, extra in runs:
        cli_args = ["--config", cfg_path, "--split", "val",
                    "--qa-dir", QA_DIR, "--note", f"e2e_{tag}"] + extra
        if args.cpu:
            stub = (
                "import sys, jax; "
                "jax.config.update('jax_platforms', 'cpu'); "
                "from easyrag_tpu.cli import main; "
                f"sys.argv = ['cli'] + {cli_args!r}; main()"
            )
            cmd = [sys.executable, "-u", "-c", stub]
        else:
            cmd = [sys.executable, "-u", "-m", "easyrag_tpu.cli"] + cli_args
        print(f"[{tag}] {' '.join(cmd)}", flush=True)
        t0 = time.perf_counter()
        rc = subprocess.run(cmd, cwd=wd, env=env).returncode
        wall = time.perf_counter() - t0
        print(f"[{tag}] rc={rc} wall={wall:.1f}s", flush=True)
        if rc:
            sys.exit(rc)

        # retrieval document-hit rate from the inter dump: the one quality
        # number random LLM weights cannot poison
        inter = os.path.join(wd, "inter", f"val_e2e_{tag}.json")
        with open(inter, encoding="utf-8") as f:
            rows = json.load(f)
        by_id = {r["id"]: r for r in recs}
        hits = sum(
            any(p.split("/")[0] == str(by_id[row["id"]].get("document", "misc"))
                for p in row["paths"])
            for row in rows
        )
        own = sum(
            any(p.endswith(f"/{row['id']}.txt") for p in row["paths"])
            for row in rows
        )
        print(json.dumps({
            "run": tag, "n": len(rows), "wall_s": round(wall, 1),
            "qps": round(len(rows) / wall, 3),
            "doc_hit_at_6": round(hits / len(rows), 4),
            "own_answer_chunk_at_6": round(own / len(rows), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
