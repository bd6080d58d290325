"""The four-tenant config preset (``configs/four_tenant.yaml``) must
reproduce the flagship boot: one named file drives both the bench tool
(``tools/bench_pipeline.py --preset``) and the serving boot
(``--config``), so the headline measurement can't drift from a
hand-typed flag bundle (VERDICT r4 #5 / weak #7)."""

import os
import sys

import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from easyrag_tpu.config import EasyRAGConfig  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRESET = os.path.join(REPO, "configs", "four_tenant.yaml")


def _parse(argv):
    """Run bench_pipeline's own parser + preset application on argv."""
    import argparse

    from tools.bench_pipeline import apply_preset

    # reuse the real parser by calling main()'s construction indirectly:
    # build an identical-arg namespace via the module's parser definition.
    # bench_pipeline defines the parser inside main(), so re-create the
    # minimal contract here from the module-level apply_preset signature:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reranker-quant", default="")
    ap.add_argument("--embedder-quant", default="int8")
    ap.add_argument("--embedder-w8a8", action="store_true")
    ap.add_argument("--cascade", type=int, default=0)
    ap.add_argument("--cascade-carry", action="store_true")
    ap.add_argument("--local-llm", type=int, default=0)
    ap.add_argument("--local-llm-quant", default="int8")
    ap.add_argument("--gen-batch", type=int, default=8)
    ap.add_argument("--preset", default="")
    args = ap.parse_args(argv)
    if args.preset:
        apply_preset(args, argv=argv)
    return args


def test_preset_maps_to_four_tenant_flags():
    args = _parse(["--preset", PRESET])
    assert args.reranker_quant == "w8a8"
    assert args.embedder_quant == "int4"  # w4a8 = int4 storage...
    assert args.embedder_w8a8 is True  # ...+ w8a8 activation compute
    assert args.cascade == 32
    assert args.cascade_carry is True
    assert args.local_llm == 128
    assert args.local_llm_quant == "int4"
    assert args.gen_batch == 4


def test_explicit_flags_override_preset():
    args = _parse(["--preset", PRESET, "--cascade", "16",
                   "--local-llm-quant", "int8"])
    assert args.cascade == 16
    assert args.local_llm_quant == "int8"
    assert args.reranker_quant == "w8a8"  # untouched knobs still preset


def test_preset_loads_as_serving_config():
    """The same file must be a valid EasyRAGConfig for the serving boot."""
    with open(PRESET, encoding="utf-8") as f:
        raw = yaml.safe_load(f)
    cfg = EasyRAGConfig.from_dict(raw)
    assert cfg.use_reranker == 2
    assert cfg.r_use_efficient == 3
    assert cfg.tpu.reranker_quant == "w8a8"
    assert cfg.tpu.embedder_quant == "w4a8"
    assert cfg.tpu.local_llm_quant == "int4"
    assert cfg.tpu.local_llm_answer is True
    assert cfg.tpu.local_llm_max_new == 128
    assert cfg.tpu.local_llm_gen_batch == 4
    assert cfg.tpu.cascade_keep == 32 and cfg.tpu.cascade_carry
    assert cfg.tpu.local_llm_warmup is True
    assert cfg.tpu.compile_cache_dir == ".jax_cache"
    assert not getattr(cfg, "extra", {})  # every key modeled, no typos


def test_preset_main_parser_accepts_flag():
    """The REAL parser (not the mirror above) accepts --preset and the
    mapping reaches main()'s args — guard against parser drift."""
    import subprocess

    out = subprocess.run(
        [sys.executable, "tools/bench_pipeline.py", "--help"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert "--preset" in out.stdout
