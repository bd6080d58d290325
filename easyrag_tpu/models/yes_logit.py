"""Generic CausalLM reranker scored by the 'Yes'-token logit.

The reference's third reranker family (``src/easyrag/custom/rerankers.py:
177-184,361``): any causal LM prompted with the Yes/No instruction, scored
by ``logits[:, -1, yes_loc]``. Runs on the shared JAX decoder with the full
vocab head; only the 'Yes' row of the head is needed, so scoring projects
one row instead of the whole vocabulary (a TPU-side saving the reference's
full lm_head matmul doesn't get).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import DecoderConfig, forward_hidden
from .minicpm import MiniCPMLayerWiseReranker


@functools.partial(jax.jit, static_argnames=("cfg",))
def _yes_score(cfg: DecoderConfig, params, yes_row, input_ids, attention_mask, last_idx):
    h = forward_hidden(cfg, params, input_ids, attention_mask)
    last = jnp.take_along_axis(h, last_idx[:, None, None].astype(jnp.int32), axis=1)
    return last[:, 0, :].astype(jnp.float32) @ yes_row.astype(jnp.float32)


class YesLogitScorer:
    def __init__(self, cfg: DecoderConfig, params: Dict[str, Any], tokenizer,
                 max_length: int = 1024) -> None:
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.max_length = max_length
        # scorer-protocol attribute (LLMRerank save/restore and the serving
        # CoalescingScorer read it); this family always runs the full stack
        self.cutoff_layer = cfg.num_hidden_layers
        yes_loc = tokenizer("Yes", add_special_tokens=False)["input_ids"][0]
        head = params.get("lm_head", params["embed"])  # tied when absent
        if isinstance(head, dict):  # hf_loader linear form (maybe int8)
            if "w_q" in head:
                self.yes_row = (
                    head["w_q"][yes_loc].astype(jnp.float32) * head["scale"][yes_loc]
                )
            else:
                self.yes_row = head["w"][yes_loc]
        else:
            self.yes_row = head[yes_loc]
        # reuse the pair-prompt builder (identical prompt format)
        self._builder = MiniCPMLayerWiseReranker.__new__(MiniCPMLayerWiseReranker)
        self._builder.tokenizer = tokenizer
        self._builder.max_length = max_length
        self._builder.seq_bucket = 64
        self._builder.padding_side = (
            getattr(tokenizer, "padding_side", None) or "left"
        )
        self._builder.prompt = (
            "Given a query A and a passage B, determine whether the passage "
            "contains an answer to the query by providing a prediction of "
            "either 'Yes' or 'No'."
        )

    @classmethod
    def from_pretrained(cls, model_dir: str, quant: str = "") -> "YesLogitScorer":
        import dataclasses

        from transformers import AutoTokenizer

        from .hf_loader import load_decoder_params, load_hf_config
        from .qwen2 import qwen2_config_from_hf

        hf = load_hf_config(model_dir)
        cfg = qwen2_config_from_hf(hf)
        if quant == "w8a8":
            cfg = dataclasses.replace(cfg, act_quant=True)
        params = load_decoder_params(model_dir, cfg.num_hidden_layers, quant=quant)
        tok = AutoTokenizer.from_pretrained(model_dir, trust_remote_code=True)
        return cls(cfg, params, tok)

    def score_pairs(
        self, pairs: List[Tuple[str, str]], judge: bool = False
    ) -> Tuple[np.ndarray, int]:
        ids, mask = MiniCPMLayerWiseReranker.build_inputs(self._builder, pairs)
        from .minicpm import last_real_index

        scores = _yes_score(
            self.cfg, self.params, self.yes_row, jnp.asarray(ids),
            jnp.asarray(mask), jnp.asarray(last_real_index(mask)),
        )
        return np.asarray(scores), self.cfg.num_hidden_layers
