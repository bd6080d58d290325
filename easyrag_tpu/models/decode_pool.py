"""Continuous batching for on-chip generation: a static-shape decode pool.

The measured gap this closes (BASELINE.md, serving section): cross-request
generation *batching* (``generation.BatchingLocalLLM``) is p50-neutral at
c=4 because the serialized rerank stage staggers arrivals into the
generation stage by ~2.3 s while a 128-token decode takes ~2.8 s — windows
rarely coincide, so most decodes run solo and requests serialize. The fix
used by GPU serving systems (vLLM-style continuous batching) admits new
requests into a *running* decode at step granularity. A literal port is
impossible under XLA — the batch composition would be a dynamic shape — so
this is the TPU-native formulation:

* **slot pool** — one persistent state of static shape ``[B_pool, T]``
  (``T = largest prompt bucket + max_new``): per-layer KV caches, a
  validity mask, per-row progress counters, and an output buffer. Free
  slots are rows with ``done=True``; they flow through the compute masked
  (decode is weight-bandwidth-bound — the whole parameter tree is re-read
  per step regardless, so idle rows are free, measured +4% for B=8 vs B=1).
* **chunked decode** — ``pool_chunk`` runs up to ``chunk_steps`` decode
  steps in ONE compiled dispatch (a ``lax.while_loop`` that also exits
  when every live row finishes). Between chunks the host may admit
  waiting requests: prefill at the request's own length bucket
  (``prefill_only``, the flash kernel path), then splice the prefill KV
  into a free slot (``pool_insert``). Join granularity is
  ``chunk_steps × step_time`` (~0.3 s at the 7B defaults) and the chunk
  executable is a SINGLE compile for the whole serving lifetime — the
  (bucket, batch-size) executable zoo of the batched path collapses.
* **per-row positions** — rows joined at different prompt lengths write
  cache slots at ``gen_base[i] + n[i]`` and take RoPE at their true
  positions ``lengths[i] + n[i]`` (one batched scatter per layer,
  ``decode._cache_write``); attention masks invalid slots exactly as
  ``generate_greedy`` does, so each row's token sequence is bit-identical
  to a solo ``generate_greedy`` run (pinned in ``tests/test_decode_pool.py``).

Reference anchor: the reference's generation stage is a per-request
network call or a solo HF ``generate``
(``/root/reference/src/easyrag/pipeline/rag.py:26-39``,
``src/easyrag/utils/llm_utils.py:58-73``) — no batching story at all; this
module is a TPU-native extension beyond parity.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import DecoderConfig, embed, rms_norm, rope_tables
from .decode import (
    Cache,
    _decode_layer,
    _lm_logits,
    _pad_left,
    _prefill,
    init_cache,
)

PoolState = Dict[str, Any]


def pool_init(cfg: DecoderConfig, pool_size: int, total_len: int, max_new: int) -> PoolState:
    """Fresh pool: every slot free (``done=True`` keeps the chunk loop's
    all-done early exit honest when nothing is live)."""
    b, t, m = pool_size, total_len, max_new
    return {
        "caches": init_cache(cfg, b, t),
        "kv_mask": jnp.zeros((b, t), jnp.int32),
        "tok": jnp.zeros((b,), jnp.int32),  # next input token (last emitted)
        "n": jnp.zeros((b,), jnp.int32),  # decode steps completed per row
        "done": jnp.ones((b,), bool),
        "lengths": jnp.zeros((b,), jnp.int32),  # true prompt lengths (RoPE)
        "gen_base": jnp.zeros((b,), jnp.int32),  # row's prefill bucket size
        "out": jnp.zeros((b, max_new), jnp.int32),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def prefill_only(
    cfg: DecoderConfig,
    params: Dict[str, Any],
    input_ids: jnp.ndarray,  # [1, S] LEFT-padded to the length bucket
    attention_mask: jnp.ndarray,  # [1, S]
) -> Tuple[jnp.ndarray, Cache]:
    """Prompt forward at the request's own bucket; returns the first
    greedy token and an S-slot KV cache ready to splice into the pool."""
    b, s = input_ids.shape
    cache = init_cache(cfg, b, s)
    h_last, cache = _prefill(cfg, params, input_ids, attention_mask, cache)
    first = jnp.argmax(_lm_logits(cfg, params, h_last), axis=-1).astype(jnp.int32)
    return first, cache


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def pool_insert(
    cfg: DecoderConfig,
    state: PoolState,
    slot: jnp.ndarray,  # scalar int32
    prefill_cache: Cache,  # per-layer {"k"/"v": [1, S, nkv, hd]}
    prefill_mask: jnp.ndarray,  # [1, S] int32
    first_tok: jnp.ndarray,  # scalar int32
    length: jnp.ndarray,  # scalar int32: true prompt length
    eos0: jnp.ndarray,  # scalar int32: out-buffer fill value
) -> PoolState:
    """Splice a prefilled request into a free slot. Compiled once per
    prompt bucket (S is the only static that varies); donates the pool
    state (the prefill cache's [1, S] shape can never alias an output,
    so donating it would only warn)."""
    s = prefill_mask.shape[1]
    t = state["kv_mask"].shape[1]
    caches = []
    for pool_c, pf_c in zip(state["caches"], prefill_cache):
        caches.append(
            {
                "k": pool_c["k"].at[slot, :s].set(pf_c["k"][0].astype(pool_c["k"].dtype)),
                "v": pool_c["v"].at[slot, :s].set(pf_c["v"][0].astype(pool_c["v"].dtype)),
            }
        )
    # the row's validity: the prefill mask over [0, S), zeros beyond —
    # clearing any stale slots left by the previous occupant
    row_mask = jnp.zeros((t,), jnp.int32).at[:s].set(prefill_mask[0])
    m = state["out"].shape[1]
    return {
        "caches": caches,
        "kv_mask": state["kv_mask"].at[slot].set(row_mask),
        "tok": state["tok"].at[slot].set(first_tok),
        "n": state["n"].at[slot].set(0),
        "done": state["done"].at[slot].set(False),
        "lengths": state["lengths"].at[slot].set(length),
        "gen_base": state["gen_base"].at[slot].set(jnp.int32(s)),
        "out": state["out"].at[slot].set(jnp.full((m,), eos0, jnp.int32)),
    }


@functools.partial(jax.jit, static_argnames=("cfg", "steps"), donate_argnums=(2,))
def pool_chunk(
    cfg: DecoderConfig,
    params: Dict[str, Any],
    state: PoolState,
    eos_ids: jnp.ndarray,  # [E] int32
    steps: int,
) -> PoolState:
    """Up to ``steps`` decode steps over every live slot, one dispatch.

    Per-row semantics are exactly ``decode.generate_greedy``'s body with
    the global step counter replaced by per-row ``n``: write the pending
    token at ``out[i, n]``, mark EOS, write this token's K/V at
    ``gen_base[i] + n`` (masked invalid for rows that just finished),
    advance live rows. Rows whose ``n`` froze preserve their emitted
    suffix (the write keeps the current value), so outputs are
    bit-identical to solo runs regardless of how long a finished row
    lingers in the pool.
    """
    b, t = state["kv_mask"].shape
    m = state["out"].shape[1]
    idx = jnp.arange(b)

    def cond(c):
        j, st = c
        return jnp.logical_and(j < steps, ~jnp.all(st["done"]))

    def body(c):
        j, st = c
        tok, n, done = st["tok"], st["n"], st["done"]
        nw = jnp.minimum(n, m - 1)
        cur = st["out"][idx, nw]
        out = st["out"].at[idx, nw].set(jnp.where(done, cur, tok))
        done = jnp.logical_or(
            done, jnp.any(tok[:, None] == eos_ids[None, :], axis=1)
        )
        # this input token's cache slot; clamped writes from finished rows
        # land on a slot their mask marks invalid (pos==T only at n==M,
        # which implies done)
        pos = jnp.minimum(st["gen_base"] + n, t - 1)
        kv_mask = st["kv_mask"].at[idx, pos].set((~done).astype(jnp.int32))
        rope_pos = (st["lengths"] + n)[:, None]
        cos, sin = rope_tables(rope_pos, cfg.hd, cfg.rope_theta)
        h = embed(cfg, params, tok[:, None])
        caches: Cache = []
        for li in range(cfg.num_hidden_layers):
            h, cch = _decode_layer(
                cfg, params["layers"][li], h, pos, kv_mask, cos, sin,
                st["caches"][li],
            )
            caches.append(cch)
        h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps, cfg.gemma)
        nxt = jnp.argmax(_lm_logits(cfg, params, h[:, 0]), axis=-1).astype(jnp.int32)
        tok = jnp.where(done, tok, nxt)
        n = n + (~done).astype(jnp.int32)
        done = jnp.logical_or(done, n >= m)
        st2 = dict(st, caches=caches, kv_mask=kv_mask, tok=tok, n=n, done=done, out=out)
        return j + 1, st2

    _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return state


class DecodePool:
    """Host-side slot bookkeeping around the jitted pool ops.

    Not thread-safe by design — the async driver
    (``generation.ContinuousBatchingLocalLLM``) serializes all calls, which
    also matches the hardware: one chip runs one dispatch at a time.
    """

    def __init__(self, llm, pool_size: int = 4, chunk_steps: int = 32) -> None:
        if not llm.max_new_tokens:
            raise ValueError(
                "continuous batching needs tpu.local_llm_max_new set: the "
                "pool's output buffer is static per row"
            )
        self.llm = llm
        self.cfg: DecoderConfig = llm.cfg
        self.params = llm.params
        self.max_new = int(llm.max_new_tokens)
        self.pool_size = pool_size
        self.total_len = llm.buckets[-1] + self.max_new
        self.chunk_steps = chunk_steps
        self.eos_ids = jnp.asarray(llm.eos_ids, jnp.int32)
        self.pad_id = llm.tokenizer.pad_token_id or llm.eos_ids[0]
        self.state = pool_init(self.cfg, pool_size, self.total_len, self.max_new)
        self.free: List[int] = list(range(pool_size))
        self.live: Dict[int, Any] = {}  # slot -> opaque request handle
        self.chunks = 0  # dispatched chunk count (observability/tests)
        self.joins = 0  # inserts that joined an already-live pool

    # -- admission ---------------------------------------------------------

    def insert(self, token_ids: Sequence[int], handle: Any) -> int:
        """Prefill + splice into a free slot; returns the slot."""
        if not self.free:
            raise RuntimeError("decode pool full")
        slot = self.free.pop()
        bucket = next(b for b in self.llm.buckets if len(token_ids) <= b)
        row, mask = _pad_left(list(token_ids), bucket, self.pad_id)
        first, cache = prefill_only(
            self.cfg,
            self.params,
            jnp.asarray([row], jnp.int32),
            jnp.asarray([mask], jnp.int32),
        )
        if self.live:
            self.joins += 1
        self.state = pool_insert(
            self.cfg,
            self.state,
            jnp.int32(slot),
            cache,
            jnp.asarray([mask], jnp.int32),
            first[0],
            jnp.int32(len(token_ids)),
            jnp.int32(self.llm.eos_ids[0]),
        )
        self.live[slot] = handle
        return slot

    @property
    def active(self) -> bool:
        return bool(self.live)

    # -- decode ------------------------------------------------------------

    def run_chunk(self) -> List[Tuple[Any, List[int]]]:
        """One chunk dispatch; harvest finished rows as (handle, tokens)."""
        self.state = pool_chunk(
            self.cfg, self.params, self.state, self.eos_ids, self.chunk_steps
        )
        self.chunks += 1
        done = np.asarray(self.state["done"])  # [B] — the sync point
        finished = []
        for slot in list(self.live):
            if done[slot]:
                toks = [int(x) for x in np.asarray(self.state["out"][slot])]
                finished.append((self.live.pop(slot), toks))
                self.free.append(slot)
        return finished

    # -- lifecycle ---------------------------------------------------------

    def reset(self) -> None:
        self.state = pool_init(
            self.cfg, self.pool_size, self.total_len, self.max_new
        )
        self.free = list(range(self.pool_size))
        self.live = {}

    def warmup(self, buckets: Optional[Sequence[int]] = None) -> None:
        """Compile the per-bucket prefill+insert pair and the single chunk
        executable off the request path, then reset. Unlike the batched
        path's (bucket × batch-size) zoo, the steady-state executable set
        here is one chunk + one (prefill, insert) per bucket."""
        for bucket in buckets or self.llm.buckets:
            bucket = next(b for b in self.llm.buckets if bucket <= b)
            # a bucket-filling dummy makes insert() pick exactly `bucket`;
            # pad_id is always a valid token (an EOS id may be a sentinel,
            # e.g. the bench's never-fires -1)
            self.insert([self.pad_id] * bucket, handle=None)
            self.run_chunk()
        self.reset()
