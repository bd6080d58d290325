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
  (``T = slot's prompt-bucket tier + max_new``): per-layer KV caches, a
  validity mask, per-row progress counters, a token-history buffer, and an
  output buffer. Free slots are rows with ``done=True``; they flow through
  the compute masked (decode is weight-bandwidth-bound — the whole
  parameter tree is re-read per step regardless, so idle rows are free,
  measured +4% for B=8 vs B=1).
* **slot tiers** — slots come in per-bucket size tiers (``tiers=[(2048,
  2), (7680, 2)]``) so a short prompt doesn't reserve a 7808-token KV
  (the r3 OOM: uniform largest-bucket slots cost 1.75 GB at pool 4 next
  to the full co-resident stack; tiered pools cut that ~2x). A request
  lands in the smallest tier that fits its prompt bucket, overflowing
  upward when that tier is full. Each tier is its own pool state and
  chunk dispatch; only tiers with live rows dispatch.
* **chunked decode** — ``pool_chunk`` runs up to ``chunk_steps`` decode
  steps in ONE compiled dispatch (a ``lax.while_loop`` that also exits
  when every live row finishes). Between chunks the host may admit
  waiting requests: prefill at the request's own length bucket
  (``prefill_only``, the flash kernel path), then splice the prefill KV
  into a free slot (``pool_insert``). Join granularity is
  ``chunk_steps × step_time`` (~0.3 s at the 7B defaults) and the chunk
  executable is ONE compile per tier for the whole serving lifetime — the
  (bucket, batch-size) executable zoo of the batched path collapses.
* **per-row positions** — rows joined at different prompt lengths write
  cache slots at ``gen_base[i] + n[i]`` and take RoPE at their true
  positions ``lengths[i] + n[i]`` (one batched scatter per layer,
  ``decode._cache_write``); attention masks invalid slots exactly as
  ``generate_greedy`` does, so each row's token sequence is bit-identical
  to a solo ``generate_greedy`` run (pinned in ``tests/test_decode_pool.py``).
* **speculation** — with ``spec_tokens=K`` set on the LLM, chunks run
  ``pool_chunk_spec``: each iteration drafts K tokens per row from the
  row's own token history (prompt-lookup, ``decode._ngram_draft``) and
  verifies them in ONE forward over K+1 positions — the same
  weight-bandwidth argument as ``generate_greedy_spec``, so accepted
  drafts multiply pool throughput at ~zero marginal cost. Acceptance is
  per-row (rows advance by 1..K+1 tokens per iteration independently);
  outputs stay bit-identical to solo runs (greedy acceptance is exact).

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
    _ngram_draft,
    _pad_left,
    _prefill,
    _verify_layer,
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
        "n": jnp.zeros((b,), jnp.int32),  # tokens recorded in out per row
        "done": jnp.ones((b,), bool),
        "lengths": jnp.zeros((b,), jnp.int32),  # true prompt lengths (RoPE)
        "gen_base": jnp.zeros((b,), jnp.int32),  # row's prefill bucket size
        "buf": jnp.zeros((b, t), jnp.int32),  # token history (spec drafts)
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
    prefill_ids: jnp.ndarray,  # [1, S] int32 LEFT-padded prompt tokens
    prefill_mask: jnp.ndarray,  # [1, S] int32
    first_tok: jnp.ndarray,  # scalar int32
    length: jnp.ndarray,  # scalar int32: true prompt length
    eos0: jnp.ndarray,  # scalar int32: out-buffer fill value
) -> PoolState:
    """Splice a prefilled request into a free slot. Compiled once per
    (tier, prompt bucket) pair (S is the only static that varies); donates
    the pool state (the prefill cache's [1, S] shape can never alias an
    output, so donating it would only warn)."""
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
    # token history for prompt-lookup drafts: the left-padded prompt sits
    # at [S - length, S) — exactly where gen_base - length lands it
    row_buf = jnp.full((t,), eos0, jnp.int32).at[:s].set(prefill_ids[0])
    m = state["out"].shape[1]
    return {
        "caches": caches,
        "kv_mask": state["kv_mask"].at[slot].set(row_mask),
        "tok": state["tok"].at[slot].set(first_tok),
        "n": state["n"].at[slot].set(0),
        "done": state["done"].at[slot].set(False),
        "lengths": state["lengths"].at[slot].set(length),
        "gen_base": state["gen_base"].at[slot].set(jnp.int32(s)),
        "buf": state["buf"].at[slot].set(row_buf),
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


@functools.partial(
    jax.jit, static_argnames=("cfg", "steps", "draft_len", "ngram"),
    donate_argnums=(2,),
)
def pool_chunk_spec(
    cfg: DecoderConfig,
    params: Dict[str, Any],
    state: PoolState,
    eos_ids: jnp.ndarray,  # [E] int32
    steps: int,
    draft_len: int,
    ngram: int,
) -> PoolState:
    """Speculative chunk: up to ``steps`` verify-block iterations.

    Each iteration flushes the pending token (exactly like ``pool_chunk``'s
    step: write ``out[i, n]``, mark EOS, validate its KV slot), drafts
    ``draft_len`` tokens from the row's history, and verifies the block in
    ONE forward over ``draft_len + 1`` positions (``decode._verify_layer``).
    Per-row progress: a row emits ``1..draft_len+1`` tokens per iteration
    by its own acceptance run; the LAST accepted prediction becomes the new
    pending token, so the pending-token invariant (out[0..n) written, tok
    next) survives and harvest/parity semantics are unchanged. Greedy
    acceptance is exact — a draft is kept only when it equals the model's
    own argmax — so outputs are bit-identical to ``pool_chunk``
    (pinned in ``tests/test_decode_pool.py::test_spec_*``).
    """
    b, t = state["kv_mask"].shape
    m_max = state["out"].shape[1]
    k1 = draft_len + 1
    idx = jnp.arange(b)
    j_idx = jnp.arange(k1)[None, :]
    is_eos = lambda x: jnp.any(x[..., None] == eos_ids[None, :], axis=-1)

    def cond(c):
        j, st = c
        return jnp.logical_and(j < steps, ~jnp.all(st["done"]))

    def body(c):
        j, st = c
        tok, n, done0 = st["tok"], st["n"], st["done"]
        # -- flush the pending token (pool_chunk's step-start semantics) --
        nw = jnp.minimum(n, m_max - 1)
        out = st["out"].at[idx, nw].set(
            jnp.where(done0, st["out"][idx, nw], tok)
        )
        bpos = jnp.minimum(st["gen_base"] + n, t - 1)
        buf = st["buf"].at[idx, bpos].set(
            jnp.where(done0, st["buf"][idx, bpos], tok)
        )
        done = jnp.logical_or(done0, is_eos(tok))
        kv_mask = st["kv_mask"].at[idx, bpos].set((~done).astype(jnp.int32))
        e = n + 1  # emitted tokens incl. the flush
        done = jnp.logical_or(done, e >= m_max)
        # -- draft + verify block ----------------------------------------
        start = st["gen_base"] - st["lengths"]  # first valid buf index
        draft = _ngram_draft(buf, start, st["gen_base"] + e, ngram, draft_len)
        tokens_in = jnp.concatenate([tok[:, None], draft], axis=1)  # [B, K+1]
        cur = st["gen_base"] + n  # pending token's cache slot
        slots = cur[:, None] + j_idx
        rope_pos = (st["lengths"] + n)[:, None] + j_idx
        cos, sin = rope_tables(rope_pos, cfg.hd, cfg.rope_theta)
        t_idx = jnp.arange(t)[None, None, :]
        allowed = (kv_mask[:, None, :] > 0) | (
            (t_idx >= cur[:, None, None]) & (t_idx <= slots[:, :, None])
        )
        h = embed(cfg, params, tokens_in)
        caches: Cache = []
        for li in range(cfg.num_hidden_layers):
            h, cch = _verify_layer(
                cfg, params["layers"][li], h, slots, allowed, cos, sin,
                st["caches"][li],
            )
            caches.append(cch)
        h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps, cfg.gemma)
        preds = jnp.argmax(_lm_logits(cfg, params, h), axis=-1).astype(jnp.int32)
        # -- greedy acceptance + per-row advance ---------------------------
        acc = jnp.sum(
            jnp.cumprod((draft == preds[:, :-1]).astype(jnp.int32), axis=1),
            axis=1,
        )
        first_eos = jnp.min(
            jnp.where(is_eos(preds), jnp.arange(k1)[None, :], k1), axis=1
        )
        # live rows always have room >= 1 (e >= m_max marked them done),
        # so m >= 1 and the pending token always advances for live rows;
        # m = first_eos + 1 keeps the EOS as the pending token so the next
        # flush records it exactly like pool_chunk does
        room = m_max - e
        adv = jnp.minimum(jnp.minimum(acc + 1, first_eos + 1), room)
        adv = jnp.where(done, 0, adv)
        # preds[:, :adv-1] are recorded now; preds[adv-1] becomes pending
        emit = j_idx < (adv - 1)[:, None]
        dst_out = jnp.where(emit, e[:, None] + j_idx, m_max)
        out = out.at[idx[:, None], dst_out].set(preds, mode="drop")
        dst_buf = jnp.where(emit, (st["gen_base"] + e)[:, None] + j_idx, t)
        buf = buf.at[idx[:, None], dst_buf].set(preds, mode="drop")
        # accepted drafts' KV (block slots cur+1 .. cur+adv-1) become valid
        kv_dst = jnp.where(emit, cur[:, None] + 1 + j_idx, t)
        kv_mask = kv_mask.at[idx[:, None], kv_dst].set(1, mode="drop")
        new_tok = preds[idx, jnp.maximum(adv - 1, 0)]
        tok = jnp.where(adv >= 1, new_tok, tok)
        n = n + adv
        st2 = dict(
            st, caches=caches, kv_mask=kv_mask, tok=tok, n=n, done=done,
            out=out, buf=buf,
        )
        return j + 1, st2

    _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return state


class _Tier:
    """One pool tier: slots sized ``bucket + max_new``."""

    def __init__(self, cfg, bucket: int, slots: int, max_new: int) -> None:
        self.bucket = bucket
        self.total_len = bucket + max_new
        self.slots = slots
        self.state = pool_init(cfg, slots, self.total_len, max_new)
        self.free: List[int] = list(range(slots))
        self.live: Dict[int, Any] = {}  # slot -> opaque request handle


class DecodePool:
    """Host-side slot bookkeeping around the jitted pool ops.

    Not thread-safe by design — the async driver
    (``generation.ContinuousBatchingLocalLLM``) serializes all calls, which
    also matches the hardware: one chip runs one dispatch at a time.

    ``tiers`` maps prompt-bucket -> slot count (e.g. ``[(2048, 2),
    (7680, 2)]``); ``None`` keeps the single-tier layout (``pool_size``
    slots at the largest bucket). Speculation follows the LLM's
    ``spec_tokens``/``spec_ngram`` (``tpu.local_llm_spec``), same as the
    batched path.
    """

    def __init__(
        self,
        llm,
        pool_size: int = 4,
        chunk_steps: int = 32,
        tiers: Optional[Sequence[Tuple[int, int]]] = None,
    ) -> None:
        if not llm.max_new_tokens:
            raise ValueError(
                "continuous batching needs tpu.local_llm_max_new set: the "
                "pool's output buffer is static per row"
            )
        self.llm = llm
        self.cfg: DecoderConfig = llm.cfg
        self.params = llm.params
        self.max_new = int(llm.max_new_tokens)
        self.chunk_steps = chunk_steps
        self.spec_tokens = int(getattr(llm, "spec_tokens", 0) or 0)
        self.spec_ngram = int(getattr(llm, "spec_ngram", 2) or 2)
        self.eos_ids = jnp.asarray(llm.eos_ids, jnp.int32)
        self.pad_id = llm.tokenizer.pad_token_id or llm.eos_ids[0]
        if tiers is None:
            tiers = [(llm.buckets[-1], pool_size)]
        bad = [b for b, _ in tiers if b not in llm.buckets]
        if bad:
            raise ValueError(
                f"pool tier buckets {bad} are not prompt buckets {llm.buckets}"
            )
        self.tiers = [
            _Tier(self.cfg, bucket, slots, self.max_new)
            for bucket, slots in sorted(tiers)
        ]
        self.pool_size = sum(t.slots for t in self.tiers)
        self.chunks = 0  # dispatched chunk count (observability/tests)
        self.joins = 0  # inserts that joined an already-live pool

    # -- admission ---------------------------------------------------------

    def can_admit(self, token_ids: Sequence[int]) -> bool:
        """True when some tier that fits this prompt has a free slot."""
        bucket = next(
            (b for b in self.llm.buckets if len(token_ids) <= b), None
        )
        if bucket is None:
            return False
        return any(t.bucket >= bucket and t.free for t in self.tiers)

    def insert(self, token_ids: Sequence[int], handle: Any) -> int:
        """Prefill + splice into a free slot; returns the flat slot index."""
        bucket = next(b for b in self.llm.buckets if len(token_ids) <= b)
        # smallest tier whose slots hold this prompt bucket, overflowing
        # to larger tiers when full
        tier = next(
            (t for t in self.tiers if t.bucket >= bucket and t.free), None
        )
        if tier is None:
            raise RuntimeError("decode pool full")
        return self._insert_into(tier, bucket, token_ids, handle)

    def _insert_into(self, tier: _Tier, bucket: int, token_ids, handle) -> int:
        slot = tier.free.pop()
        row, mask = _pad_left(list(token_ids), bucket, self.pad_id)
        ids = jnp.asarray([row], jnp.int32)
        mask_a = jnp.asarray([mask], jnp.int32)
        first, cache = prefill_only(self.cfg, self.params, ids, mask_a)
        if any(t.live for t in self.tiers):
            self.joins += 1
        tier.state = pool_insert(
            self.cfg,
            tier.state,
            jnp.int32(slot),
            cache,
            ids,
            mask_a,
            first[0],
            jnp.int32(len(token_ids)),
            jnp.int32(self.llm.eos_ids[0]),
        )
        tier.live[slot] = handle
        base = sum(t.slots for t in self.tiers[: self.tiers.index(tier)])
        return base + slot

    @property
    def active(self) -> bool:
        return any(t.live for t in self.tiers)

    @property
    def free(self) -> List[int]:
        """Flat free-slot view (back-compat observability: slot indices are
        offset by tier)."""
        out, base = [], 0
        for t in self.tiers:
            out.extend(base + s for s in t.free)
            base += t.slots
        return out

    @property
    def live(self) -> Dict[int, Any]:
        """Flat live view (flat slot index -> handle)."""
        out, base = {}, 0
        for t in self.tiers:
            out.update({base + s: h for s, h in t.live.items()})
            base += t.slots
        return out

    # -- decode ------------------------------------------------------------

    def run_chunk(self) -> List[Tuple[Any, List[int]]]:
        """One chunk dispatch per live tier; harvest finished rows as
        (handle, tokens)."""
        finished = []
        for tier in self.tiers:
            if not tier.live:
                continue
            if self.spec_tokens:
                tier.state = pool_chunk_spec(
                    self.cfg, self.params, tier.state, self.eos_ids,
                    self.chunk_steps, self.spec_tokens, self.spec_ngram,
                )
            else:
                tier.state = pool_chunk(
                    self.cfg, self.params, tier.state, self.eos_ids,
                    self.chunk_steps,
                )
            self.chunks += 1
            done = np.asarray(tier.state["done"])  # [B] — the sync point
            for slot in list(tier.live):
                if done[slot]:
                    toks = [int(x) for x in np.asarray(tier.state["out"][slot])]
                    finished.append((tier.live.pop(slot), toks))
                    tier.free.append(slot)
        return finished

    # -- lifecycle ---------------------------------------------------------

    def reset(self) -> None:
        for tier in self.tiers:
            tier.state = pool_init(
                self.cfg, tier.slots, tier.total_len, self.max_new
            )
            tier.free = list(range(tier.slots))
            tier.live = {}

    def warmup(self, buckets: Optional[Sequence[int]] = None) -> None:
        """Compile the per-(tier, bucket) prefill+insert pairs and each
        tier's chunk executable off the request path, then reset. The
        steady-state executable set is one chunk per tier + one
        (prefill, insert) per (tier, bucket) a request can land in.
        Inserts target the tier directly (the public ``insert`` routing
        would send small-bucket dummies to the small tier)."""
        for tier in self.tiers:
            cands = [
                b for b in (buckets or self.llm.buckets) if b <= tier.bucket
            ]
            for bucket in cands:
                bucket = next(b for b in self.llm.buckets if bucket <= b)
                if not tier.free:
                    # fewer slots than buckets: drain, keep compiling
                    self.run_chunk()
                    tier.free, tier.live = list(range(tier.slots)), {}
                # pad_id is always a valid token (an EOS id may be a
                # sentinel, e.g. the bench's never-fires -1)
                self._insert_into(tier, bucket, [self.pad_id] * bucket, None)
            self.run_chunk()
        self.reset()
