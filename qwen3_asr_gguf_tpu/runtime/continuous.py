"""Continuous batching: per-request admission into free rows of a
persistent batched decode loop.

The round-1 MicroBatcher coalesced same-temperature requests into fixed
windows (all rows start and finish together — late arrivals wait a full
generation). Here a worker thread keeps ONE batched decode program running
and admits each request into any free KV-cache row as soon as one exists
(vLLM-style continuous batching — the upstream stack's concurrency model,
BASELINE.md 128-stream rows), with per-row temperature/greedy sampling.

Device programs:
  - `_prefill_row`: single-sequence spliced prefill written into row r of
    the batched caches (donated; one compile per prompt-length bucket);
  - `_decode_block`: K vmapped steps over all B rows with per-row
    position/temperature/EOS latch; ONE small host fetch per block.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..schema import TranscribeResult
from ..models import decoder as dec
from ..ops.sampling import sample_greedy, sample_topk_topp
from .generate import round_up

SAMPLE_RATE = 16_000


@dataclass
class _Request:
    audio: np.ndarray
    context: str
    language: Optional[str]
    temperature: float
    done_evt: threading.Event = field(default_factory=threading.Event)
    result: Optional[TranscribeResult] = None
    error: Optional[Exception] = None
    submitted_at: float = field(default_factory=time.time)


@dataclass
class _Row:
    req: Optional[_Request] = None
    tokens: List[int] = field(default_factory=list)
    pos: int = 0
    started_at: float = 0.0


class ContinuousBatcher:
    def __init__(self, engine, *, max_batch: int = 8, block: int = 16,
                 max_new_tokens: Optional[int] = None):
        self.engine = engine
        self.cfg = engine.dec_cfg
        self.params = engine.generator.params
        self.n_ctx = engine.config.n_ctx
        self.b = max_batch
        self.block = block
        self.max_new_tokens = max_new_tokens or engine.config.max_new_tokens
        self.eos_ids = jnp.asarray(list(engine.thinker.eos_token_ids), dtype=jnp.int32)
        self.chunk_samples = int(engine.config.chunk_size * SAMPLE_RATE)
        self.layers_list = engine.generator.layers_list  # pre-unstacked weights

        self._build_programs()

        # device state
        self.caches = jax.jit(
            jax.vmap(lambda _: dec.init_cache(self.cfg, self.n_ctx, jnp.bfloat16))
        )(jnp.arange(self.b))
        self.toks = jnp.zeros((self.b,), jnp.int32)
        self.keys = jax.vmap(jax.random.key)(np.arange(self.b, dtype=np.uint32))
        # host mirrors
        self.rows = [_Row() for _ in range(self.b)]
        self.poss = np.zeros(self.b, np.int32)
        self.temps = np.full(self.b, 1e-6, np.float32)
        self.greedy = np.ones(self.b, bool)
        self.dones = np.ones(self.b, bool)  # free rows stay "done"

        self._pending: List[_Request] = []
        self._lock = threading.Lock()
        self._work = threading.Event()
        self._stop = False
        self.n_admitted = 0
        self.n_completed = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- device programs -----------------------------------------------------

    def _build_programs(self) -> None:
        cfg = self.cfg
        eos = self.eos_ids
        block_n = self.block

        @partial(jax.jit, donate_argnames=("caches",))
        def prefill_row(params, ids, mask, audio, length, row, caches, key, temperature, greedy):
            embd = dec.splice_prompt(params, ids, mask, audio)
            cache = dec.init_cache(cfg, self.n_ctx, jnp.bfloat16)
            hidden, cache = dec.forward_prefill(params, cfg, embd, cache, length=length)
            last = jax.lax.dynamic_index_in_dim(hidden, length - 1, axis=0, keepdims=False)
            logits = dec.lm_logits(params, last, cfg.lm_head_dim)
            key, sub = jax.random.split(key)
            tok = jnp.where(
                greedy,
                sample_greedy(logits).astype(jnp.int32),
                sample_topk_topp(logits, sub, temperature).astype(jnp.int32),
            )
            caches = jax.tree.map(
                lambda cs, c: jax.lax.dynamic_update_index_in_dim(
                    cs, c.astype(cs.dtype), row, 0
                ),
                caches, cache,
            )
            return caches, tok, key

        def step_one(params, layers_list, cache, pos, tok, key, done, temp, greedy, attn_window):
            embd = dec.embed_tokens(params, tok)
            hidden, cache = dec.forward_step_layers(
                layers_list, params["final_norm"], cfg, embd, cache, pos,
                attn_window=attn_window,
            )
            logits = dec.lm_logits(params, hidden, cfg.lm_head_dim)
            key, sub = jax.random.split(key)
            nxt = jnp.where(
                greedy,
                sample_greedy(logits).astype(jnp.int32),
                sample_topk_topp(logits, sub, temp).astype(jnp.int32),
            )
            emitted = jnp.where(done, -1, tok)
            nxt_done = done | jnp.any(nxt == eos)
            nxt = jnp.where(done, tok, nxt)
            return cache, pos + 1, nxt, key, nxt_done, emitted

        @partial(jax.jit, static_argnames=("attn_window",), donate_argnames=("caches",))
        def decode_block(params, layers_list, caches, poss, toks, keys, dones, temps,
                         greedys, attn_window: int):
            def scan_body(carry, _):
                caches, poss, toks, keys, dones = carry
                caches, poss, toks, keys, dones, emitted = jax.vmap(
                    lambda c, p, t, k, d, tmp, g: step_one(
                        params, layers_list, c, p, t, k, d, tmp, g, attn_window
                    )
                )(caches, poss, toks, keys, dones, temps, greedys)
                return (caches, poss, toks, keys, dones), emitted

            (caches, poss, toks, keys, dones), emitted = jax.lax.scan(
                scan_body, (caches, poss, toks, keys, dones), None, length=block_n
            )
            packed = jnp.concatenate(
                [emitted.T, dones.astype(jnp.int32)[:, None]], axis=1
            )  # [B, block+1]
            return caches, toks, keys, packed

        @jax.jit
        def set_tok(toks, row, tok):
            return toks.at[row].set(tok)

        @jax.jit
        def set_key(keys, row, key):
            return keys.at[row].set(key)

        self._prefill_row = prefill_row
        self._decode_block = decode_block
        self._set_tok = set_tok
        self._set_key = set_key

    # -- public API ------------------------------------------------------------

    def eligible(self, audio: np.ndarray) -> bool:
        return len(audio) <= self.chunk_samples

    def submit(
        self,
        audio: np.ndarray,
        *,
        context: str = "",
        language: Optional[str] = None,
        temperature: float = 0.0,
        timeout: float = 600.0,
    ) -> TranscribeResult:
        req = _Request(audio=audio, context=context, language=language,
                       temperature=temperature)
        with self._lock:
            self._pending.append(req)
        self._work.set()
        if not req.done_evt.wait(timeout):
            raise TimeoutError("transcription timed out in continuous batch queue")
        if req.error is not None:
            raise req.error
        assert req.result is not None
        return req.result

    def close(self) -> None:
        self._stop = True
        self._work.set()
        self._thread.join(timeout=5.0)

    @property
    def stats(self) -> dict:
        return {
            "admitted": self.n_admitted,
            "completed": self.n_completed,
            "active_rows": sum(1 for r in self.rows if r.req is not None),
            "queued": len(self._pending),
        }

    # -- worker ------------------------------------------------------------------

    def _admit(self, row_idx: int, req: _Request) -> None:
        eng = self.engine
        a = req.audio
        n_valid = eng.encoder.valid_tokens(len(a))
        if len(a) < self.chunk_samples:
            a = np.pad(a, (0, self.chunk_samples - len(a)))
        embd = eng.encoder.encode_async(a)[: eng.encoder.valid_tokens(self.chunk_samples)]
        ids, mask = eng._build_prompt_ids(n_valid, "", req.context, req.language)
        t = len(ids)
        padded = min(round_up(t, 128), self.n_ctx)
        ids_p = np.zeros(padded, np.int32)
        ids_p[:t] = ids
        mask_p = np.zeros(padded, bool)
        mask_p[:t] = mask

        greedy = req.temperature <= 0.0
        key = jax.random.key(int(np.random.randint(0, 2**31 - 1)))
        self.caches, tok, key = self._prefill_row(
            self.params, jnp.asarray(ids_p), jnp.asarray(mask_p), embd,
            jnp.int32(t), jnp.int32(row_idx), self.caches, key,
            jnp.float32(max(req.temperature, 1e-6)), jnp.asarray(greedy),
        )
        self.toks = self._set_tok(self.toks, jnp.int32(row_idx), tok)
        self.keys = self._set_key(self.keys, jnp.int32(row_idx), key)
        row = self.rows[row_idx]
        row.req = req
        row.tokens = []
        row.pos = t
        row.started_at = time.time()
        self.poss[row_idx] = t
        self.temps[row_idx] = max(req.temperature, 1e-6)
        self.greedy[row_idx] = greedy
        self.dones[row_idx] = False
        self.n_admitted += 1

    def _retire(self, row_idx: int) -> None:
        row = self.rows[row_idx]
        req = row.req
        assert req is not None
        eng = self.engine
        eos = set(int(e) for e in np.asarray(self.eos_ids))
        toks = [t for t in row.tokens[: self.max_new_tokens] if t not in eos]
        text = eng.model.decode(toks)
        req.result = TranscribeResult(
            text=text,
            performance={
                "batched": "continuous",
                "n_generate": len(row.tokens),
                "latency_s": time.time() - req.submitted_at,
            },
        )
        req.done_evt.set()
        row.req = None
        self.dones[row_idx] = True
        self.n_completed += 1

    def _loop(self) -> None:
        while not self._stop:
            # admit pending requests into free rows
            while True:
                with self._lock:
                    free = [i for i, r in enumerate(self.rows) if r.req is None]
                    if not free or not self._pending:
                        break
                    req = self._pending.pop(0)
                row_idx = free[0]
                try:
                    self._admit(row_idx, req)
                except Exception as e:
                    req.error = e
                    req.done_evt.set()

            active = [i for i, r in enumerate(self.rows) if r.req is not None]
            if not active:
                with self._lock:
                    if not self._pending:
                        self._work.clear()
                self._work.wait(timeout=0.5)
                continue

            # bucket the attention window to the deepest active row (256-slot
            # steps -> at most n_ctx/256 compiled variants)
            win = min(
                self.n_ctx,
                round_up(int(max(self.poss[i] for i in active)) + self.block, 256),
            )
            self.caches, self.toks, self.keys, packed = self._decode_block(
                self.params, self.layers_list, self.caches, jnp.asarray(self.poss),
                self.toks, self.keys, jnp.asarray(self.dones),
                jnp.asarray(self.temps), jnp.asarray(self.greedy), win,
            )
            packed = np.asarray(packed)  # ONE fetch per block
            for i in active:
                self.poss[i] += self.block
            for i in active:
                row = self.rows[i]
                row.tokens.extend(int(t) for t in packed[i, :-1] if t >= 0)
                finished = bool(packed[i, -1])
                out_of_budget = (
                    len(row.tokens) >= self.max_new_tokens
                    or row.pos + len(row.tokens) + self.block >= self.n_ctx
                )
                if finished or out_of_budget:
                    self.dones[i] = True
                    self._retire(i)
