"""Device-resident generation runtime.

Replaces the reference's per-token llama_decode ctypes loop
(asr.py:141-165) with jitted programs:

- `Generator.prefill` — one causal prefill over the (bucketed) prompt
  embedding sequence, sampling the first token on device;
- `Generator.decode_block` — K decode steps in one `lax.scan`, with
  on-device sampling and EOS latching, so the host syncs once per K tokens
  instead of once per token.

Buckets: prompt lengths are padded up to multiples of `bucket` so XLA
compiles a handful of shapes, not one per utterance (SURVEY.md §7
"variable-length audio vs XLA static shapes").

The KV cache is donated through both calls — it lives in HBM and is updated
in place across the whole chunk decode.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models import decoder as dec
from ..models.configs import TextDecoderConfig
from ..ops.sampling import sample_greedy, sample_topk_topp


@dataclasses.dataclass
class GenState:
    """Host-side handle on an in-flight generation."""

    cache: Any
    pos: int  # tokens already in cache
    last_token: jax.Array  # sampled but not yet fed
    key: jax.Array
    done: jax.Array  # bool scalar on device


def round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


class Generator:
    def __init__(
        self,
        params: dict,
        cfg: TextDecoderConfig,
        *,
        n_ctx: int = 2048,
        eos_ids: tuple[int, ...] = (151645, 151643),
        cache_dtype=jnp.bfloat16,
        bucket: int = 128,
        block: int = 64,
    ):
        self.params = params
        self.cfg = cfg
        self.n_ctx = n_ctx
        self.eos_ids = jnp.asarray(list(eos_ids), dtype=jnp.int32)
        self.cache_dtype = cache_dtype
        self.bucket = bucket
        self.block = block
        self._prefill_jit = self._build_prefill()
        self._block_jit = self._build_block()

    # -- jitted programs ---------------------------------------------------

    def _build_prefill(self) -> Callable:
        cfg = self.cfg

        @partial(jax.jit, static_argnames=("greedy",), donate_argnames=("cache",))
        def prefill(params, embd, length, cache, key, temperature, greedy: bool):
            hidden, cache = dec.forward_prefill(params, cfg, embd, cache, length=length)
            last_hidden = jax.lax.dynamic_index_in_dim(hidden, length - 1, axis=0, keepdims=False)
            logits = dec.lm_logits(params, last_hidden)
            if greedy:
                tok = sample_greedy(logits)
            else:
                key, sub = jax.random.split(key)
                tok = sample_topk_topp(logits, sub, temperature)
            return cache, tok.astype(jnp.int32), key

        return prefill

    def _build_block(self) -> Callable:
        cfg = self.cfg
        eos = self.eos_ids
        block = self.block

        @partial(jax.jit, static_argnames=("greedy",), donate_argnames=("cache",))
        def decode_block(params, cache, pos0, tok0, key, temperature, done0, greedy: bool):
            def step(carry, _):
                cache, pos, tok, key, done = carry
                embd = dec.embed_tokens(params, tok)
                hidden, cache = dec.forward_step(params, cfg, embd, cache, pos)
                logits = dec.lm_logits(params, hidden)
                if greedy:
                    nxt = sample_greedy(logits).astype(jnp.int32)
                else:
                    key, sub = jax.random.split(key)
                    nxt = sample_topk_topp(logits, sub, temperature).astype(jnp.int32)
                emitted = jnp.where(done, -1, tok)
                nxt_done = done | jnp.any(nxt == eos)
                nxt = jnp.where(done, tok, nxt)
                return (cache, pos + 1, nxt, key, nxt_done), emitted

            (cache, pos, tok, key, done), emitted = jax.lax.scan(
                step, (cache, pos0, tok0, key, done0), None, length=block
            )
            return cache, pos, tok, key, done, emitted

        return decode_block

    # -- host API ----------------------------------------------------------

    def new_cache(self):
        return dec.init_cache(self.cfg, self.n_ctx, dtype=self.cache_dtype)

    def start(
        self,
        embd: np.ndarray,  # [T, D] prompt embeddings (f32)
        *,
        temperature: float = 0.4,
        seed: int | None = None,
        cache=None,
    ) -> GenState:
        """Prefill the prompt and sample the first token."""
        t = embd.shape[0]
        if t > self.n_ctx:
            raise ValueError(f"prompt of {t} tokens exceeds n_ctx={self.n_ctx}")
        padded_len = min(round_up(t, self.bucket), self.n_ctx)
        pad = padded_len - t
        if pad:
            embd = np.concatenate([embd, np.zeros((pad, embd.shape[1]), embd.dtype)], axis=0)
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        key = jax.random.key(seed)
        cache = cache if cache is not None else self.new_cache()
        greedy = temperature <= 0.0
        cache, tok, key = self._prefill_jit(
            self.params,
            jnp.asarray(embd),
            jnp.int32(t),
            cache,
            key,
            jnp.float32(max(temperature, 1e-6)),
            greedy,
        )
        # the prefill-sampled token may itself be EOS (reference checks EOS
        # before feeding, asr.py:142)
        done = jnp.any(tok == self.eos_ids)
        return GenState(cache=cache, pos=t, last_token=tok, key=key, done=done)

    def decode_block(self, state: GenState, temperature: float = 0.4) -> tuple[list[int], GenState, bool]:
        """Run up to `block` steps; returns (emitted_tokens, state, finished).

        `emitted_tokens` excludes EOS (mirrors reference asr.py:141-148:
        tokens are emitted after surviving the EOS check).
        """
        greedy = temperature <= 0.0
        if state.pos + self.block > self.n_ctx:
            return [], state, True  # context full
        cache, pos, tok, key, done, emitted = self._block_jit(
            self.params,
            state.cache,
            jnp.int32(state.pos),
            state.last_token,
            state.key,
            jnp.float32(max(temperature, 1e-6)),
            state.done,
            greedy,
        )
        emitted = np.asarray(emitted)
        toks = [int(t) for t in emitted if t >= 0]
        finished = bool(np.asarray(done))
        new_state = GenState(cache=cache, pos=int(pos), last_token=tok, key=key, done=done)
        return toks, new_state, finished


class SparseLogitsRunner:
    """Single-prefill sparse-logits readout for the forced aligner.

    One causal prefill; logits are computed only at the requested positions
    (reference aligner.py:307-323: batch.logits[ts_pos]=1 then
    get_logits_ith + argmax over the timestamp classes).
    """

    def __init__(self, params: dict, cfg: TextDecoderConfig, *, n_ctx: int = 2048,
                 cache_dtype=jnp.bfloat16, bucket: int = 128):
        self.params = params
        self.cfg = cfg
        self.n_ctx = n_ctx
        self.cache_dtype = cache_dtype
        self.bucket = bucket

        @partial(jax.jit, static_argnames=("n_positions",))
        def run(params, embd, length, positions, n_positions: int):
            cache = dec.init_cache(cfg, embd.shape[0], dtype=cache_dtype)
            hidden, _ = dec.forward_prefill(params, cfg, embd, cache, length=length)
            sel = jnp.take(hidden, positions, axis=0)  # [n_positions, D]
            return dec.lm_logits(params, sel)

        self._run = run

    def logits_at(self, embd: np.ndarray, positions: np.ndarray) -> np.ndarray:
        t = embd.shape[0]
        padded_len = round_up(t, self.bucket)
        pad = padded_len - t
        if pad:
            embd = np.concatenate([embd, np.zeros((pad, embd.shape[1]), embd.dtype)], axis=0)
        n_pos = round_up(max(len(positions), 1), 64)
        pos_padded = np.zeros(n_pos, dtype=np.int32)
        pos_padded[: len(positions)] = positions
        out = self._run(self.params, jnp.asarray(embd), jnp.int32(t), jnp.asarray(pos_padded), n_pos)
        return np.asarray(out)[: len(positions)]
