"""Batched multi-request decoding.

The reference's llama.cpp path supports multi-sequence KV (n_seq_max,
llama.py:57) but never uses it; its server handles requests sequentially
(serve_openai_gguf.py — async handlers call the blocking engine). The
upstream tech report benchmarks concurrency through vLLM instead
(BASELINE.md: 0.6B at 128 concurrent = 1136 s-audio/s).

TPU-native equivalent: `vmap` the prefill and the K-step decode block over
a request batch — one program, B KV caches, per-row positions/EOS latches.
Short utterances (<= one chunk) batch together; longer ones fall back to
the sequential chunk pipeline.
"""

from __future__ import annotations

import time
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..schema import TranscribeResult
from ..models import decoder as dec
from ..ops.sampling import sample_greedy, sample_topk_topp
from .generate import round_up

SAMPLE_RATE = 16_000


class BatchedGenerator:
    """vmapped prefill + block decode over a fixed batch width."""

    def __init__(self, params, cfg, *, n_ctx: int, eos_ids, block: int = 32,
                 cache_dtype=jnp.bfloat16):
        self.params = params
        self.cfg = cfg
        self.n_ctx = n_ctx
        self.block = block
        self.cache_dtype = cache_dtype
        self.eos_ids = jnp.asarray(list(eos_ids), dtype=jnp.int32)
        eos = self.eos_ids
        # pre-unstacked per-layer weights for the unrolled decode step
        # (decoder.unstack_layers: scan/slice over stacked weights copies)
        self.layers_list = jax.jit(
            lambda ls: dec.unstack_layers(ls, cfg.num_layers)
        )(params["layers"])

        def prefill_one(params, ids, mask, audio, length, cache, key, temperature, greedy: bool):
            embd = dec.splice_prompt(params, ids, mask, audio)
            hidden, cache = dec.forward_prefill(params, cfg, embd, cache, length=length)
            last = jax.lax.dynamic_index_in_dim(hidden, length - 1, axis=0, keepdims=False)
            logits = dec.lm_logits(params, last, cfg.lm_head_dim)
            if greedy:
                tok = sample_greedy(logits)
            else:
                key, sub = jax.random.split(key)
                tok = sample_topk_topp(logits, sub, temperature)
            return cache, tok.astype(jnp.int32), key

        @partial(jax.jit, static_argnames=("greedy",), donate_argnames=("caches",))
        def prefill_batch(params, ids, masks, audio, lengths, caches, keys, temperature, greedy: bool):
            return jax.vmap(
                lambda i, m, a, l, c, k: prefill_one(params, i, m, a, l, c, k, temperature, greedy)
            )(ids, masks, audio, lengths, caches, keys)

        def step_one(params, layers_list, cache, pos, tok, key, done, temperature, greedy: bool):
            embd = dec.embed_tokens(params, tok)
            hidden, cache = dec.forward_step_layers(
                layers_list, params["final_norm"], cfg, embd, cache, pos
            )
            logits = dec.lm_logits(params, hidden, cfg.lm_head_dim)
            if greedy:
                nxt = sample_greedy(logits).astype(jnp.int32)
            else:
                key, sub = jax.random.split(key)
                nxt = sample_topk_topp(logits, sub, temperature).astype(jnp.int32)
            emitted = jnp.where(done, -1, tok)
            nxt_done = done | jnp.any(nxt == eos)
            nxt = jnp.where(done, tok, nxt)
            return cache, pos + 1, nxt, key, nxt_done, emitted

        block_n = block

        @partial(jax.jit, static_argnames=("greedy",), donate_argnames=("caches",))
        def decode_block_batch(params, layers_list, caches, poss, toks, keys, dones,
                               temperature, greedy: bool):
            def scan_body(carry, _):
                caches, poss, toks, keys, dones = carry
                caches, poss, toks, keys, dones, emitted = jax.vmap(
                    lambda c, p, t, k, d: step_one(
                        params, layers_list, c, p, t, k, d, temperature, greedy
                    )
                )(caches, poss, toks, keys, dones)
                return (caches, poss, toks, keys, dones), emitted

            (caches, poss, toks, keys, dones), emitted = jax.lax.scan(
                scan_body, (caches, poss, toks, keys, dones), None, length=block_n
            )
            packed = jnp.concatenate(
                [emitted.T, dones.astype(jnp.int32)[:, None]], axis=1
            )  # [B, block+1]
            return caches, poss, toks, keys, dones, packed

        self._prefill = prefill_batch
        self._decode = decode_block_batch

    def generate(
        self,
        ids_list: Sequence[np.ndarray],
        masks_list: Sequence[np.ndarray],
        audio_embds: Sequence[jax.Array],  # [Ta_i, D] device arrays
        *,
        temperature: float = 0.4,
        max_new_tokens: int = 512,
        seed: Optional[int] = None,
    ) -> List[List[int]]:
        """Decode a batch of spliced prompts; returns emitted tokens per row."""
        b = len(ids_list)
        t_max = round_up(max(len(i) for i in ids_list), 128)
        ta_max = max(int(a.shape[0]) for a in audio_embds)
        d = int(audio_embds[0].shape[1])

        ids = np.zeros((b, t_max), np.int32)
        masks = np.zeros((b, t_max), bool)
        lengths = np.zeros(b, np.int32)
        for r, (i, m) in enumerate(zip(ids_list, masks_list)):
            ids[r, : len(i)] = i
            masks[r, : len(m)] = m
            lengths[r] = len(i)
        audio = jnp.stack([
            jnp.pad(a, ((0, ta_max - a.shape[0]), (0, 0))) for a in audio_embds
        ])

        caches = jax.jit(
            jax.vmap(lambda _: dec.init_cache(self.cfg, self.n_ctx, self.cache_dtype))
        )(jnp.arange(b))
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        keys = jax.vmap(jax.random.key)(jnp.arange(seed, seed + b, dtype=jnp.uint32))
        greedy = temperature <= 0.0

        caches, toks, keys = self._prefill(
            self.params, jnp.asarray(ids), jnp.asarray(masks), audio,
            jnp.asarray(lengths), caches, keys,
            jnp.float32(max(temperature, 1e-6)), greedy,
        )
        dones = jnp.any(toks[:, None] == self.eos_ids[None, :], axis=1)
        poss = jnp.asarray(lengths)

        out: List[List[int]] = [[] for _ in range(b)]
        steps = 0
        while steps < max_new_tokens:
            if int(np.max(np.asarray(poss))) + self.block > self.n_ctx:
                break
            caches, poss, toks, keys, dones, packed = self._decode(
                self.params, self.layers_list, caches, poss, toks, keys, dones,
                jnp.float32(max(temperature, 1e-6)), greedy,
            )
            packed = np.asarray(packed)  # one fetch per block
            for r in range(b):
                out[r].extend(int(t) for t in packed[r, :-1] if t >= 0)
            steps += self.block
            if packed[:, -1].all():
                break
        return [row[:max_new_tokens] for row in out]


class BatchedEngine:
    """Offline batch transcription over a shared engine's weights.

    Single-chunk utterances (<= engine chunk_size) run as ONE batched
    program; longer inputs fall back to the sequential pipeline.
    """

    def __init__(self, engine, *, block: int = 32):
        self.engine = engine
        # int4 engines expose bf16 prefill_params: the int4 matvec kernel is
        # single-stream, so batched programs run dense bf16 (one weight
        # stream amortized over the batch) instead of falling back to
        # per-step dense-dequant of the packed containers
        params = engine.generator.prefill_params
        self.gen = BatchedGenerator(
            params, engine.dec_cfg,
            n_ctx=engine.config.n_ctx,
            eos_ids=engine.thinker.eos_token_ids,
            block=block,
            cache_dtype=engine.generator.cache_dtype,
        )

    def transcribe_batch(
        self,
        audios: Sequence[np.ndarray],
        *,
        context: str = "",
        language: Optional[str] = None,
        temperature: float = 0.0,
        max_new_tokens: Optional[int] = None,
    ) -> List[TranscribeResult]:
        eng = self.engine
        chunk_samples = int(eng.config.chunk_size * SAMPLE_RATE)
        max_new = max_new_tokens or eng.config.max_new_tokens

        t0 = time.time()
        short_idx = [i for i, a in enumerate(audios) if len(a) <= chunk_samples]
        long_idx = [i for i in range(len(audios)) if i not in short_idx]
        results: List[Optional[TranscribeResult]] = [None] * len(audios)

        if short_idx:
            ids_list, mask_list, embds = [], [], []
            for i in short_idx:
                a = audios[i]
                n_valid = eng.encoder.valid_tokens(len(a))  # real frames only
                if len(a) < chunk_samples:
                    a = np.pad(a, (0, chunk_samples - len(a)))
                fut = eng.encoder.encode_async(a)
                # device slice stays at the fixed full-chunk shape; the mask
                # gathers only the first n_valid rows (engine.asr semantics)
                embds.append(fut[: eng.encoder.valid_tokens(chunk_samples)])
                ids, mask = eng._build_prompt_ids(n_valid, "", context, language)
                ids_list.append(ids)
                mask_list.append(mask)
            token_rows = self.gen.generate(
                ids_list, mask_list, embds,
                temperature=temperature, max_new_tokens=max_new,
            )
            for i, toks in zip(short_idx, token_rows):
                text = eng.model.decode(toks)
                results[i] = TranscribeResult(text=text, performance={
                    "batched": True, "n_generate": len(toks),
                })

        for i in long_idx:
            results[i] = eng.asr(
                audios[i], context=context, language=language,
                chunk_size_sec=eng.config.chunk_size,
                memory_chunks=eng.config.memory_num,
                temperature=temperature,
            )

        wall = time.time() - t0
        total_audio = sum(len(a) for a in audios) / SAMPLE_RATE
        for r in results:
            if r and r.performance is not None:
                r.performance.setdefault("batch_wall_s", round(wall, 3))
                r.performance.setdefault("batch_audio_s", round(total_audio, 2))
        return results  # type: ignore[return-value]
