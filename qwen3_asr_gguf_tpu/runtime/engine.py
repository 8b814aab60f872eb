"""QwenASREngine — the streaming chunked transcription engine.

TPU-native rebuild of the reference engine (qwen_asr_gguf/inference/
asr.py:27-404). Same semantics:

- fixed `chunk_size`-second chunks with a `memory_num`-chunk deque of
  (audio embeddings, text) carried as prompt prefix;
- chat-protocol prompt assembled from the embedding table:
  [im_start]system ctx[im_end][im_start]user\\n[audio_start] AUDIO
  [audio_end][im_end][im_start]assistant\\n(language X)[asr_text] prefix;
- rollback tokens: the last `rollback_num` generated tokens of every
  non-final chunk are dropped (display_queue semantics, asr.py:148-154);
- repetition circuit breaker (<=3 distinct in last 15 stable tokens) with
  temperature-escalation retry (<=4 attempts, +0.3 each);
- 3-stage overlap encode(i+1) | decode(i) | align(i-1): the reference's
  helper process + queues (asr_worker.py) become async device dispatch —
  encoding for chunk i+1 is enqueued on-device before chunk i's decode
  blocks, and the host only synchronizes when it consumes results.

Mechanism differences (TPU-first): no subprocesses, no ONNX/llama.cpp —
one JAX process owns encoder, decoder and aligner programs on the chip.
"""

from __future__ import annotations

import dataclasses
import os
import re
import threading
import time
from codecs import getincrementaldecoder
from collections import deque
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..schema import (
    ASREngineConfig,
    DecodeResult,
    ForcedAlignItem,
    ForcedAlignResult,
    TranscribeResult,
)
from ..utils.languages import normalize_language_name, validate_language
from ..models import params as P
from .encoder_runner import EncoderRunner
from .generate import Generator
from .. import logger

SAMPLE_RATE = 16_000
_PUNCT_NEWLINE = re.compile(r"([，。？！：,\.])")


@dataclasses.dataclass
class _Segment:
    """Chunk bookkeeping (reference ASRS_Segment, asr.py:18-25)."""

    idx: int
    audio_start: float
    audio_end: float
    text: str = ""
    lang: str = ""  # language detected for this chunk (auto mode)
    items: Optional[List[ForcedAlignItem]] = None


class QwenASREngine:
    def __init__(self, config: ASREngineConfig):
        from .. import enable_compilation_cache

        enable_compilation_cache()
        t_init = time.time()
        self.config = config
        self.verbose = config.verbose
        model_dir = config.model_dir
        logger.info("engine init: model_dir=%s precision=%s n_ctx=%d",
                    model_dir, config.precision, config.n_ctx)

        thinker = P.load_thinker_config(model_dir)
        self.thinker = thinker

        # decoder meta (config + 152k-token BPE) FIRST, while no other
        # thread contends for the GIL: the same unpickle measured 0.18 s
        # here vs 1.4 s raced against the encoder bring-up below
        _dec_precision_early = config.precision
        if config.mesh_shape and _dec_precision_early == "int4":
            from ..parallel.sharding import int4_tp_supported

            if not int4_tp_supported(
                thinker.text, int(dict(config.mesh_shape).get("model", 1))
            ):
                _dec_precision_early = "int8"  # mirrors the mesh remap below
        dec_meta = P.load_decoder_meta(
            os.path.join(model_dir, config.llm_fn), _dec_precision_early
        )
        logger.info("engine init: decoder meta %s at +%.2fs",
                    "hit" if dec_meta is not None else "miss",
                    time.time() - t_init)

        # encoder ----------------------------------------------------------
        # brought up on a worker thread: its host-side safetensors/sidecar
        # load and device upload overlap the decoder load below (the two are
        # independent; JAX dispatch is thread-safe). Joined before init
        # returns — `self.encoder` is always set afterwards.
        import threading

        if config.precision in ("int4", "q4_k"):
            # pallas imports cost ~1 s; warm them while the GGUF header loads
            threading.Thread(
                target=lambda: __import__("qwen3_asr_gguf_tpu.ops.pallas_q4k"),
                daemon=True,
            ).start()

        enc_path = os.path.join(model_dir, config.encoder_fn)
        mel_path = os.path.join(model_dir, "mel_filters.npy")
        enc_box: dict = {}

        def _encoder_up():
            try:
                if config.precision == "int8":
                    # per-channel int8 rung of the reference's encoder
                    # precision ladder (04-Quantize-ASR-Encoder.py
                    # quantize_dynamic stage)
                    enc_cfg, enc_params = P.load_encoder_quantized(enc_path, kind="int8")
                elif config.precision in ("q4_k", "int4"):
                    enc_cfg, enc_params = P.load_encoder_quantized(enc_path, kind="int4")
                elif config.precision in ("bf16", "f16"):
                    # half-precision rung (reference ships an fp16 encoder):
                    # f16 on the wire (half the upload), bf16 on device
                    enc_cfg, enc_params = P.load_encoder_safetensors(enc_path, as_numpy=True)
                    enc_params = jax.tree.map(
                        lambda a: a.astype(np.float16)
                        if getattr(a, "dtype", None) == np.float32 else a,
                        enc_params,
                    )
                else:
                    enc_cfg, enc_params = P.load_encoder_safetensors(enc_path, as_numpy=True)
                enc_box["runner"] = EncoderRunner(
                    enc_params, enc_cfg,
                    mel_filters=np.load(mel_path) if os.path.exists(mel_path) else None,
                    warmup_sec=config.chunk_size if self.verbose else 0.0,
                )
                enc_box["cfg"] = enc_cfg
                logger.info("engine init: encoder up at +%.2fs", time.time() - t_init)
            except BaseException as e:
                enc_box["error"] = e

        enc_thread = threading.Thread(target=_encoder_up, daemon=True)
        enc_thread.start()

        # decoder ----------------------------------------------------------
        # multi-chip inference: mesh_shape (e.g. {"model": 8}) TP-shards the
        # decoder over a jax.sharding.Mesh. int4 remaps to int8 under TP —
        # the packed int4 kernel is a single-chip matvec; int8 rides the
        # MXU path that XLA SPMD partitions.
        mesh = None
        dec_precision = config.precision
        if config.mesh_shape:
            from ..parallel.sharding import int4_tp_supported, make_mesh

            mesh = make_mesh(dict(config.mesh_shape))
            if dec_precision == "int4":
                if int4_tp_supported(
                    thinker.text, int(dict(config.mesh_shape).get("model", 1))
                ):
                    # packed int4 TP: shard_map decode over Megatron tiles
                    # (generate._build_tp_step) keeps the headline precision
                    logger.info("mesh inference: packed int4 TP decode")
                else:
                    logger.info("mesh inference: decoder precision int4 -> int8 "
                                "(geometry not TP-divisible)")
                    dec_precision = "int8"
        try:
            dec_cfg, dec_params, tokenizer = P.load_decoder_gguf(
                os.path.join(model_dir, config.llm_fn),
                precision=dec_precision,
                meta=dec_meta,
            )
        except BaseException:
            # the encoder bring-up thread is mid-flight; joining it before
            # propagating keeps the failure a clean Python exception (a
            # daemon thread still tracing JAX at interpreter teardown
            # aborts the whole process)
            enc_thread.join()
            raise
        logger.info("engine init: decoder loaded at +%.2fs", time.time() - t_init)
        if mesh is None:
            # one qkv / gateup stream per layer (single-chip HBM optimization;
            # a fused row split would cross shard boundaries under TP)
            dec_params = P.fuse_layer_weights(dec_params)
        self.dec_cfg = dec_cfg
        self.model = tokenizer  # tokenizer exposes the reference LlamaModel text API
        kv_dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8, "f32": jnp.float32}[
            config.kv_cache_dtype if config.precision != "f32" else "f32"
        ]
        # int4: prefill runs through a one-time bf16 dequant of the layer
        # weights (prefill is MXU-bound; per-call dense-dequant of the int4
        # containers cost ~50-80 ms per chunk), decode keeps streaming 4-bit.
        # The dequant is derived lazily at first prefill (Generator
        # property) so init stays load-and-go.
        self.generator = Generator(
            dec_params, dec_cfg,
            n_ctx=config.n_ctx,
            eos_ids=thinker.eos_token_ids,
            block=config.decode_block,
            cache_dtype=kv_dtype,
            dequant_prefill=dec_precision == "int4",
            mesh=mesh,
        )
        logger.info("engine init: generator up at +%.2fs", time.time() - t_init)
        # materialize the prefill/unstacked weight views in the background
        # NOW, while no KV cache or activations are live (peak-HBM safe) —
        # init does not block on the device work
        self.generator.warm_derivations_async()

        enc_thread.join()
        if "error" in enc_box:
            raise enc_box["error"]
        self.encoder = enc_box["runner"]
        enc_cfg = enc_box["cfg"]

        # aligner ----------------------------------------------------------
        # brought up on a background thread: its host-side GGUF/numpy work
        # overlaps the decoder's device uploads (reference init bar 3.61 s,
        # README.md:33; the worker-process bring-up there is also parallel)
        self._aligner = None
        self._aligner_thread = None
        self._aligner_error: Optional[BaseException] = None
        if config.enable_aligner and config.align_config is not None:
            import threading

            def _bring_up():
                try:
                    # wait for the ASR decoder's async uploads first: the
                    # aligner's ~1 GB of uploads otherwise contend for the
                    # ~1 GB/s device link and stretch the main init by
                    # seconds; the aligner has until first use (plus the
                    # engine's own warmup) to finish
                    try:
                        head = self.generator.params.get("lm_head")
                        jax.block_until_ready(getattr(head, "packed", head))
                    except Exception:
                        pass
                    from .aligner import QwenForcedAligner

                    self._aligner = QwenForcedAligner(config.align_config)
                    if self._aligner._word_cls is None:
                        # one vocab walk builds the speculative-align word
                        # table (sidecar-cached); still on the background
                        # thread, so init cost is unaffected
                        self._aligner.build_word_cls_table()
                except BaseException as e:  # surfaced on first use
                    self._aligner_error = e

            self._aligner_thread = threading.Thread(target=_bring_up, daemon=True)
            self._aligner_thread.start()
            # a quick-exiting caller (init-and-quit script) must not tear
            # down the interpreter under this thread mid-JAX
            from ..utils import bg

            bg.register(self._aligner_thread)

        # special ids (reference asr.py:67-71)
        self.ID_IM_START = thinker.im_start_token_id
        self.ID_IM_END = thinker.im_end_token_id
        self.ID_AUDIO_START = thinker.audio_start_token_id
        self.ID_AUDIO_END = thinker.audio_end_token_id
        self.ID_ASR_TEXT = thinker.asr_text_token_id
        logger.info("engine ready in %.2fs (decoder %dL/%dd, encoder %dL/%dd)",
                    time.time() - t_init, dec_cfg.num_layers, dec_cfg.hidden_size,
                    enc_cfg.encoder_layers, enc_cfg.d_model)

    @property
    def aligner(self):
        """Joins the background bring-up on first access."""
        if self._aligner_thread is not None:
            self._aligner_thread.join()
            self._aligner_thread = None
            if self._aligner_error is not None:
                raise self._aligner_error
        return self._aligner

    def shutdown(self) -> None:
        """No helper process to stop (API compatibility, asr.py:73-78)."""

    # -- prompt ------------------------------------------------------------

    def _prompt_parts(
        self,
        prefix_text: str,
        context: Optional[str],
        language: Optional[str],
        detect_language: bool = False,
    ) -> tuple[list, list]:
        """Chat-protocol prompt halves around the audio span (reference
        asr.py:80-104): (header tokens incl. <|audio_start|>, suffix tokens
        from <|audio_end|> through the carried prefix text).

        `detect_language` (official-API auto mode, qwen3_asr.py:454-465):
        with no forced language the suffix stops at "assistant\\n" — no
        forced `<asr_text>` — so the model emits the
        ``language X<asr_text>body`` protocol for the caller to parse."""
        # the (context, language) halves repeat for every chunk of every
        # call — memoize the BPE walks (~2-3 ms each on this 1-core host,
        # called ~4x per transcription on the critical dispatch path)
        key = (prefix_text, context, language, detect_language)
        cached = getattr(self, "_prompt_parts_memo", {}).get(key)
        if cached is not None:
            return [*cached[0]], [*cached[1]]
        tk = self.model.tokenize
        prefix_str = f"system\n{context or 'You are a helpful assistant.'}"
        prefix_tokens = (
            [self.ID_IM_START] + tk(prefix_str) + [self.ID_IM_END]
            + [self.ID_IM_START] + tk("user\n") + [self.ID_AUDIO_START]
        )
        suffix_head = "assistant\n"
        if language:
            suffix_head += f"language {language}"
        suffix_tokens = (
            [self.ID_AUDIO_END, self.ID_IM_END, self.ID_IM_START]
            + tk(suffix_head)
        )
        if language or not detect_language:
            suffix_tokens += [self.ID_ASR_TEXT]
        suffix_tokens += tk(prefix_text)
        memo = getattr(self, "_prompt_parts_memo", None)
        if memo is None:
            memo = self._prompt_parts_memo = {}
        if len(memo) < 512:
            memo[key] = (list(prefix_tokens), list(suffix_tokens))
        return prefix_tokens, suffix_tokens

    def _build_prompt_ids(
        self,
        n_audio: int,
        prefix_text: str,
        context: Optional[str],
        language: Optional[str],
        detect_language: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Full prompt as (token_ids, audio_mask) — see `_prompt_parts`."""
        prefix_tokens, suffix_tokens = self._prompt_parts(
            prefix_text, context, language, detect_language
        )
        n_pre = len(prefix_tokens)
        total = n_pre + n_audio + len(suffix_tokens)
        ids = np.zeros(total, dtype=np.int32)
        ids[:n_pre] = prefix_tokens
        ids[n_pre + n_audio :] = suffix_tokens
        audio_mask = np.zeros(total, dtype=bool)
        audio_mask[n_pre : n_pre + n_audio] = True
        return ids, audio_mask

    @staticmethod
    def _suffix_prompt_ids(n_audio: int, suffix_tokens: list) -> tuple[np.ndarray, np.ndarray]:
        """Partial prompt for KV-prefix-reuse prefills: [current-chunk audio
        placeholders | suffix tokens]; header + memory audio stay in cache."""
        total = n_audio + len(suffix_tokens)
        ids = np.zeros(total, dtype=np.int32)
        ids[n_audio:] = suffix_tokens
        audio_mask = np.zeros(total, dtype=bool)
        audio_mask[:n_audio] = True
        return ids, audio_mask

    # -- decode ------------------------------------------------------------

    def _decode(
        self,
        ids: np.ndarray,
        audio_mask: np.ndarray,
        audio_embd,  # [Ta, D] device array
        rollback_num: int,
        is_last_chunk: bool = False,
        temperature: float = 0.4,
        reuse=None,  # (cache, start): KV prefix reuse for chunks >= 2
        retry_cache=None,  # cache of a FAILED attempt over the same prompt
        max_new_tokens: int | None = None,  # override (warmup passes 1)
    ) -> tuple[DecodeResult, object]:
        """One chunk generation with rollback + circuit breaker
        (reference asr.py:106-191). Returns (result, final KV cache) so the
        next chunk can reuse the [header | memory-audio] prefix.

        `retry_cache`: a circuit-breaker retry re-samples the SAME prompt at
        a higher temperature — its prompt KV is already valid in the failed
        attempt's cache, so only the last prompt position re-prefills (the
        reference re-decodes the whole prompt each retry, asr.py:193-209;
        identical logits either way)."""
        result = DecodeResult()
        result.n_prefill = int(ids.shape[0])

        t0 = time.time()
        drop_first_emitted = False
        if retry_cache is not None:
            # re-seed the decode loop at the last prompt position instead
            # of prefilling: the failed attempt's cache already holds the
            # full prompt KV, and the decode-block program (already warm)
            # reproduces the prefill's final logits from the last prompt
            # token — no retry-only compiled program, no prefill cost.
            # The block emits its input token, so drop the first emission.
            base = reuse[1] if reuse is not None else 0
            plen = base + int(ids.shape[0])
            state = self.generator.restart_at(
                retry_cache, pos=plen - 1, last_token=int(ids[-1])
            )
            drop_first_emitted = True
        elif reuse is None:
            state = self.generator.start_spliced(
                ids, audio_mask, audio_embd, temperature=temperature
            )
        else:
            cache, start = reuse
            state = self.generator.start_spliced_at(
                ids, audio_mask, audio_embd, start=start, cache=cache,
                temperature=temperature,
            )
        result.t_prefill = time.time() - t0

        t1 = time.time()
        display_queue: deque[int] = deque()
        stable_tokens: List[int] = []
        stable_text = ""
        text_decoder = getincrementaldecoder("utf-8")(errors="replace")
        n_gen = 0
        finished = False

        def emit(tok: int) -> str:
            piece = text_decoder.decode(self.model.token_to_bytes(tok))
            if piece and self.verbose:
                print(_PUNCT_NEWLINE.sub("\\1\n", piece), end="", flush=True)
            return piece

        # speculative block pipeline: dispatch block n+1 before fetching
        # block n's tiny result (post-EOS steps are latched no-ops on
        # device), hiding one device->host round-trip per block
        gen = self.generator
        max_new = max_new_tokens if max_new_tokens is not None else self.config.max_new_tokens
        st, packed = gen.decode_block_dispatch(state, temperature)
        latest = st
        while True:
            spec = None
            if packed is not None and n_gen + gen.block < max_new:
                spec = gen.decode_block_dispatch(st, temperature)
                latest = spec[0]
            toks, finished, rep_aborted = gen.collect_block(packed)
            if drop_first_emitted and toks:
                toks = toks[1:]  # the restart_at-fed prompt token
                drop_first_emitted = False
            for tok in toks:
                if n_gen >= max_new:
                    break
                n_gen += 1
                display_queue.append(tok)
                if len(display_queue) > rollback_num:
                    ready = display_queue.popleft()
                    stable_tokens.append(ready)
                    stable_text += emit(ready)
                # repetition circuit breaker (asr.py:157-161)
                if len(stable_tokens) > 15 and len(set(stable_tokens[-15:])) <= 3:
                    result.is_aborted = True
                    break
            # device-side repetition latch: the block exits ~15 tokens into a
            # repetition loop instead of running to the block end; the host
            # check above stays authoritative across block boundaries
            if rep_aborted:
                result.is_aborted = True
            if finished or n_gen >= max_new or result.is_aborted:
                break
            if spec is None:
                spec = gen.decode_block_dispatch(st, temperature)
                latest = spec[0]
            st, packed = spec
        state = latest
        result.t_generate = time.time() - t1

        if is_last_chunk and not result.is_aborted:
            while display_queue:
                tok = display_queue.popleft()
                stable_tokens.append(tok)
                stable_text += emit(tok)
            tail = text_decoder.decode(b"", final=True)
            if tail:
                stable_text += tail
                if self.verbose:
                    print(tail, end="", flush=True)

        result.text = stable_text
        result.stable_tokens = stable_tokens
        result.n_generate = n_gen
        return result, state.cache

    # -- pipelined chunk dispatch (single-block fast path) -----------------

    def _dispatch_chunk(self, ids, audio_mask, audio_embd, temperature, reuse=None):
        """Prefill + ONE decode-block dispatch with NO host sync (valid when
        max_new_tokens <= generator.block). Returns a pending dict for
        `_collect_chunk`, or None when the context is full (caller falls
        back to the synchronous `_safe_decode`)."""
        gen = self.generator
        t0 = time.time()
        if reuse is None:
            st = gen.start_spliced(ids, audio_mask, audio_embd, temperature=temperature)
        else:
            cache, start = reuse
            st = gen.start_spliced_at(
                ids, audio_mask, audio_embd, start=start, cache=cache,
                temperature=temperature,
            )
        st2, packed = gen.decode_block_dispatch(st, temperature)
        if packed is None:
            return None
        return {
            "state": st2, "packed": packed, "n_prefill": int(ids.shape[0]),
            "t_dispatch": time.time() - t0, "reuse_start": reuse[1] if reuse else None,
        }

    def _dispatch_chunk_spec(
        self, template_ids, emitted, audio_embd, *, n_audio, start, cache,
        temperature, rollback, max_keep,
    ):
        """Speculative dispatch of chunk i+1 BEFORE chunk i's result is
        fetched: the prompt tail (chunk i's stable tokens) is assembled on
        device from the emitted-token buffer. Returns a pending dict; the
        caller verifies its host-side token accounting at collect time and
        falls back to `_safe_decode` on any mismatch/abort (the cache
        prefix [0:start) stays valid — decode only reads slots <= pos, all
        rewritten by the corrective prefill/decode)."""
        gen = self.generator
        t0 = time.time()
        st = gen.start_spliced_at_spec(
            template_ids, emitted, audio_embd,
            n_audio=n_audio, start=start, cache=cache,
            rollback=rollback, max_keep=max_keep, temperature=temperature,
        )
        bound = start + n_audio + len(template_ids) + max_keep
        st2, packed = gen.decode_block_dispatch(st, temperature, pos_bound=bound)
        if packed is None:
            return None
        return {
            "state": st2, "packed": packed,
            "n_prefill": n_audio + len(template_ids),  # + n_keep at collect
            "t_dispatch": time.time() - t0, "reuse_start": start,
            "spec_max_keep": max_keep, "spec_rollback": rollback,
        }

    def _collect_chunk(self, pend, rollback_num, is_last_chunk) -> DecodeResult:
        """Fetch a dispatched chunk's packed result and run the host-side
        token processing of `_decode` (rollback display queue, utf-8
        assembly, repetition breaker)."""
        gen = self.generator
        t0 = time.time()
        toks, finished, rep_aborted = gen.collect_block(pend["packed"])
        result = DecodeResult()
        result.n_prefill = pend["n_prefill"]
        result.t_prefill = pend["t_dispatch"]
        display_queue: deque[int] = deque()
        stable_tokens: List[int] = []
        stable_text = ""
        text_decoder = getincrementaldecoder("utf-8")(errors="replace")
        max_new = self.config.max_new_tokens
        n_gen = 0
        for tok in toks:
            if n_gen >= max_new:
                break
            n_gen += 1
            display_queue.append(tok)
            if len(display_queue) > rollback_num:
                ready = display_queue.popleft()
                stable_tokens.append(ready)
                piece = text_decoder.decode(self.model.token_to_bytes(ready))
                if piece and self.verbose:
                    print(_PUNCT_NEWLINE.sub("\\1\n", piece), end="", flush=True)
                stable_text += piece
            if len(stable_tokens) > 15 and len(set(stable_tokens[-15:])) <= 3:
                result.is_aborted = True
                break
        if rep_aborted:
            result.is_aborted = True
        if is_last_chunk and not result.is_aborted:
            while display_queue:
                tok = display_queue.popleft()
                stable_tokens.append(tok)
                piece = text_decoder.decode(self.model.token_to_bytes(tok))
                if piece and self.verbose:
                    print(_PUNCT_NEWLINE.sub("\\1\n", piece), end="", flush=True)
                stable_text += piece
            tail = text_decoder.decode(b"", final=True)
            if tail:
                stable_text += tail
                if self.verbose:
                    print(tail, end="", flush=True)
        result.text = stable_text
        result.stable_tokens = stable_tokens
        result.n_generate = n_gen
        result.t_generate = time.time() - t0
        return result

    def _safe_decode(
        self,
        ids: np.ndarray,
        audio_mask: np.ndarray,
        audio_embd,
        rollback_num: int,
        is_last_chunk: bool,
        temperature: float,
        reuse=None,
        max_new_tokens: int | None = None,
    ) -> tuple[DecodeResult, object]:
        """Circuit-breaker retry with temperature escalation (asr.py:193-209)."""
        res = DecodeResult()
        cache = reuse[0] if reuse is not None else None
        for attempt in range(4):
            # retries re-sample the SAME prompt: its KV is already in the
            # failed attempt's cache, so only the last prompt position
            # re-prefills (reference re-decodes the full prompt each time)
            r = reuse if reuse is None else (cache, reuse[1])
            res, cache = self._decode(
                ids, audio_mask, audio_embd, rollback_num, is_last_chunk,
                temperature, reuse=r,
                retry_cache=cache if attempt > 0 else None,
                max_new_tokens=max_new_tokens,
            )
            if not res.is_aborted:
                break
            temperature += 0.3
            res.text += "====decode aborted: repetition circuit breaker===="
            if self.verbose:
                print(f"\n\n[!] retrying with temperature {temperature:.1f}\n")
        return res, cache

    # -- stats -------------------------------------------------------------

    def _print_stats(self, stats: dict, audio_duration: float, t_total: float) -> None:
        rtf = t_total / audio_duration if audio_duration > 0 else 0.0
        pre = stats["prefill_tokens"] / stats["prefill_time"] if stats["prefill_time"] > 0 else 0
        gen = stats["decode_tokens"] / stats["decode_time"] if stats["decode_time"] > 0 else 0
        print(f"\n\nstats:")
        print(f"  RTF            : {rtf:.3f}")
        print(f"  audio duration : {audio_duration:.2f} s")
        print(f"  total time     : {t_total:.2f} s")
        print(f"  encode wait    : {stats['wait_time']:.2f} s")
        print(f"  align total    : {stats['align_enc_time'] + stats['align_dec_time']:.2f} s")
        print(f"  LLM prefill    : {stats['prefill_time']:.3f} s ({stats['prefill_tokens']} tok, {pre:.1f} tok/s)")
        print(f"  LLM generate   : {stats['decode_time']:.3f} s ({stats['decode_tokens']} tok, {gen:.1f} tok/s)")

    # -- public API --------------------------------------------------------

    def transcribe(
        self,
        audio_file: str,
        language: Optional[str] = None,
        context: Optional[str] = None,
        start_second: float = 0.0,
        duration: float = 0.0,
        temperature: float = 0.4,
        rollback_num: int = 5,
    ) -> TranscribeResult:
        from ..audio.io import load_audio

        audio = load_audio(audio_file, start_second=start_second or None, duration=duration or None)
        return self.asr(
            audio=audio,
            context=context or "",
            language=language,
            chunk_size_sec=self.config.chunk_size,
            memory_chunks=self.config.memory_num,
            temperature=temperature,
            rollback_num=rollback_num,
        )

    def asr(
        self,
        audio: np.ndarray,
        context: Optional[str],
        language: Optional[str],
        chunk_size_sec: float = 40.0,
        memory_chunks: int = 1,
        temperature: float = 0.4,
        rollback_num: int = 5,
        detect_language: bool = False,
    ) -> TranscribeResult:
        """3-stage pipelined transcription (reference asr.py:269-404).

        `detect_language=True` with `language=None` enables the official
        API's auto mode (qwen3_asr.py:454-465): the first chunk's prompt
        omits the forced `<asr_text>`, the emitted
        ``language X<asr_text>body`` protocol is parsed, and subsequent
        chunks force the detected language. The result carries the
        detected/merged language in `.language`."""
        if language:
            language = normalize_language_name(language)
            validate_language(language)
        detecting = detect_language and not language
        # current effective language: detection fills it after chunk 0
        cur = {"lang": language}
        # per-call nonce in every align pre-encode/spec key: a (start, end)
        # window pair alone can repeat across calls over DIFFERENT audio, and
        # a stale pre-encoded window or speculative dispatch must never match
        seq = self._align_seq = getattr(self, "_align_seq", 0) + 1

        samples_per_chunk = int(chunk_size_sec * SAMPLE_RATE)
        total_len = len(audio)
        num_chunks = int(np.ceil(total_len / samples_per_chunk)) if total_len else 0
        total_duration = total_len / SAMPLE_RATE

        segments = [
            _Segment(
                idx=i,
                audio_start=i * chunk_size_sec,
                audio_end=min((i + 1) * chunk_size_sec, total_duration),
            )
            for i in range(num_chunks)
        ]
        memory: deque = deque(maxlen=memory_chunks)
        full_text = ""
        aligned_items: List[ForcedAlignItem] = []
        # opt-in phase trace (QWEN3_ENGINE_TRACE=1): wall-clock per engine
        # phase, for finding host/queue time that the stats dict's
        # device-centric timers miss
        trace_on = os.environ.get("QWEN3_ENGINE_TRACE", "0") != "0"
        phases: list[tuple[str, float]] = []
        _t_last = [time.time()]

        def mark(name: str) -> None:
            if trace_on:
                now = time.time()
                phases.append((name, now - _t_last[0]))
                _t_last[0] = now

        # worker-thread trace: absolute offsets from t_main (the align worker
        # overlaps the main loop, so delta-marks would interleave wrongly)
        wphases: list[tuple[str, float]] = []

        def wmark(name: str) -> None:
            if trace_on:
                wphases.append((name, time.time() - t_main))
        stats = {
            "prefill_time": 0.0, "decode_time": 0.0,
            "prefill_tokens": 0, "decode_tokens": 0,
            "wait_time": 0.0, "encode_time": 0.0,
            "align_enc_time": 0.0, "align_dec_time": 0.0,
        }
        t_main = time.time()

        # one up-front [num_chunks, chunk] upload: a transfer enqueued right
        # before its consumer stalls the consumer on a cross-stream sync
        # (~50-60 ms through the remote runtime, measured on the 40 s chunk);
        # uploaded here it is long done when encode(i) dispatches
        chunks_dev = None
        if num_chunks:
            padded = np.zeros((num_chunks, samples_per_chunk), np.float32)
            flat = audio[: num_chunks * samples_per_chunk]
            padded.reshape(-1)[: len(flat)] = flat
            try:
                import jax.numpy as jnp

                chunks_dev = jnp.asarray(padded)
            except Exception:
                chunks_dev = None  # fall back to per-chunk host arrays

        def chunk_audio(idx: int):
            if chunks_dev is not None:
                return chunks_dev[idx]
            s = idx * samples_per_chunk
            data = audio[s : s + samples_per_chunk]
            if len(data) < samples_per_chunk:
                data = np.pad(data, (0, samples_per_chunk - len(data)))
            return data

        # async encode dispatch (replaces send_enc/mp.Queue, asr.py:313-319)
        enc_futs: dict[int, object] = {}

        def send_enc(idx: int) -> None:
            if 0 <= idx < num_chunks and idx not in enc_futs:
                t0 = time.time()
                enc_futs[idx] = self.encoder.encode_async(chunk_audio(idx))
                stats["encode_time"] += time.time() - t0  # dispatch cost only

        def wait_enc(idx: int):
            """Device array [valid_tokens, D] — embeddings stay on device;
            idempotent (the pipelined path reads chunk i+1's embedding while
            chunk i is still in flight). Entries older than idx-1 drop."""
            for k in [k for k in enc_futs if k < idx - 1]:
                del enc_futs[k]
            fut = enc_futs[idx]
            return fut[: self.encoder.valid_tokens(samples_per_chunk)]

        def align_window(idx: int) -> tuple[float, int, int]:
            """(offset_sec, start_sample, end_sample) for segment idx
            (reference send_align offset logic, asr.py:322-348); valid once
            segment idx-1's items are known."""
            seg = segments[idx]
            offset_sec = seg.audio_start
            if idx > 0 and segments[idx - 1].items:
                last_end = segments[idx - 1].items[-1].end_time
                prev_limit = segments[idx - 1].audio_end
                offset_sec = min(prev_limit, max(last_end, prev_limit - 10.0))
            return offset_sec, int(offset_sec * SAMPLE_RATE), int(seg.audio_end * SAMPLE_RATE)

        # speculative align (see aligner.spec_align_start): a decode block's
        # emitted-token buffer assembles the align prompt ON DEVICE, so the
        # align prefill is already queued behind the block when the host is
        # still waiting on the block's result fetch — the two ~30-50 ms
        # device->host notification lags overlap instead of chaining.
        # Dispatched for chunk 0 (window fixed at transcribe start; the
        # rollback trim mirrors on device via drop_last) and for the last
        # chunk (window fixed once align(last-1) lands). `tokens` is set by
        # the main loop after the block's result lands; collect validates
        # exact equality and falls back to align() on mismatch.
        spec_aligns: dict[int, dict] = {}  # idx -> {"tokens": list | None}

        def run_align(idx: int) -> None:
            """Align segment idx."""
            if self.aligner is None or not (0 <= idx < num_chunks):
                return
            seg = segments[idx]
            if not seg.text.strip():
                seg.items = []
                return
            wmark(f"align{idx}.start")
            offset_sec, s, e = align_window(idx)
            ares = None
            ent = spec_aligns.get(idx)
            if ent is not None and ent.get("tokens") is not None:
                try:
                    ares = self.aligner.spec_align_collect(
                        ent["tokens"], seg.text,
                        seg.lang or cur["lang"] or "Chinese",
                        offset_sec, key=(seq, s, e),
                    )
                    wmark(f"align{idx}.spec_collect")
                except Exception:
                    logger.debug("speculative align collect failed; "
                                 "falling back", exc_info=True)
                    ares = None
            if ares is not None:
                seg.items = list(ares.items)
                aligned_items.extend(ares.items)
                if ares.performance:
                    stats["align_enc_time"] += ares.performance.get("encoder_time", 0)
                    stats["align_dec_time"] += ares.performance.get("decoder_time", 0)
                if idx + 1 < num_chunks:
                    # window idx+1 is now determined — pre-dispatch its
                    # encode (same as the fallback path below)
                    _, s2, e2 = align_window(idx + 1)
                    self.aligner.pre_encode(audio[s2:e2], key=(seq, s2, e2))
                return
            try:
                ares = self.aligner.align(
                    audio[s:e], seg.text,
                    language=seg.lang or cur["lang"] or "Chinese",
                    offset_sec=offset_sec,
                    precomputed_key=(seq, s, e),
                )
                wmark(f"align{idx}.full")
            except Exception:
                # degrade to no timestamps but SAY SO (reference worker logs
                # through its error path, asr_worker.py:36-38; a silently
                # empty alignment looks like "alignment produced nothing")
                logger.warning(
                    "forced alignment failed for chunk %d [%0.1fs-%0.1fs]; "
                    "timestamps degraded to empty",
                    idx, offset_sec, seg.audio_end, exc_info=True,
                )
                seg.items = []
                return
            seg.items = list(ares.items)
            aligned_items.extend(ares.items)
            if ares.performance:
                stats["align_enc_time"] += ares.performance.get("encoder_time", 0)
                stats["align_dec_time"] += ares.performance.get("decoder_time", 0)
            # segment idx+1's window is now determined: pre-dispatch its
            # align ENCODE so it overlaps the final chunk's decode instead
            # of tailing the pipeline (the text arrives later)
            if idx + 1 < num_chunks:
                _, s2, e2 = align_window(idx + 1)
                self.aligner.pre_encode(audio[s2:e2], key=(seq, s2, e2))

        if num_chunks:
            send_enc(0)

        # align(i-1) runs on a worker thread, overlapping decode(i) — the
        # reference's helper-process overlap (asr.py:350-393 / asr_worker.py).
        # One worker preserves order: align(i) reads align(i-1)'s items for
        # its overlap-aware offset (asr.py:322-348).
        from concurrent.futures import ThreadPoolExecutor

        # checking the private fields avoids joining the background aligner
        # bring-up here — the worker thread joins it on first use instead
        has_aligner = self._aligner is not None or self._aligner_thread is not None
        align_pool = ThreadPoolExecutor(max_workers=1) if has_aligner else None
        align_futs: List = []

        def submit_align(idx: int) -> None:
            if align_pool is not None and 0 <= idx < num_chunks:
                align_futs.append(align_pool.submit(run_align, idx))

        def submit_spec_align(
            idx: int, packed, drop_last: int = 0
        ) -> threading.Event | None:
            """Queue a speculative align dispatch on the align worker. The
            serial queue guarantees window ordering: idx 0's window is fixed
            at transcribe start (behind the window-0 pre-encode only), the
            last chunk's once align(last-1) lands. `drop_last` mirrors the
            host's rollback trim on device for non-last chunks.

            Returns an Event set once the device dispatch happened: the
            caller can gate its NEXT device enqueue on it to pin the device
            queue order (the ~13 ms align prefill must slot BEFORE the next
            chunk's block, or its result tails that block by ~150 ms)."""
            if align_pool is None or packed is None or idx in spec_aligns:
                return None
            spec_aligns[idx] = {"tokens": None}
            evt = threading.Event()

            def _task() -> None:
                try:
                    if self.aligner is None:
                        return
                    wmark(f"spec_align{idx}.start")
                    _, s_w, e_w = align_window(idx)
                    try:
                        self.aligner.spec_align_start(
                            packed[:-2], key=(seq, s_w, e_w),
                            language=cur["lang"] or "Chinese",
                            drop_last=drop_last,
                        )
                        wmark(f"spec_align{idx}.dispatched")
                    except Exception:
                        logger.debug("speculative align dispatch failed",
                                     exc_info=True)
                finally:
                    evt.set()

            align_futs.append(align_pool.submit(_task))
            return evt

        if align_pool is not None and num_chunks:
            # window 0 depends on no alignment items — pre-encode it NOW so
            # align(0)'s encoder pass rides under chunk decode instead of
            # queuing after it on the serial device stream (it would
            # otherwise start only when align(0)'s text arrives). Runs on
            # the align worker so a still-warming background aligner
            # bring-up never blocks the transcription start.
            def _pre0() -> None:
                if self.aligner is not None:
                    _, s0, e0 = align_window(0)
                    if s0 == 0 and e0 == samples_per_chunk and chunks_dev is not None:
                        # window 0 of a >chunk-size input is exactly chunk 0:
                        # feed the already-device-resident row (a fresh host
                        # upload mid-stream stalls its consumer ~60 ms on the
                        # remote runtime)
                        self.aligner.pre_encode(chunks_dev[0], key=(seq, s0, e0))
                    else:
                        self.aligner.pre_encode(audio[s0:e0], key=(seq, s0, e0))

            align_futs.append(align_pool.submit(_pre0))

        # KV prefix reuse state: cache carrying [header | memory-audio] KV
        # from the previous chunk (exact for chunk 2, see test_prefix_reuse)
        a_full = self.encoder.valid_tokens(samples_per_chunk)
        kv_cache = None

        def trim_prefix_tokens(ptoks: list, n_fixed: int) -> list:
            """Drop the OLDEST carried tokens if prompt + generation headroom
            would overflow n_ctx (the reference's llama_decode would
            hard-fail here; n_ctx sizing note reference schema.py:84-86).

            The carried prefix is kept as RAW TOKENS, not re-tokenized text
            (the reference decodes then re-encodes, which mangles split
            multibyte sequences into U+FFFD; tokens also make the pipelined
            device-assembled prompt byte-identical to this path)."""
            budget = self.config.n_ctx - min(self.config.max_new_tokens, 256)
            overflow = n_fixed + len(ptoks) - budget
            if overflow <= 0:
                return ptoks
            return ptoks[overflow:] if overflow < len(ptoks) else []

        # pipelined chunk dispatch: with a single decode block per chunk
        # (max_new_tokens == decode_block), chunk i+1's prompt tail is
        # assembled ON DEVICE from chunk i's emitted tokens, so its
        # prefill+decode dispatch BEFORE the host fetches chunk i's result
        # — the per-chunk device->host round trip (tens of ms through a
        # remote link) overlaps chunk i+1's compute instead of serializing
        # the chunk chain. On a repetition abort or a token-accounting
        # mismatch the speculative work is discarded and the synchronous
        # path recovers (the cache prefix stays valid).
        fast_ok = (
            self.config.pipelined_dispatch
            and self.config.max_new_tokens == self.generator.block
        )
        inflight = None  # dispatched-but-uncollected chunk i
        spec0_evt = None  # chunk-0 spec-align dispatch gate (device order)

        def full_prompt(i: int, audio_feature, lang, detect):
            """(ids, mask, combined_embd) for a from-scratch chunk prompt;
            the carried prefix rides as raw tokens (see trim_prefix_tokens)."""
            carried = [t for m in memory for t in m[2]]
            combined = (
                jnp.concatenate([m[0] for m in memory] + [audio_feature], axis=0)
                if memory else audio_feature
            )
            actual = min(samples_per_chunk, total_len - i * samples_per_chunk)
            n_valid = self.encoder.valid_tokens(actual)
            n_audio_prompt = a_full * len(memory) + n_valid
            hdr, template = self._prompt_parts("", context, lang, detect)
            kept = trim_prefix_tokens(
                carried, len(hdr) + n_audio_prompt + len(template)
            )
            suffix_tokens = template + kept
            n_pre_f = len(hdr)
            total = n_pre_f + n_audio_prompt + len(suffix_tokens)
            ids = np.zeros(total, dtype=np.int32)
            ids[:n_pre_f] = hdr
            ids[n_pre_f + n_audio_prompt :] = suffix_tokens
            mask = np.zeros(total, dtype=bool)
            mask[n_pre_f : n_pre_f + n_audio_prompt] = True
            return ids, mask, combined

        for i in range(num_chunks):
            mark(f"c{i}.top")
            t_w = time.time()
            send_enc(i + 1)  # prefetch next before blocking on this one
            audio_feature = wait_enc(i)
            stats["wait_time"] += time.time() - t_w
            mark(f"c{i}.enc")

            if i >= 1:
                submit_align(i - 1)
            if i == num_chunks - 1 and inflight is not None:
                # the last chunk's block was spec-dispatched during i-1:
                # queue its speculative align right behind align(i-1)
                submit_spec_align(i, inflight["packed"])

            # valid encoder tokens of THIS chunk (the final chunk is padded
            # to 40 s on device, but only its real frames enter the prompt —
            # reference slices to get_feat_extract_output_lengths, encoder.py:186-189)
            actual_samples = min(samples_per_chunk, total_len - i * samples_per_chunk)
            n_valid_cur = self.encoder.valid_tokens(actual_samples)
            is_last = i == num_chunks - 1
            prefix_tokens, suffix_head = self._prompt_parts(
                "", context, cur["lang"], detecting
            )
            n_pre = len(prefix_tokens)
            start = n_pre + a_full

            pend = inflight
            inflight = None
            res = None
            if pend is None:
                # normal dispatch of chunk i (chunk 0, or pipeline restart)
                use_reuse = (
                    self.config.kv_prefix_reuse
                    and memory_chunks == 1
                    and len(memory) == 1
                    and kv_cache is not None
                )
                if use_reuse:
                    carried = [t for m in memory for t in m[2]]
                    kept = trim_prefix_tokens(
                        carried, start + n_valid_cur + len(suffix_head)
                    )
                    suffix_tokens = suffix_head + kept
                    if i >= 2:
                        # EXACT memory reuse: only the header KV [0, n_pre)
                        # is carried (constant across chunks); the memory
                        # audio re-prefills at its new positions together
                        # with the current chunk, reproducing the
                        # reference's recompute semantics (asr.py:269-393)
                        # bit-for-bit. (A RoPE-rebased KV move was ~20 ms
                        # cheaper per chunk but approximate: the carried
                        # audio's deep-layer KV had attended the OLDER
                        # memory, which the fresh prompt does not contain.)
                        ids, audio_mask = self._suffix_prompt_ids(
                            a_full + n_valid_cur, suffix_tokens
                        )
                        embd_in = jnp.concatenate(
                            [memory[-1][0], audio_feature], axis=0
                        )
                        reuse = (kv_cache, n_pre)
                    else:
                        # chunk 1: [header | chunk-0 audio] KV is exact as-is
                        ids, audio_mask = self._suffix_prompt_ids(
                            n_valid_cur, suffix_tokens
                        )
                        embd_in, reuse = audio_feature, (kv_cache, start)
                else:
                    ids, audio_mask, embd_in = full_prompt(
                        i, audio_feature, cur["lang"], detecting
                    )
                    reuse = None
                mark(f"c{i}.prompt")
                if fast_ok:
                    pend = self._dispatch_chunk(
                        ids, audio_mask, embd_in, temperature, reuse=reuse
                    )
                    if is_last and pend is not None:
                        submit_spec_align(i, pend["packed"])
                    elif i == 0 and pend is not None and not detecting:
                        # chunk 0's window is fixed (starts at 0) — its spec
                        # align chain enqueues right behind block 0, BEFORE
                        # chunk 1's speculative prefill+block, so align(0)'s
                        # result no longer tails block 1 and the last chunk's
                        # spec dispatch (which waits on align(0)'s items for
                        # its window) unblocks a full block earlier
                        spec0_evt = submit_spec_align(
                            i, pend["packed"], drop_last=rollback_num
                        )
                if pend is None:  # multi-block config or context full
                    res, kv_cache = self._safe_decode(
                        ids, audio_mask, embd_in, rollback_num, is_last,
                        temperature, reuse=reuse,
                    )
                    mark(f"c{i}.decode(pre={res.t_prefill:.3f},gen={res.t_generate:.3f})")

            # speculative dispatch of chunk i+1 BEFORE fetching chunk i
            spec_next = None
            spec_keep = 0
            if (
                pend is not None
                and not is_last
                and self.config.kv_prefix_reuse
                and memory_chunks == 1
                and (not detecting or cur["lang"])
            ):
                next_samples = min(
                    samples_per_chunk, total_len - (i + 1) * samples_per_chunk
                )
                n_valid_next = self.encoder.valid_tokens(next_samples)
                _, template = self._prompt_parts("", context, cur["lang"], detecting)
                budget = self.config.n_ctx - (
                    start + n_valid_next + len(template) + self.generator.block
                )
                max_keep = min(self.generator.block, max(budget, 0))
                if max_keep > 0:
                    if spec0_evt is not None:
                        # pin the device queue order: chunk 0's ~13 ms spec
                        # align prefill must enqueue BEFORE chunk 1's block,
                        # or its result tails that block by a full ~150 ms.
                        # Bounded wait — a wedged aligner only costs order.
                        spec0_evt.wait(0.2)
                        spec0_evt = None
                    cache_next = pend["state"].cache
                    if i + 1 >= 2:
                        # exact memory reuse (see the use_reuse branch):
                        # header-only KV carry; chunk i's audio re-prefills
                        # as chunk i+1's memory together with its audio
                        spec_next = self._dispatch_chunk_spec(
                            template, pend["packed"][:-2],
                            jnp.concatenate(
                                [audio_feature, wait_enc(i + 1)], axis=0
                            ),
                            n_audio=a_full + n_valid_next, start=n_pre,
                            cache=cache_next, temperature=temperature,
                            rollback=rollback_num, max_keep=max_keep,
                        )
                    else:
                        spec_next = self._dispatch_chunk_spec(
                            template, pend["packed"][:-2], wait_enc(i + 1),
                            n_audio=n_valid_next, start=start, cache=cache_next,
                            temperature=temperature, rollback=rollback_num,
                            max_keep=max_keep,
                        )
                    spec_keep = max_keep
                    mark(f"c{i}.spec_next")

            if res is None:
                res = self._collect_chunk(pend, rollback_num, is_last)
                mark(f"c{i}.collect(pre={res.t_prefill:.3f},gen={res.t_generate:.3f})")
                if res.is_aborted:
                    # repetition circuit breaker: discard the speculative
                    # work and re-decode chunk i from the full prompt at
                    # escalated temperature (reference retry semantics,
                    # asr.py:193-209)
                    spec_next = None
                    # the spec align (if any) saw the ABORTED token stream;
                    # the retry's text differs, so it must not be collected
                    spec_aligns.pop(i, None)
                    res.text += "====decode aborted: repetition circuit breaker===="
                    if self.verbose:
                        print(f"\n\n[!] retrying with temperature {temperature + 0.3:.1f}\n")
                    ids_f, mask_f, embd_f = full_prompt(
                        i, audio_feature, cur["lang"], detecting
                    )
                    res, kv_cache = self._safe_decode(
                        ids_f, mask_f, embd_f, rollback_num, is_last,
                        temperature + 0.3,
                    )
                    mark(f"c{i}.retry(gen={res.t_generate:.3f})")
                else:
                    n_keep_host = len(res.stable_tokens) if not is_last else 0
                    if spec_next is not None and n_keep_host <= spec_keep:
                        spec_next["n_prefill"] += n_keep_host
                        inflight = spec_next
                        kv_cache = None
                    elif spec_next is not None:
                        # accounting mismatch: chunk i+1's spec prompt kept a
                        # clipped tail; its cache PREFIX (the constant
                        # header) is still valid for the normal redo
                        kv_cache = spec_next["state"].cache
                    else:
                        kv_cache = pend["state"].cache

            if not res.is_aborted and i in spec_aligns:
                # the align worker validates these against the speculative
                # align dispatch before trusting its timestamps
                spec_aligns[i]["tokens"] = res.stable_tokens
            chunk_text = res.text
            mem_tokens = list(res.stable_tokens)
            if detecting and cur["lang"] is None:
                # parse the output protocol; later chunks run forced with
                # the detected language (official per-chunk parse + merge,
                # qwen3_asr.py:419-446 / utils.py:403-470)
                from ..text.parsing import parse_asr_output

                d_lang, body = parse_asr_output(chunk_text)
                segments[i].lang = d_lang
                chunk_text = body
                if d_lang:
                    cur["lang"] = d_lang
                if self.ID_ASR_TEXT in mem_tokens:
                    # carried prefix = the body after the protocol tag
                    mem_tokens = mem_tokens[mem_tokens.index(self.ID_ASR_TEXT) + 1 :]
            segments[i].text = chunk_text
            memory.append((audio_feature, chunk_text, mem_tokens))
            full_text += chunk_text
            stats["prefill_tokens"] += res.n_prefill
            stats["prefill_time"] += res.t_prefill
            stats["decode_tokens"] += res.n_generate
            stats["decode_time"] += res.t_generate

        mark("loop_end")
        if num_chunks >= 1:
            submit_align(num_chunks - 1)
        if align_pool is not None:
            for f in align_futs:
                f.result()  # surface worker exceptions
            align_pool.shutdown()
        mark("align_wait")
        if trace_on:
            import sys as _sys

            print(
                "engine trace: " + " | ".join(f"{n} {dt*1e3:.0f}ms" for n, dt in phases),
                file=_sys.stderr, flush=True,
            )
            if wphases:
                print(
                    "align trace: " + " | ".join(f"{n} @{t*1e3:.0f}ms" for n, t in wphases),
                    file=_sys.stderr, flush=True,
                )

        aligned_items.sort(key=lambda x: x.start_time)
        t_total = time.time() - t_main
        if self.verbose:
            self._print_stats(stats, total_duration, t_total)

        if language:
            result_language = language
        else:
            from ..text.parsing import merge_languages

            result_language = merge_languages([s.lang for s in segments])
        return TranscribeResult(
            text=full_text,
            alignment=ForcedAlignResult(items=aligned_items) if aligned_items else None,
            performance=stats,
            language=result_language,
        )
