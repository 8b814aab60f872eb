"""Forced aligner: non-autoregressive word-level timestamps.

Reproduces the reference QwenForcedAligner (qwen_asr_gguf/inference/
aligner.py:229-348): encode the audio, tokenize the text per language,
build the slot-filled sequence

    <|audio_start|> AUDIO_EMBD <|audio_end|> w1 <TS> <TS> w2 <TS> <TS> ...

run ONE prefill with logits only at the <TS> positions, argmax over the
timestamp classes (x 80 ms), repair monotonicity with LIS, and reconcile
punctuation back into the timeline.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

import functools
import threading

from ..schema import AlignerConfig, ForcedAlignItem, ForcedAlignResult
from ..text import align_text
from ..utils.languages import normalize_language_name, validate_language
from ..models import params as P
from .encoder_runner import EncoderRunner
from .generate import SparseLogitsRunner

TIMESTAMP_CLASSES = 4000  # argmax window (reference aligner.py:322)
STEP_MS = 80.0


def _serialized(fn):
    """Serialize public entry points: the engine's align worker and the
    ContinuousBatcher's align pool may call one shared aligner concurrently,
    and `_pre`/spec state is a single slot (reentrant: align() may consume
    a pre_encode() result it made itself)."""

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        with self._mutex:
            return fn(self, *args, **kwargs)

    return wrapper


class QwenForcedAligner:
    def __init__(self, config: AlignerConfig):
        self._mutex = threading.RLock()
        from .. import enable_compilation_cache

        enable_compilation_cache()
        self.config = config
        model_dir = config.model_dir
        thinker = P.load_thinker_config(model_dir)
        self.thinker = thinker

        enc_path = os.path.join(model_dir, config.encoder_fn)
        mel_path = os.path.join(model_dir, "mel_filters.npy")
        if config.precision == "int8":
            enc_cfg, enc_params = P.load_encoder_quantized(enc_path, kind="int8")
        elif config.precision in ("q4_k", "int4"):
            enc_cfg, enc_params = P.load_encoder_quantized(enc_path, kind="int4")
        else:
            enc_cfg, enc_params = P.load_encoder_safetensors(enc_path, as_numpy=True)
        self.encoder = EncoderRunner(
            enc_params, enc_cfg,
            mel_filters=np.load(mel_path) if os.path.exists(mel_path) else None,
        )

        llm_path = os.path.join(model_dir, config.llm_fn)
        dec_cfg, dec_params, tokenizer = P.load_decoder_gguf(
            llm_path, precision=config.precision
        )
        self.dec_cfg = dec_cfg
        self.tokenizer = tokenizer
        dec_params = P.fuse_layer_weights(dec_params)
        if jax.default_backend() == "tpu":
            # the aligner only ever PREFILLS (NAR sparse logits); quantized
            # layer containers serve no decode matvec here, and the int8
            # matmul's per-call activation quant runs the 0.6B prefill at
            # ~12% of the MXU. One dense bf16 copy at init (~2 B/param,
            # bring-up already runs on a background thread) makes the align
            # prefill ride the same ~80%-MXU path as the ASR prefill.
            dec_params = P.dequant_prefill_params(dec_params)
        self.runner = SparseLogitsRunner(dec_params, dec_cfg, n_ctx=config.n_ctx)

        self.ID_AUDIO_START = thinker.audio_start_token_id
        self.ID_AUDIO_END = thinker.audio_end_token_id
        self.ID_TIMESTAMP = thinker.timestamp_token_id
        self.STEP_MS = thinker.timestamp_segment_ms or STEP_MS
        self._ko_scores: dict | None = None  # built lazily on first Korean align
        self._pre: tuple | None = None  # (key, embd, n_audio) pre-encoded window
        self._word_tok: dict[str, list[int]] = {}  # word -> token ids memo
        # speculative-align state: word-class table (host + device) and the
        # in-flight dispatched holder (see spec_align_start/spec_align_collect)
        self._word_cls: np.ndarray | None = None
        self._word_cls_dev = None
        self._spec: dict | None = None
        self._word_cls_path = os.path.join(
            model_dir, f"align_word_cls_v1_{self.tokenizer.n_vocab}.npy"
        )
        if os.path.exists(self._word_cls_path):
            try:
                tab = np.load(self._word_cls_path)
                if tab.shape == (self.tokenizer.n_vocab,):
                    self._word_cls = tab.astype(np.int8)
            except (OSError, ValueError):
                pass

    def build_word_cls_table(self) -> np.ndarray:
        """Per-vocab-token word class for the speculative align prompt:

          2  the token decodes to exactly ONE CJK character c and
             encode(c) round-trips to [token] — `align()` would emit the
             identical `c TS TS` triplet for it (tokenize_general splits
             CJK per character, align_text.py:46-64);
          1  droppable: tokenize_general(decode(token)) == [] (pure
             punctuation / whitespace — contributes no word);
          0  anything else (multi-char, non-CJK letters/digits, split
             multibyte, non-canonical encodings): host path required.

        The table is what makes the device-assembled prompt EXACT, not
        approximate: a token stream that is all class-1/2 concatenates to a
        text whose kept characters are precisely the class-2 characters,
        each its own word. Cached as a sidecar (~150 KB) in the model dir."""
        n = self.tokenizer.n_vocab
        tab = np.zeros(n, dtype=np.int8)
        for tid in range(n):
            try:
                s = self.tokenizer.token_to_bytes(tid).decode("utf-8")
            except (UnicodeDecodeError, KeyError):
                continue
            words = align_text.tokenize_general(s)
            if not words:
                tab[tid] = 1
            elif (
                len(s) == 1
                and align_text.is_cjk_char(s)
                and self.tokenizer.encode(s, allow_special=False) == [tid]
            ):
                tab[tid] = 2
        self._word_cls = tab
        try:
            np.save(self._word_cls_path, tab)
        except OSError:
            pass
        return tab

    @_serialized
    def spec_align_start(
        self, toks_dev, key, language: str, drop_last: int = 0
    ) -> None:
        """Dispatch the speculative align prefill for a decode block still
        in flight: `toks_dev` is the block's device-resident emitted-token
        buffer (generate.py packed[:-2]); the window must have been
        pre_encode()d under `key`. The dispatch rides the serial device
        stream right behind the decode block, so its compute AND the
        decode result's device->host round trip overlap instead of chaining
        (each fetch costs a ~30-50 ms notification lag on a remote link).
        Collected (and validated exactly) by spec_align_collect."""
        self._spec = None
        lang = (language or "").lower()
        if lang in ("japanese", "korean"):  # non-general tokenize paths
            return
        if self._word_cls is None or self._pre is None or self._pre[0] != key:
            return
        if self._word_cls_dev is None:
            import jax.numpy as jnp

            self._word_cls_dev = jnp.asarray(self._word_cls)
        _, audio_embd, n_audio = self._pre  # NOT consumed: fallback reuses it
        limit = min(TIMESTAMP_CLASSES, self.dec_cfg.lm_head_dim)
        out = self.runner.argmax_at_spec(
            toks_dev, self._word_cls_dev, audio_embd, n_audio, limit,
            (self.ID_AUDIO_START, self.ID_AUDIO_END, self.ID_TIMESTAMP),
            drop_last=drop_last,
        )
        if out is not None:
            self._spec = {"key": key, "out": out, "lang": lang, "t0": time.time()}

    @_serialized
    def spec_align_collect(
        self,
        stable_tokens: list,
        text: str,
        language: str,
        offset_sec: float,
        key,
    ) -> ForcedAlignResult | None:
        """Exact-validated collection of a spec_align_start dispatch, or
        None (caller falls back to align()). Validation is equality, not
        heuristics: every emitted token must be class-1/2 and the class-2
        tokens' characters must equal align()'s own tokenize() of the text
        — when that holds the device-assembled prompt was byte-identical
        to the one align() would build."""
        spec, self._spec = self._spec, None
        if spec is None or spec["key"] != key:
            return None
        if (language or "").lower() != spec["lang"]:
            return None
        tab = self._word_cls
        toks = [int(t) for t in stable_tokens]
        if any(t < 0 or t >= len(tab) or tab[t] == 0 for t in toks):
            return None
        kept = [t for t in toks if tab[t] == 2]
        words = align_text.tokenize(text, language)
        if [self.tokenizer.token_to_bytes(t).decode("utf-8") for t in kept] != words:
            return None
        t_dec0 = time.time()
        out = np.asarray(spec["out"])  # transfer was started at dispatch
        n_words_dev = int(out[-1])
        if n_words_dev != len(kept):
            return None
        # the pre-encoded window was kept around for the fallback path;
        # the speculative result stands, so drop it (never reuse across calls)
        if self._pre is not None and self._pre[0] == key:
            self._pre = None
        if not words:
            return ForcedAlignResult(
                items=align_text.reconcile(text, []),
                performance={"encoder_time": 0.0, "decoder_time": 0.0,
                             "total_time": time.time() - spec["t0"]},
            )
        raw_ts = out[: 2 * len(kept)].tolist()
        fixed = align_text.fix_timestamps(raw_ts)
        ms = np.asarray(fixed, dtype=np.float64) * self.STEP_MS
        items = [
            ForcedAlignItem(
                text=w,
                start_time=float(ms[i * 2] / 1000.0 + offset_sec),
                end_time=float(ms[i * 2 + 1] / 1000.0 + offset_sec),
            )
            for i, w in enumerate(words)
        ]
        return ForcedAlignResult(
            items=align_text.reconcile(text, items),
            performance={
                "encoder_time": 0.0,
                "decoder_time": time.time() - t_dec0,
                "total_time": time.time() - spec["t0"],
                "speculative": 1.0,
            },
        )

    @_serialized
    def pre_encode(self, audio: np.ndarray, key) -> None:
        """Dispatch the encoder for an upcoming align window ahead of its
        text (the window's audio span is known as soon as the PREVIOUS
        chunk's alignment lands — the engine calls this from the align
        worker so the encode overlaps the final chunk's decode instead of
        tailing the pipeline)."""
        self._pre = (
            key,
            self.encoder.encode_async(audio),
            self.encoder.valid_tokens(int(audio.shape[-1])),
        )

    def _korean_scores(self) -> dict:
        """L-dictionary for Korean segmentation. A reference-format dict
        file wins when available (config.ko_dict_path, or a
        korean_dict*.dict dropped into the model dir — byte-compatible with
        the reference's bundled soynlp asset, aligner.py:19-30, so users
        can carry theirs over); otherwise derived from the model's own BPE
        vocabulary (the tokenizer's Hangul merges are the equivalent
        high-frequency word list and travel with every model — but lack the
        single-syllable stems a curated dict has, see
        test_jako_segmentation)."""
        if self._ko_scores is None:
            candidates = [self.config.ko_dict_path] if self.config.ko_dict_path else []
            candidates += [
                os.path.join(self.config.model_dir, "korean_dict.dict"),
                os.path.join(self.config.model_dir, "korean_dict_jieba.dict"),
            ]
            for path in candidates:
                if path and os.path.exists(path):
                    scores: dict[str, float] = {}
                    with open(path, encoding="utf-8") as f:
                        for line in f:
                            line = line.strip()
                            if line:
                                scores[line.split()[0]] = 1.0
                    self._ko_scores = scores
                    return self._ko_scores
            words = []
            for tid in range(self.tokenizer.n_vocab):
                try:
                    words.append(self.tokenizer.token_to_bytes(tid).decode("utf-8").strip())
                except (UnicodeDecodeError, KeyError):
                    continue
            self._ko_scores = align_text.korean_scores_from_vocab(words)
        return self._ko_scores

    @_serialized
    def align(
        self,
        audio: np.ndarray,
        text: str,
        language: str = "Chinese",
        offset_sec: float = 0.0,
        precomputed_key=None,  # reuse a pre_encode()d window when it matches
    ) -> ForcedAlignResult:
        if language:
            language = normalize_language_name(language)
            validate_language(language)
        t_start = time.time()

        # embeddings stay on device; only their count is needed host-side.
        # The full bucket-shaped array is passed through (the audio span
        # mask picks the n_audio valid rows), so align prefill compiles per
        # (mel bucket, prompt bucket) pair, not per audio length.
        t_enc0 = time.time()
        if (
            precomputed_key is not None
            and self._pre is not None
            and self._pre[0] == precomputed_key
        ):
            _, audio_embd, n_audio = self._pre
            self._pre = None
        else:
            audio_embd = self.encoder.encode_async(audio)
            n_audio = self.encoder.valid_tokens(int(audio.shape[-1]))
        t_enc = time.time() - t_enc0  # dispatch time; device overlaps decode build

        ko_scores = self._korean_scores() if (language or "").lower() == "korean" else None
        words = align_text.tokenize(text, language, ko_scores=ko_scores)
        if not words:
            return ForcedAlignResult(items=align_text.reconcile(text, []), performance={
                "encoder_time": t_enc, "decoder_time": 0.0, "total_time": time.time() - t_start,
            })

        pre_ids = [self.ID_AUDIO_START]
        post_ids = [self.ID_AUDIO_END]
        ts_positions: list[int] = []
        prefix_len = len(pre_ids) + n_audio + len(post_ids)
        post_len = 0
        for word in words:
            # word -> token memo: CJK alignment tokenizes per CHARACTER, so
            # a transcript's word set is tiny and heavily repeated — the BPE
            # walk was ~10 ms of host time on the final chunk's critical tail
            word_tokens = self._word_tok.get(word)
            if word_tokens is None:
                word_tokens = self.tokenizer.encode(word, allow_special=False)
                if len(self._word_tok) < 50_000:
                    self._word_tok[word] = word_tokens
            post_ids.extend(word_tokens)
            post_len += len(word_tokens)
            for _ in range(2):  # start & end slots
                ts_positions.append(prefix_len + post_len)
                post_ids.append(self.ID_TIMESTAMP)
                post_len += 1

        n_total = len(pre_ids) + n_audio + len(post_ids)
        ids = np.zeros(n_total, dtype=np.int32)
        ids[: len(pre_ids)] = pre_ids
        ids[len(pre_ids) + n_audio :] = post_ids
        audio_mask = np.zeros(n_total, dtype=bool)
        audio_mask[len(pre_ids) : len(pre_ids) + n_audio] = True

        t_dec0 = time.time()
        limit = min(TIMESTAMP_CLASSES, self.dec_cfg.lm_head_dim)
        raw_ts = self.runner.argmax_at(
            ids, audio_mask, audio_embd, np.asarray(ts_positions, dtype=np.int32), limit
        )
        t_dec = time.time() - t_dec0

        fixed = align_text.fix_timestamps(raw_ts)
        ms = np.asarray(fixed, dtype=np.float64) * self.STEP_MS
        items = [
            ForcedAlignItem(
                text=w,
                start_time=float(ms[i * 2] / 1000.0 + offset_sec),
                end_time=float(ms[i * 2 + 1] / 1000.0 + offset_sec),
            )
            for i, w in enumerate(words)
        ]
        final_items = align_text.reconcile(text, items)
        return ForcedAlignResult(
            items=final_items,
            performance={
                "encoder_time": t_enc,
                "decoder_time": t_dec,
                "total_time": time.time() - t_start,
            },
        )
