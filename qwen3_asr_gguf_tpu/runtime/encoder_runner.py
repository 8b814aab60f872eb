"""Jitted audio-encoder executor with shape bucketing.

Replaces the reference's ONNX sessions + helper subprocess
(encoder.py:119-227 / asr_worker.py): one compiled program runs
mel -> conv frontend -> transformer backend on device. Fixed-size ASR
chunks (engine zero-pads every chunk to chunk_size, asr.py:317-318) hit a
single compiled shape with the mel stage fused on device; variable-length
aligner slices compute the mel on host (exact reference semantics,
encoder.py:208-220) and run the encoder on a 5-second-bucketed shape with
padded keys masked out.

Dispatch is asynchronous: `encode_async` returns a device future; the
3-stage pipeline overlap the reference built from mp.Queues falls out of
JAX's async dispatch.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.mel import HOP, LogMelFrontend, log_mel_np
from ..models import encoder as enc
from ..models.configs import AudioEncoderConfig

SAMPLE_RATE = 16_000


class EncoderRunner:
    def __init__(
        self,
        params: dict,
        cfg: AudioEncoderConfig,
        *,
        mel_filters: np.ndarray | None = None,
        bucket_frames: int = 500,  # 5 s granularity for variable inputs
        warmup_sec: float = 0.0,
    ):
        # params may arrive as host numpy (quantized host-side); pin them on
        # device once so jitted calls don't re-transfer per invocation.
        # f16 leaves (the half-precision ladder rung) upload at half the
        # bytes and convert to bf16 on device (TPU-native half type).
        # Host-numpy conv weights are pre-transposed OIHW -> HWIO so the
        # conv argument lands in its TPU-preferred layout (see
        # encoder.conv_frontend); device-array params keep OIHW.
        params = dict(params)
        for name in ("conv1_w", "conv2_w", "conv3_w"):
            w = params.get(name)
            if isinstance(w, np.ndarray) and w.ndim == 4 and w.shape[-2:] == (3, 3):
                params[name] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
        self.params = jax.device_put(params)
        if any(
            getattr(leaf, "dtype", None) == jnp.float16
            for leaf in jax.tree.leaves(self.params)
        ):
            self.params = jax.jit(
                lambda p: jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float16 else a, p
                )
            )(self.params)
        self.cfg = cfg
        self.frontend = LogMelFrontend(filters=mel_filters)
        # bucket must stay on the n_window conv grid
        self.bucket_frames = max(
            cfg.n_window, bucket_frames // cfg.n_window * cfg.n_window
        )

        # quantized encoders run the backend in bf16 on TPU: the transformer
        # activations were f32 (mel dtype), paying the MXU's 4x-slower f32
        # emulation on every attention/residual op. Norms/GELU still compute
        # f32 internally; weights keep their own precision. f32 masters (and
        # every CPU/test path) stay f32.
        from ..ops.qtensor import Int8Weight, Q4Weight

        quantized = isinstance(params.get("proj1_w"), (Int8Weight, Q4Weight))
        compute_dtype = (
            jnp.bfloat16
            if quantized and jax.default_backend() == "tpu"
            else None
        )

        def _backend_in(hidden):
            return hidden.astype(compute_dtype) if compute_dtype is not None else hidden

        @jax.jit
        def _encode_audio(params, audio):
            """Fused mel+encoder for hop-aligned, n_window-aligned audio."""
            mel = self.frontend.device_call(audio)
            hidden = enc.conv_frontend(params, cfg, mel)
            return enc.backend_transformer(params, cfg, _backend_in(hidden))

        @jax.jit
        def _encode_audio_batch(params, audios):
            """Vmapped twin of `_encode_audio` for same-length aligned
            audios (serving admission cohorts: one dispatch, batched MXU)."""
            return jax.vmap(lambda a: _encode_audio(params, a))(audios)

        @jax.jit
        def _encode_mel(params, mel, valid_tokens):
            hidden = enc.conv_frontend(params, cfg, mel)
            return enc.backend_transformer(
                params, cfg, _backend_in(hidden), valid_tokens=valid_tokens
            )

        from functools import partial as _partial

        from ..audio.mel import _log_mel_padded_jit

        def _varlen_one(params, y, valid_frames, valid_tokens, n_frames_bucket: int):
            """Variable-length body fully on device: mel (exact host-twin on
            the reflect-padded signal) + conv + backend in ONE program — the
            host mel was ~21 ms of single-core numpy on the align tail, plus
            a mel upload whose cross-stream sync stalls the consumer."""
            mel = _log_mel_padded_jit(
                y, self.frontend._filters_dev, valid_frames, n_frames_bucket
            )
            hidden = enc.conv_frontend(params, cfg, mel)
            return enc.backend_transformer(
                params, cfg, _backend_in(hidden), valid_tokens=valid_tokens
            )

        _encode_varlen = _partial(jax.jit, static_argnames=("n_frames_bucket",))(
            _varlen_one
        )

        @_partial(jax.jit, static_argnames=("n_frames_bucket",))
        def _encode_varlen_batch(params, ys, valid_frames, valid_tokens,
                                 n_frames_bucket: int):
            """Same-bucket cohort encode: ONE program + vmapped batch —
            serving admission was paying one remote dispatch per request."""
            return jax.vmap(
                lambda y, vf, vt: _varlen_one(params, y, vf, vt, n_frames_bucket)
            )(ys, valid_frames, valid_tokens)

        self._encode_audio = _encode_audio
        self._encode_audio_batch = _encode_audio_batch
        self._encode_mel = _encode_mel
        self._encode_varlen = _encode_varlen
        self._encode_varlen_batch = _encode_varlen_batch

        if warmup_sec > 0:
            noise = np.random.default_rng(0).standard_normal(
                int(SAMPLE_RATE * warmup_sec)
            ).astype(np.float32)
            jax.block_until_ready(self.encode_async(noise))

    # -- async dispatch ----------------------------------------------------

    def encode_async(self, audio: np.ndarray, *, bucketed: bool = False) -> jax.Array:
        """Dispatch encoding; returns an unwaited device array.

        The result is [t_padded, D] with only the first
        `valid_tokens(audio)` rows meaningful for non-aligned lengths.

        `bucketed=True` forces the bucket-padded variable-length program
        even for hop/window-aligned audio. The aligned fast path compiles
        ONE program PER EXACT LENGTH — right for the engine's fixed-size
        chunks, pathological for a streaming session whose accumulated
        audio grows by one chunk per step (every step a new program; on
        this platform even a compile-cache HIT costs seconds of
        per-process executable load). Bucketed, a session loads
        O(log T) encoder programs and the mel_bucket prewarm key matches
        the program actually run.
        """
        n = int(audio.shape[-1])
        frames = n // HOP
        if frames == 0:
            raise ValueError("audio shorter than one mel hop (10 ms)")
        if not bucketed and n % SAMPLE_RATE == 0 and frames % self.cfg.n_window == 0:
            return self._encode_audio(self.params, jnp.asarray(audio, dtype=jnp.float32))

        # variable-length path: device mel (exact twin of the host path on
        # the reflect-padded slice) + bucket-padded device encoder, one
        # program. Device arrays fall back to host via a single download
        # (rare: align windows are host slices in production).
        from ..audio.mel import pad_signal_for_bucket

        bucket = self.mel_bucket(frames)
        valid = enc.get_feat_extract_output_lengths(frames, self.cfg.n_window)
        if isinstance(audio, np.ndarray):
            y = pad_signal_for_bucket(audio, bucket)
            return self._encode_varlen(
                self.params, jnp.asarray(y), jnp.int32(frames), jnp.int32(valid), bucket
            )
        mel = log_mel_np(np.asarray(audio), self.frontend.filters)  # [128, frames]
        mel_padded = np.pad(mel, ((0, 0), (0, bucket - frames)))
        return self._encode_mel(self.params, jnp.asarray(mel_padded), jnp.int32(valid))

    def batch_key(self, audio) -> tuple:
        """Grouping key for `encode_batch_async`: audios with equal keys can
        share one vmapped program (same compiled shape + same code path)."""
        n = int(audio.shape[-1])
        frames = max(n // HOP, 1)
        if n % SAMPLE_RATE == 0 and frames % self.cfg.n_window == 0:
            return ("aligned", n)
        return ("varlen", self.mel_bucket(frames))

    def encode_batch_async(self, audios: list) -> list:
        """Dispatch same-`batch_key` host audios as ONE vmapped program;
        returns per-audio device arrays ([t_padded, D] each, first
        `valid_tokens(audio)` rows meaningful)."""
        from ..audio.mel import pad_signal_for_bucket

        keys = {self.batch_key(a) for a in audios}
        if len(keys) != 1:
            raise ValueError(f"mixed encode batch keys: {keys}")
        kind, _ = keys.pop()
        if kind == "aligned":
            ys = np.stack([np.asarray(a, np.float32) for a in audios])
            out = self._encode_audio_batch(self.params, jnp.asarray(ys))
            return [out[i] for i in range(len(audios))]
        frames = [max(int(a.shape[-1]) // HOP, 1) for a in audios]
        bucket = self.mel_bucket(max(frames))
        ys = np.stack([
            pad_signal_for_bucket(np.asarray(a, np.float32), bucket) for a in audios
        ])
        valids = [
            enc.get_feat_extract_output_lengths(f, self.cfg.n_window) for f in frames
        ]
        out = self._encode_varlen_batch(
            self.params, jnp.asarray(ys),
            jnp.asarray(frames, dtype=jnp.int32),
            jnp.asarray(valids, dtype=jnp.int32), bucket,
        )
        return [out[i] for i in range(len(audios))]

    def mel_bucket(self, frames: int) -> int:
        """Frame bucket for variable-length inputs: linear 5 s steps up to
        50 s (covers every forced-aligner window: chunk + 10 s lookback,
        engine.run_align), then geometric doubling so an unbounded streaming
        session compiles O(log T) encoder shapes (padded keys are masked, so
        longer buckets only waste compute)."""
        b = self.bucket_frames
        while b < frames:
            b = b + self.bucket_frames if b < 5000 else b * 2
        return b

    def valid_tokens(self, audio_len: int) -> int:
        return enc.get_feat_extract_output_lengths(audio_len // HOP, self.cfg.n_window)

    # -- reference-compatible sync API ------------------------------------

    def encode(self, audio: np.ndarray) -> tuple[np.ndarray, float]:
        """audio [n] -> (embedding [T, D] f32, elapsed_s); reference
        QwenAudioEncoder.encode signature (encoder.py:208-227)."""
        t0 = time.time()
        out = self.encode_async(audio)
        embd = np.asarray(out, dtype=np.float32)[: self.valid_tokens(int(audio.shape[-1]))]
        return embd, time.time() - t0
