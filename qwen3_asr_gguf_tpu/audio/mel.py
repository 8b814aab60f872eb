"""Log-mel spectrogram frontend, as a jitted TPU program.

Pipeline semantics match the reference's Whisper-style extractor
(qwen_asr_gguf/inference/encoder.py:76-107): reflect-pad (center), Hann
window, 400-pt rFFT at hop 160, power spectrum, 128-bin slaney mel bank
(0-8 kHz), log10, dynamic-range clamp to (max - 8), (x+4)/4 normalize,
truncate to len(audio)//160 frames.

TPU-first design: the STFT is a dense real-DFT **matmul** (frames[F,400] x
DFT[400,402]) instead of an FFT — at n_fft=400 the matmul rides the MXU and
fuses with windowing and the mel projection; XLA's FFT path would be slower
and breaks 128-lane tiling at 201 bins.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP = 160
N_MELS = 128
F_MAX = 8_000.0


def _hz_to_mel_slaney(freq: np.ndarray | float) -> np.ndarray | float:
    f_sp = 200.0 / 3
    mels = np.asarray(freq, dtype=np.float64) / f_sp
    min_log_hz = 1000.0
    logstep = np.log(6.4) / 27.0
    min_log_mel = min_log_hz / f_sp
    return np.where(
        np.asarray(freq) >= min_log_hz,
        min_log_mel + np.log(np.maximum(np.asarray(freq, dtype=np.float64), 1e-10) / min_log_hz) / logstep,
        mels,
    )


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    f_sp = 200.0 / 3
    freqs = np.asarray(mels, dtype=np.float64) * f_sp
    min_log_hz = 1000.0
    logstep = np.log(6.4) / 27.0
    min_log_mel = min_log_hz / f_sp
    return np.where(mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


def mel_filterbank(
    sr: int = SAMPLE_RATE, n_fft: int = N_FFT, n_mels: int = N_MELS,
    f_min: float = 0.0, f_max: float = F_MAX,
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular filterbank [n_freqs, n_mels]."""
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sr // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_slaney(f_min), _hz_to_mel_slaney(f_max), n_mels + 2)
    f_pts = _mel_to_hz_slaney(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0, np.minimum(down, up))
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    fb *= enorm[None, :]
    return fb.astype(np.float32)


@lru_cache(maxsize=2)
def _dft_constants(n_fft: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(window, dft_cos [n_fft, n_bins], dft_sin) as float32 host constants."""
    window = np.hanning(n_fft + 1)[:-1].astype(np.float32)  # periodic Hann
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[None, :]
    n = np.arange(n_fft)[:, None]
    ang = -2.0 * np.pi * n * k / n_fft
    return window, np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@partial(jax.jit, static_argnames=("n_frames_out",))
def _log_mel_jit(audio: jax.Array, filters: jax.Array, n_frames_out: int) -> jax.Array:
    window, dft_cos, dft_sin = _dft_constants(N_FFT)
    pad = N_FFT // 2
    y = jnp.pad(audio, pad, mode="reflect")
    num_frames = 1 + (y.shape[0] - N_FFT) // HOP
    # gather-free framing: frame f = y[f*HOP : f*HOP+N_FFT] is covered by 3
    # consecutive HOP-rows (3*HOP=480 >= 400), so three SLICES of a
    # [F+2, HOP] reshape replace a [F, 400] index gather (the gather was
    # ~11 ms of the 40 s encode on v5e; the slices are free). The 80 extra
    # lanes carry window=0 so they contribute exact zeros to the DFT dot.
    span = 3 * HOP
    y2 = jnp.pad(y, (0, (num_frames + 2) * HOP - y.shape[0]))
    rows = y2.reshape(num_frames + 2, HOP)
    f_span = jnp.concatenate([rows[:-2], rows[1:-1], rows[2:]], axis=1)  # [F, 480]
    window = np.pad(window, (0, span - N_FFT))
    frames = f_span * jnp.asarray(window)
    dft_cos = np.pad(dft_cos, ((0, span - N_FFT), (0, 0)))
    dft_sin = np.pad(dft_sin, ((0, span - N_FFT), (0, 0)))

    re = jnp.dot(frames, jnp.asarray(dft_cos), preferred_element_type=jnp.float32)
    im = jnp.dot(frames, jnp.asarray(dft_sin), preferred_element_type=jnp.float32)
    power = re * re + im * im  # [F, n_bins]

    mel = jnp.dot(power, filters, preferred_element_type=jnp.float32)  # [F, n_mels]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = log_spec[:n_frames_out]
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).T  # [n_mels, F]


@partial(jax.jit, static_argnames=("n_frames_bucket",))
def _log_mel_padded_jit(
    y: jax.Array,  # [n_frames_bucket*HOP + 3*HOP] reflect-padded signal,
    #                zero-extended to the bucket (host does the reflect pad
    #                so boundary frames read REAL samples — exact twin of
    #                log_mel_np on the valid prefix)
    filters: jax.Array,
    valid_frames: jax.Array,  # int32 scalar <= n_frames_bucket
    n_frames_bucket: int,
) -> jax.Array:
    """Variable-length (bucketed) device mel: [128, n_frames_bucket] with
    frames >= valid_frames zeroed (the reference zero-pads mel to the conv
    grid, encoder.py:164-168). The dynamic-range clamp maxes over VALID
    frames only, exactly like the host path on the sliced audio."""
    window, dft_cos, dft_sin = _dft_constants(N_FFT)
    span = 3 * HOP
    rows = y.reshape(n_frames_bucket + 3, HOP)
    f_span = jnp.concatenate([rows[:-3], rows[1:-2], rows[2:-1]], axis=1)
    window = np.pad(window, (0, span - N_FFT))
    frames = f_span * jnp.asarray(window)
    dft_cos = np.pad(dft_cos, ((0, span - N_FFT), (0, 0)))
    dft_sin = np.pad(dft_sin, ((0, span - N_FFT), (0, 0)))
    re = jnp.dot(frames, jnp.asarray(dft_cos), preferred_element_type=jnp.float32)
    im = jnp.dot(frames, jnp.asarray(dft_sin), preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, filters, preferred_element_type=jnp.float32)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    valid = jnp.arange(n_frames_bucket, dtype=jnp.int32)[:, None] < valid_frames
    vmax = jnp.max(jnp.where(valid, log_spec, -jnp.inf))
    log_spec = jnp.maximum(log_spec, vmax - 8.0)
    out = jnp.where(valid, (log_spec + 4.0) / 4.0, 0.0)
    return out.T  # [n_mels, n_frames_bucket]


def pad_signal_for_bucket(audio: np.ndarray, n_frames_bucket: int) -> np.ndarray:
    """Host half of the variable-length device mel: reflect-pad the exact
    slice (reference center padding) and zero-extend to the bucket's
    framing span."""
    pad = N_FFT // 2
    y = np.pad(audio.astype(np.float32), pad, mode="reflect")
    out = np.zeros((n_frames_bucket + 3) * HOP, np.float32)
    out[: len(y)] = y[: len(out)]
    return out


def log_mel_np(audio: np.ndarray, filters: np.ndarray) -> np.ndarray:
    """Host (NumPy) twin of the jitted pipeline — bit-compatible semantics.

    Used for arbitrary-length inputs (forced-aligner slices) where a device
    recompile per length would cost more than the host matmul.
    """
    window, dft_cos, dft_sin = _dft_constants(N_FFT)
    pad = N_FFT // 2
    y = np.pad(audio.astype(np.float32), pad, mode="reflect")
    num_frames = 1 + (len(y) - N_FFT) // HOP
    idx = np.arange(num_frames)[:, None] * HOP + np.arange(N_FFT)[None, :]
    frames = y[idx] * window
    re = frames @ dft_cos
    im = frames @ dft_sin
    power = re * re + im * im
    mel = power @ filters
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = log_spec[: audio.shape[-1] // HOP]
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return (((log_spec + 4.0) / 4.0).T).astype(np.float32)


class LogMelFrontend:
    """Callable matching the reference FastWhisperMel API: audio -> [128, T]."""

    def __init__(self, filter_path: str | None = None, filters: np.ndarray | None = None):
        if filters is not None:
            self.filters = np.asarray(filters, dtype=np.float32)
        elif filter_path is not None:
            self.filters = np.load(filter_path).astype(np.float32)
        else:
            self.filters = mel_filterbank()
        self._filters_dev = jnp.asarray(self.filters)

    def __call__(self, audio: np.ndarray | jax.Array, dtype=np.float32) -> np.ndarray:
        audio = jnp.asarray(audio, dtype=jnp.float32)
        n_out = int(audio.shape[-1]) // HOP
        out = _log_mel_jit(audio, self._filters_dev, n_out)
        return np.asarray(out, dtype=dtype)

    def device_call(self, audio: jax.Array) -> jax.Array:
        """On-device variant for fusing into the encoder program."""
        return _log_mel_jit(audio, self._filters_dev, int(audio.shape[-1]) // HOP)
