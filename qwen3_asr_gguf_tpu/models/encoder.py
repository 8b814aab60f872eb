"""Qwen3-ASR audio encoder in functional JAX.

Semantics (reference modeling_qwen3_asr.py:603-740 and the product's ONNX
split, modeling_qwen3_asr_onnx.py:7-115):

frontend  : mel [128, T] -> per-100-frame chunks -> 3x (conv2d k3 s2 p1 +
            exact GELU) -> flatten -> conv_out linear (no bias) -> +cyclic
            sinusoid positions [0..12] -> concat -> [T_out, d_model]
backend   : pre-LN transformer (LayerNorm, biased QKV/out, GELU FFN) ->
            ln_post -> proj1 -> GELU -> proj2 -> [T_out, output_dim]

TPU-first deviations from the reference *mechanism* (not semantics):
- the reference loops the frontend ONNX once per 1-second chunk
  (encoder.py:176-181); here all chunks run as ONE batched conv program;
- attention_mode="full" reproduces the product behavior (all-zeros additive
  mask per <=80 s input, encoder.py:192-206); "windowed" reproduces the
  official block-diagonal windows by reshaping uniform windows into the
  batch axis (no mask materialization) — cu_seqlens become a reshape.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.qtensor import matmul
from .configs import AudioEncoderConfig

Params = dict[str, Any]


def sinusoid_positions(length: int, channels: int, max_timescale: float = 10_000.0) -> np.ndarray:
    """Whisper-style sin/cos table (reference modeling_qwen3_asr.py:579-594)."""
    inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2, dtype=np.float64))
    scaled = np.arange(length, dtype=np.float64)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def get_feat_extract_output_lengths(input_length: int, n_window: int = 100) -> int:
    """Valid encoder tokens for a mel length (reference encoder.py:109-117)."""
    leave = input_length % n_window
    feat = (leave - 1) // 2 + 1
    out = ((feat - 1) // 2 + 1 - 1) // 2 + 1
    full = input_length // n_window
    per_win = n_window
    for _ in range(3):
        per_win = (per_win - 1) // 2 + 1
    return out + full * per_win


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------


def init_params(cfg: AudioEncoderConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    c, d, l = cfg.downsample_hidden_size, cfg.d_model, cfg.encoder_layers
    ks = jax.random.split(key, 12)

    def w(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    layers = {
        "ln1_w": jnp.ones((l, d), dtype), "ln1_b": jnp.zeros((l, d), dtype),
        "q_w": w(ks[0], (l, d, d)), "q_b": jnp.zeros((l, d), dtype),
        "k_w": w(ks[1], (l, d, d)), "k_b": jnp.zeros((l, d), dtype),
        "v_w": w(ks[2], (l, d, d)), "v_b": jnp.zeros((l, d), dtype),
        "o_w": w(ks[3], (l, d, d)), "o_b": jnp.zeros((l, d), dtype),
        "ln2_w": jnp.ones((l, d), dtype), "ln2_b": jnp.zeros((l, d), dtype),
        "fc1_w": w(ks[4], (l, cfg.encoder_ffn_dim, d)), "fc1_b": jnp.zeros((l, cfg.encoder_ffn_dim), dtype),
        "fc2_w": w(ks[5], (l, d, cfg.encoder_ffn_dim)), "fc2_b": jnp.zeros((l, d), dtype),
    }
    return {
        "conv1_w": w(ks[6], (c, 1, 3, 3)), "conv1_b": jnp.zeros((c,), dtype),
        "conv2_w": w(ks[7], (c, c, 3, 3)), "conv2_b": jnp.zeros((c,), dtype),
        "conv3_w": w(ks[8], (c, c, 3, 3)), "conv3_b": jnp.zeros((c,), dtype),
        "conv_out": w(ks[9], (d, cfg.conv_feat_dim)),
        "pos_embed": jnp.asarray(sinusoid_positions(cfg.max_source_positions, d)).astype(dtype),
        "layers": layers,
        "ln_post_w": jnp.ones((d,), dtype), "ln_post_b": jnp.zeros((d,), dtype),
        "proj1_w": w(ks[10], (d, d)), "proj1_b": jnp.zeros((d,), dtype),
        "proj2_w": w(ks[11], (cfg.output_dim, d)), "proj2_b": jnp.zeros((cfg.output_dim,), dtype),
    }


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def _layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def conv_frontend(params: Params, cfg: AudioEncoderConfig, mel: jax.Array) -> jax.Array:
    """mel [n_mels, T] (T % n_window == 0) -> [T//n_window * 13, d_model].

    All 1-second chunks are convolved as one batch (the reference's Python
    loop over ONNX calls, encoder.py:176-181, becomes a single program).
    Each chunk gets the same cyclic positions 0..12
    (modeling_qwen3_asr_onnx.py:37-47).
    """
    n_mels, t = mel.shape
    n_chunks = t // cfg.n_window
    x = mel.reshape(n_mels, n_chunks, cfg.n_window).transpose(1, 0, 2)
    x = x[:, None, :, :]  # [N, 1, mels, win]

    for i in (1, 2, 3):
        w = params[f"conv{i}_w"]
        b = params[f"conv{i}_b"]
        # HWIO [3, 3, I, O] weights (pre-transposed at load for TPU) keep
        # the default {3,2,1,0} layout = output-feature minor, which is what
        # the TPU conv kernel wants — OIHW args were costing a ~6 ms
        # layout-change copy PER CONV PER CALL on v5e. OIHW still accepted
        # (torch-parity tests, f32 path).
        rhs = "HWIO" if w.shape[0] == 3 and w.shape[1] == 3 else "OIHW"
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", rhs, "NCHW"))
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=dn,
        )
        x = _gelu(x + b[None, :, None, None])

    n, c, f, tw = x.shape  # [N, C, mels/8, win/8]
    x = x.transpose(0, 3, 1, 2).reshape(n, tw, c * f)
    x = matmul(x, params["conv_out"])  # [N, tw, d_model]
    x = x + params["pos_embed"][None, :tw, :].astype(x.dtype)
    return x.reshape(n * tw, -1)


def _mha(layer: Params, cfg: AudioEncoderConfig, x: jax.Array, key_mask=None) -> jax.Array:
    """x [B, T, D] bidirectional attention within each batch row.

    `key_mask` [T] bool (optional): False keys are excluded — used to hide
    bucket padding so padded prefill equals unpadded (static shapes).
    """
    b, t, d = x.shape
    h = cfg.encoder_attention_heads
    hd = d // h
    q = (matmul(x, layer["q_w"]) + layer["q_b"]).reshape(b, t, h, hd)
    k = (matmul(x, layer["k_w"]) + layer["k_b"]).reshape(b, t, h, hd)
    v = (matmul(x, layer["v_w"]) + layer["v_b"]).reshape(b, t, h, hd)
    # native-dtype dots with f32 accumulation (decoder convention): bf16
    # activations ride the MXU bf16 rate; f32 inputs are unchanged
    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores * (hd ** -0.5)
    if key_mask is not None:
        if key_mask.ndim == 1:  # same keys for every row
            scores = jnp.where(key_mask[None, None, None, :], scores, -1e30)
        else:  # [B, T] per-row keys (windowed tail padding)
            scores = jnp.where(key_mask[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhts,bshd->bthd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    out = out.reshape(b, t, d)
    return matmul(out, layer["o_w"]) + layer["o_b"]


def backend_transformer(
    params: Params, cfg: AudioEncoderConfig, hidden: jax.Array, valid_tokens=None,
    sp_axis: str | None = None,
) -> jax.Array:
    """hidden [T, d_model] -> [T, output_dim].

    `valid_tokens` (traced int32 scalar, optional): number of leading valid
    rows; later keys are masked out of attention (full mode only) so a
    bucket-padded call equals the unpadded one on the valid prefix.

    `sp_axis` (windowed mode only): sequence parallelism for long
    single-shot encodes — the block-diagonal attention windows are
    independent, so the window axis shards over the mesh axis and every
    layer computes its local windows with ZERO collectives (the one
    all-gather happens implicitly at the output reshape). This is the
    TPU-native scaling for >80 s inputs the reference handles by
    host-splitting (SURVEY.md §5 long-context).
    """
    t = hidden.shape[0]
    key_mask = None
    if cfg.attention_mode == "windowed":
        # window = n_window_infer mel frames of conv chunks. NOTE our
        # n_window (conv-chunk frames, 100) equals the reference's
        # 2*n_window (its configs ship n_window=50; the modeling's
        # hard-coded %100 length formula only works for 100-frame conv
        # chunks): reference window_aftercnn = 13 * (n_window_infer //
        # (ref_n_window*2)) = 52 tokens (modeling_qwen3_asr.py:719-726)
        win = cfg.tokens_per_window * (cfg.n_window_infer // cfg.n_window)
        pad = (-t) % win
        x = jnp.pad(hidden, ((0, pad), (0, 0)))
        x = x.reshape(-1, win, hidden.shape[1])
        if pad:
            # the remainder window must not attend to its zero-padded tail
            # (the reference's cu_seqlens block gives it an exact-length
            # block, modeling_qwen3_asr.py:719-726)
            key_mask = (
                jnp.arange(x.shape[0] * win, dtype=jnp.int32).reshape(x.shape[0], win) < t
            )
    else:
        x = hidden[None, :, :]
        pad = 0
        if valid_tokens is not None:
            key_mask = jnp.arange(t, dtype=jnp.int32) < valid_tokens

    if sp_axis is not None and cfg.attention_mode == "windowed":
        from jax.sharding import PartitionSpec as _P

        x = jax.lax.with_sharding_constraint(x, _P(sp_axis, None, None))

    def layer_fn(h, layer):
        # f32 biases promote the residual stream; cast back so a bf16
        # compute dtype survives the scan carry
        attn = _mha(layer, cfg, _layer_norm(h, layer["ln1_w"], layer["ln1_b"]), key_mask)
        h = h + attn.astype(h.dtype)
        y = _layer_norm(h, layer["ln2_w"], layer["ln2_b"])
        y = matmul(y, layer["fc1_w"]) + layer["fc1_b"]
        y = _gelu(y)
        y = matmul(y, layer["fc2_w"]) + layer["fc2_b"]
        return h + y.astype(h.dtype), None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    x = x.reshape(-1, hidden.shape[1])
    if pad:
        x = x[:t]

    x = _layer_norm(x, params["ln_post_w"], params["ln_post_b"])
    x = _gelu(matmul(x, params["proj1_w"]) + params["proj1_b"])
    return matmul(x, params["proj2_w"]) + params["proj2_b"]


def encode(
    params: Params, cfg: AudioEncoderConfig, mel: jax.Array, valid_mel_len: int | None = None
) -> jax.Array:
    """mel [n_mels, T] -> audio embeddings [t_out, output_dim].

    T must already be padded to a multiple of n_window (static shape); the
    valid output length is computed from `valid_mel_len` (defaults to T) and
    the result is sliced accordingly (reference encoder.py:160-190).
    """
    t = mel.shape[1]
    if t % cfg.n_window:
        raise ValueError(f"mel length {t} not padded to n_window={cfg.n_window}")
    hidden = conv_frontend(params, cfg, mel)
    t_out = get_feat_extract_output_lengths(
        t if valid_mel_len is None else valid_mel_len, cfg.n_window
    )
    # Slice padding garbage *before* the backend so full attention only sees
    # valid frames (reference encoder.py:186-189 slices between the stages).
    hidden = hidden[:t_out]
    return backend_transformer(params, cfg, hidden)
