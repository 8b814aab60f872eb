"""Audio encoder parity vs a torch oracle of the official architecture.

The oracle below is an independent torch transcription of the audio-tower
semantics (conv2d k3 s2 p1 x3 + exact GELU, flatten, conv_out, cyclic 13-pos
sinusoid embedding, pre-LN transformer, ln_post -> proj1 -> GELU -> proj2;
reference modeling_qwen3_asr.py:603-740 / modeling_qwen3_asr_onnx.py:7-115).
Gate: cosine >= 0.999 per SURVEY.md §7 stage 3 (we assert much tighter).
"""

import numpy as np
import pytest

import jax.numpy as jnp
import jax

from qwen3_asr_gguf_tpu.models import encoder as enc
from qwen3_asr_gguf_tpu.models.configs import AudioEncoderConfig

CFG = AudioEncoderConfig(
    num_mel_bins=128,
    d_model=64,
    encoder_layers=2,
    encoder_attention_heads=4,
    encoder_ffn_dim=128,
    downsample_hidden_size=32,
    output_dim=48,
)


def _torch_oracle_forward(params, mel: np.ndarray, valid_len: int) -> np.ndarray:
    torch = pytest.importorskip("torch")
    F = torch.nn.functional

    def t(name):
        return torch.tensor(np.asarray(params[name], dtype=np.float32))

    x = torch.tensor(mel[None])  # [1, 128, T]
    T = x.shape[-1]
    chunks = x[0].T.reshape(T // 100, 100, 128).permute(0, 2, 1)  # [N, 128, 100]
    h = chunks[:, None]
    for i in (1, 2, 3):
        h = F.gelu(F.conv2d(h, t(f"conv{i}_w"), t(f"conv{i}_b"), stride=2, padding=1))
    n, c, f, tw = h.shape
    h = h.permute(0, 3, 1, 2).reshape(n, tw, c * f)
    h = h @ t("conv_out").T
    pos = torch.tensor(np.asarray(params["pos_embed"][:tw], dtype=np.float32))
    h = h + pos[None]
    h = h.reshape(n * tw, -1)[:valid_len]

    layers = params["layers"]
    L = np.asarray(layers["ln1_w"]).shape[0]
    hd = CFG.d_model // CFG.encoder_attention_heads
    for i in range(L):
        def lt(name):
            return torch.tensor(np.asarray(layers[name][i], dtype=np.float32))

        y = F.layer_norm(h, (CFG.d_model,), lt("ln1_w"), lt("ln1_b"))
        q = (y @ lt("q_w").T + lt("q_b")).reshape(-1, CFG.encoder_attention_heads, hd)
        k = (y @ lt("k_w").T + lt("k_b")).reshape(-1, CFG.encoder_attention_heads, hd)
        v = (y @ lt("v_w").T + lt("v_b")).reshape(-1, CFG.encoder_attention_heads, hd)
        scores = torch.einsum("thd,shd->hts", q, k) * hd ** -0.5
        attn = torch.einsum("hts,shd->thd", scores.softmax(-1), v).reshape(-1, CFG.d_model)
        h = h + attn @ lt("o_w").T + lt("o_b")
        y = F.layer_norm(h, (CFG.d_model,), lt("ln2_w"), lt("ln2_b"))
        y = F.gelu(y @ lt("fc1_w").T + lt("fc1_b"))
        h = h + y @ lt("fc2_w").T + lt("fc2_b")

    h = F.layer_norm(h, (CFG.d_model,), t("ln_post_w"), t("ln_post_b"))
    h = F.gelu(h @ t("proj1_w").T + t("proj1_b"))
    h = h @ t("proj2_w").T + t("proj2_b")
    return h.numpy()


def test_feat_extract_output_lengths():
    # reference formula (encoder.py:109-117): 13 tokens per full 100 frames
    assert enc.get_feat_extract_output_lengths(100) == 13
    assert enc.get_feat_extract_output_lengths(400) == 52
    assert enc.get_feat_extract_output_lengths(150) == 13 + 7
    assert enc.get_feat_extract_output_lengths(101) == 13 + 1


def test_encoder_matches_torch_oracle(rng):
    params = enc.init_params(CFG, jax.random.key(0))
    mel = rng.standard_normal((128, 300)).astype(np.float32) * 0.5
    valid = enc.get_feat_extract_output_lengths(300)

    ref = _torch_oracle_forward(params, mel, valid)
    ours = np.asarray(enc.encode(params, CFG, jnp.asarray(mel)))

    assert ours.shape == ref.shape == (valid, CFG.output_dim)
    a, b = ours.ravel(), ref.ravel()
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99999, cos
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_encode_padded_equals_unpadded_prefix(rng):
    """Padding to the 100-frame grid must not change valid outputs."""
    params = enc.init_params(CFG, jax.random.key(1))
    mel_valid = rng.standard_normal((128, 250)).astype(np.float32)
    mel_padded = np.concatenate([mel_valid, np.zeros((128, 50), np.float32)], axis=1)

    out = np.asarray(enc.encode(params, CFG, jnp.asarray(mel_padded), valid_mel_len=250))
    assert out.shape[0] == enc.get_feat_extract_output_lengths(250)

    # same audio padded to 400 must give identical valid rows
    mel_padded2 = np.concatenate([mel_valid, np.zeros((128, 150), np.float32)], axis=1)
    out2 = np.asarray(enc.encode(params, CFG, jnp.asarray(mel_padded2), valid_mel_len=250))
    np.testing.assert_allclose(out, out2, atol=1e-5)


def test_windowed_attention_mode(rng):
    """Block-diagonal windows: tokens in different windows don't interact."""
    cfg = AudioEncoderConfig(
        num_mel_bins=128, d_model=64, encoder_layers=1, encoder_attention_heads=4,
        encoder_ffn_dim=128, downsample_hidden_size=32, output_dim=48,
        attention_mode="windowed",
    )
    params = enc.init_params(cfg, jax.random.key(2))
    win = cfg.tokens_per_window * (cfg.n_window_infer // cfg.n_window)  # 52
    hidden = rng.standard_normal((2 * win, cfg.d_model)).astype(np.float32)

    full = np.asarray(enc.backend_transformer(params, cfg, jnp.asarray(hidden)))
    # perturb window 2; window 1 outputs must be bit-identical
    hidden2 = hidden.copy()
    hidden2[win:] += rng.standard_normal((win, cfg.d_model)).astype(np.float32)
    out2 = np.asarray(enc.backend_transformer(params, cfg, jnp.asarray(hidden2)))
    np.testing.assert_array_equal(full[:win], out2[:win])
    assert np.abs(full[win:] - out2[win:]).max() > 1e-3


def test_windowed_tail_padding_masked(rng):
    """A remainder window must equal running that window alone: the
    zero-padded tail is masked out of attention (reference cu_seqlens gives
    the last block its exact length, modeling_qwen3_asr.py:719-726)."""
    cfg = AudioEncoderConfig(
        num_mel_bins=128, d_model=64, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=128, downsample_hidden_size=32, output_dim=48,
        attention_mode="windowed",
    )
    params = enc.init_params(cfg, jax.random.key(3))
    win = cfg.tokens_per_window * (cfg.n_window_infer // cfg.n_window)  # 52
    tail = 7
    hidden = rng.standard_normal((win + tail, cfg.d_model)).astype(np.float32)

    out = np.asarray(enc.backend_transformer(params, cfg, jnp.asarray(hidden)))
    # the tail window run by itself (exactly `tail` tokens, no padding)
    out_tail_alone = np.asarray(
        enc.backend_transformer(params, cfg, jnp.asarray(hidden[win:]))
    )
    np.testing.assert_allclose(out[win:], out_tail_alone, atol=1e-5)


@pytest.mark.parametrize("kind", ["int8", "int4"])
def test_encoder_quantized_rungs_close_to_f32(rng, kind):
    """The encoder precision ladder (reference 04-Quantize-ASR-Encoder.py:
    int8 per-channel, int4 grouped) stays close to the f32 master."""
    from qwen3_asr_gguf_tpu.models.params import quantize_encoder_params

    params = enc.init_params(CFG, jax.random.key(2))
    host = jax.tree.map(np.asarray, params)
    qparams = quantize_encoder_params(host, kind=kind)
    mel = rng.standard_normal((128, 300)).astype(np.float32) * 0.5

    ref = np.asarray(enc.encode(params, CFG, jnp.asarray(mel)))
    got = np.asarray(enc.encode(qparams, CFG, jnp.asarray(mel)))
    a, b = got.ravel(), ref.ravel()
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    floor = 0.999 if kind == "int8" else 0.96
    assert cos > floor, (kind, cos)


def test_encoder_int8_sidecar_roundtrip(tmp_path, rng):
    """load_encoder_quantized(kind='int8') builds and reloads the sidecar."""
    from qwen3_asr_gguf_tpu.models.params import (
        load_encoder_quantized,
        save_encoder_safetensors,
    )

    params = enc.init_params(CFG, jax.random.key(3))
    path = str(tmp_path / "enc.safetensors")
    save_encoder_safetensors(path, CFG, jax.tree.map(np.asarray, params))
    cfg1, p1 = load_encoder_quantized(path, kind="int8")
    cfg2, p2 = load_encoder_quantized(path, kind="int8")  # sidecar reload
    mel = rng.standard_normal((128, 200)).astype(np.float32) * 0.5
    o1 = np.asarray(enc.encode(p1, cfg1, jnp.asarray(mel)))
    o2 = np.asarray(enc.encode(p2, cfg2, jnp.asarray(mel)))
    np.testing.assert_allclose(o1, o2, atol=1e-6)


@pytest.mark.slow
def test_engine_bf16_encoder_rung(tmp_path):
    """precision=bf16 ships the encoder as f16 on the wire, bf16 on device
    (the reference's fp16 ONNX rung) and still transcribes."""
    from qwen3_asr_gguf_tpu.export.convert import make_synthetic_checkpoint
    from qwen3_asr_gguf_tpu.runtime.engine import QwenASREngine
    from qwen3_asr_gguf_tpu.schema import ASREngineConfig

    d = tmp_path / "bf16ckpt"
    make_synthetic_checkpoint(str(d), "tiny", quant="f16")
    eng = QwenASREngine(ASREngineConfig(
        model_dir=str(d), llm_fn="qwen3_asr_llm.f16.gguf", precision="bf16",
        chunk_size=2.0, n_ctx=512, verbose=False, max_new_tokens=8,
        decode_block=8,
    ))
    leaf = eng.encoder.params["proj1_w"]
    assert leaf.dtype == jnp.bfloat16
    t = np.arange(16000) / 16000
    res = eng.asr((np.sin(2 * np.pi * 440 * t) * 0.3).astype(np.float32),
                  "", "English", chunk_size_sec=2.0, temperature=0.0)
    assert isinstance(res.text, str)


def test_encode_batch_async_matches_single(rng):
    """Cohort encode (one vmapped dispatch) equals per-audio encodes on the
    valid rows — both the aligned fast path (exact-second, n_window-aligned
    audio) and the varlen bucket path (serving admission groups by
    EncoderRunner.batch_key)."""
    from qwen3_asr_gguf_tpu.runtime.encoder_runner import EncoderRunner

    params = jax.tree.map(np.asarray, enc.init_params(CFG, jax.random.key(5)))
    runner = EncoderRunner(params, CFG)
    for seconds in (1.0, 1.3):  # aligned, varlen
        audios = [
            (rng.standard_normal(int(16_000 * seconds)) * 0.3).astype(np.float32)
            for _ in range(3)
        ]
        keys = {runner.batch_key(a) for a in audios}
        assert len(keys) == 1
        batched = runner.encode_batch_async(audios)
        for a, b in zip(audios, batched):
            single = runner.encode_async(a)
            n = runner.valid_tokens(len(a))
            np.testing.assert_allclose(
                np.asarray(b)[:n], np.asarray(single)[:n], atol=1e-5
            )
