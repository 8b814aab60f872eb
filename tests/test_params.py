"""Checkpoint save/load roundtrips (GGUF decoder, safetensors encoder, HF convert)."""

import json
from dataclasses import asdict, replace
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_gguf_tpu.export.convert import convert_hf_checkpoint, make_synthetic_checkpoint
from qwen3_asr_gguf_tpu.models import decoder as dec
from qwen3_asr_gguf_tpu.models import encoder as enc
from qwen3_asr_gguf_tpu.models import params as P
from qwen3_asr_gguf_tpu.models.configs import TextDecoderConfig, preset
from qwen3_asr_gguf_tpu.ops.qtensor import Q4Weight
from qwen3_asr_gguf_tpu.text.tokenizer import build_synthetic_tokenizer

# hidden sizes divisible by 256 so q4_k packing applies
QCFG = TextDecoderConfig(
    vocab_size=300, hidden_size=256, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=64, intermediate_size=512,
)


def test_decoder_gguf_roundtrip_f32(tmp_path):
    params = dec.init_params(QCFG, jax.random.key(0))
    tok = build_synthetic_tokenizer(QCFG.vocab_size)
    path = tmp_path / "m.gguf"
    P.save_decoder_gguf(str(path), QCFG, params, tok, quant="f32")

    cfg2, params2, tok2 = P.load_decoder_gguf(str(path), precision="f32")
    assert cfg2.num_layers == QCFG.num_layers
    assert cfg2.hidden_size == QCFG.hidden_size
    assert cfg2.num_kv_heads == QCFG.num_kv_heads
    assert abs(cfg2.rope_theta - QCFG.rope_theta) < 1
    assert tok2.tokens == tok.tokens
    np.testing.assert_array_equal(np.asarray(params2["embed"]), np.asarray(params["embed"]))
    np.testing.assert_array_equal(
        np.asarray(params2["layers"]["q_proj"]), np.asarray(params["layers"]["q_proj"])
    )

    # same greedy logits after roundtrip
    ids = np.arange(10) % QCFG.vocab_size
    embd = dec.embed_tokens(params, jnp.asarray(ids))
    cache = dec.init_cache(QCFG, 16, dtype=jnp.float32)
    h1, _ = dec.forward_prefill(params, QCFG, embd, cache)
    h2, _ = dec.forward_prefill(params2, QCFG, embd, cache)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)


def test_decoder_gguf_q4k_packed_load(tmp_path):
    params = dec.init_params(QCFG, jax.random.key(1))
    tok = build_synthetic_tokenizer(QCFG.vocab_size)
    path = tmp_path / "m.gguf"
    P.save_decoder_gguf(str(path), QCFG, params, tok, quant="q4_k")

    cfg2, params2, _ = P.load_decoder_gguf(str(path), precision="q4_k")
    assert isinstance(params2["layers"]["q_proj"], Q4Weight)
    assert params2["layers"]["q_proj"].packed.shape[0] == QCFG.num_layers
    assert not isinstance(params2["layers"]["attn_norm"], Q4Weight)

    # quantized forward close to dense forward
    ids = np.arange(12) % QCFG.vocab_size
    embd = dec.embed_tokens(params, jnp.asarray(ids))
    cache = dec.init_cache(QCFG, 16, dtype=jnp.float32)
    h1, _ = dec.forward_prefill(params, QCFG, embd, cache)
    h2, _ = dec.forward_prefill(params2, QCFG, embd.astype(jnp.float32), cache)
    a, b = np.asarray(h1).ravel(), np.asarray(h2).ravel()
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.96


def test_encoder_safetensors_roundtrip(tmp_path):
    cfg = preset("tiny").audio
    params = enc.init_params(cfg, jax.random.key(2))
    path = tmp_path / "enc.safetensors"
    P.save_encoder_safetensors(str(path), cfg, params)
    cfg2, params2 = P.load_encoder_safetensors(str(path))
    assert cfg2 == cfg
    np.testing.assert_allclose(
        np.asarray(params2["layers"]["q_w"]), np.asarray(params["layers"]["q_w"]), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(params2["conv1_w"]), np.asarray(params["conv1_w"]), atol=1e-7
    )


def test_synthetic_checkpoint_end_to_end(tmp_path):
    thinker = make_synthetic_checkpoint(str(tmp_path / "ckpt"), "tiny", quant="f16")
    d = tmp_path / "ckpt"
    assert (d / "qwen3_asr_encoder.safetensors").exists()
    assert (d / "qwen3_asr_llm.f16.gguf").exists()
    assert (d / "config.json").exists()
    assert (d / "mel_filters.npy").exists()

    thinker2 = P.load_thinker_config(str(d))
    assert thinker2.text == thinker.text
    assert thinker2.im_end_token_id == thinker.im_end_token_id

    cfg, params, tok = P.load_decoder_gguf(str(d / "qwen3_asr_llm.f16.gguf"), precision="f32")
    assert tok.token_to_id("<|im_start|>") == thinker.im_start_token_id
    ecfg, eparams = P.load_encoder_safetensors(str(d / "qwen3_asr_encoder.safetensors"))
    mel = np.random.default_rng(0).standard_normal((128, 100)).astype(np.float32)
    out = enc.encode(eparams, ecfg, jnp.asarray(mel))
    assert out.shape == (13, ecfg.output_dim)


def test_quantize_encoder_params():
    cfg = preset("tiny").audio
    # tiny dims aren't 32-divisible everywhere; use group=16
    params = enc.init_params(cfg, jax.random.key(3))
    qparams = P.quantize_encoder_params(params, group=16)
    assert isinstance(qparams["proj2_w"], Q4Weight)
    mel = np.random.default_rng(1).standard_normal((128, 100)).astype(np.float32)
    a = np.asarray(enc.encode(params, cfg, jnp.asarray(mel))).ravel()
    b = np.asarray(enc.encode(qparams, cfg, jnp.asarray(mel))).ravel()
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.96  # the reference's int4 encoder fidelity bar


def test_convert_hf_checkpoint(tmp_path):
    """Fake HF checkpoint dir (thinker layout) -> model dir -> loadable."""
    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    tiny = preset("tiny")
    acfg, tcfg = tiny.audio, tiny.text
    rng = np.random.default_rng(4)

    state = {}
    state["thinker.model.embed_tokens.weight"] = rng.standard_normal((tcfg.vocab_size, tcfg.hidden_size)).astype(np.float32)
    state["thinker.lm_head.weight"] = rng.standard_normal((tcfg.vocab_size, tcfg.hidden_size)).astype(np.float32)
    state["thinker.model.norm.weight"] = np.ones(tcfg.hidden_size, np.float32)
    for i in range(tcfg.num_layers):
        pre = f"thinker.model.layers.{i}."
        state[pre + "input_layernorm.weight"] = np.ones(tcfg.hidden_size, np.float32)
        state[pre + "post_attention_layernorm.weight"] = np.ones(tcfg.hidden_size, np.float32)
        state[pre + "self_attn.q_proj.weight"] = rng.standard_normal((tcfg.num_heads * tcfg.head_dim, tcfg.hidden_size)).astype(np.float32)
        state[pre + "self_attn.k_proj.weight"] = rng.standard_normal((tcfg.num_kv_heads * tcfg.head_dim, tcfg.hidden_size)).astype(np.float32)
        state[pre + "self_attn.v_proj.weight"] = rng.standard_normal((tcfg.num_kv_heads * tcfg.head_dim, tcfg.hidden_size)).astype(np.float32)
        state[pre + "self_attn.o_proj.weight"] = rng.standard_normal((tcfg.hidden_size, tcfg.num_heads * tcfg.head_dim)).astype(np.float32)
        state[pre + "self_attn.q_norm.weight"] = np.ones(tcfg.head_dim, np.float32)
        state[pre + "self_attn.k_norm.weight"] = np.ones(tcfg.head_dim, np.float32)
        state[pre + "mlp.gate_proj.weight"] = rng.standard_normal((tcfg.intermediate_size, tcfg.hidden_size)).astype(np.float32)
        state[pre + "mlp.up_proj.weight"] = rng.standard_normal((tcfg.intermediate_size, tcfg.hidden_size)).astype(np.float32)
        state[pre + "mlp.down_proj.weight"] = rng.standard_normal((tcfg.hidden_size, tcfg.intermediate_size)).astype(np.float32)

    c = acfg.downsample_hidden_size
    ap = "thinker.audio_tower."
    state[ap + "conv2d1.weight"] = rng.standard_normal((c, 1, 3, 3)).astype(np.float32)
    state[ap + "conv2d1.bias"] = np.zeros(c, np.float32)
    state[ap + "conv2d2.weight"] = rng.standard_normal((c, c, 3, 3)).astype(np.float32)
    state[ap + "conv2d2.bias"] = np.zeros(c, np.float32)
    state[ap + "conv2d3.weight"] = rng.standard_normal((c, c, 3, 3)).astype(np.float32)
    state[ap + "conv2d3.bias"] = np.zeros(c, np.float32)
    state[ap + "conv_out.weight"] = rng.standard_normal((acfg.d_model, acfg.conv_feat_dim)).astype(np.float32)
    state[ap + "ln_post.weight"] = np.ones(acfg.d_model, np.float32)
    state[ap + "ln_post.bias"] = np.zeros(acfg.d_model, np.float32)
    state[ap + "proj1.weight"] = rng.standard_normal((acfg.d_model, acfg.d_model)).astype(np.float32)
    state[ap + "proj1.bias"] = np.zeros(acfg.d_model, np.float32)
    state[ap + "proj2.weight"] = rng.standard_normal((acfg.output_dim, acfg.d_model)).astype(np.float32)
    state[ap + "proj2.bias"] = np.zeros(acfg.output_dim, np.float32)
    for i in range(acfg.encoder_layers):
        pre = f"{ap}layers.{i}."
        d = acfg.d_model
        for nm, shape in [
            ("self_attn_layer_norm.weight", (d,)), ("self_attn_layer_norm.bias", (d,)),
            ("self_attn.q_proj.weight", (d, d)), ("self_attn.q_proj.bias", (d,)),
            ("self_attn.k_proj.weight", (d, d)), ("self_attn.k_proj.bias", (d,)),
            ("self_attn.v_proj.weight", (d, d)), ("self_attn.v_proj.bias", (d,)),
            ("self_attn.out_proj.weight", (d, d)), ("self_attn.out_proj.bias", (d,)),
            ("final_layer_norm.weight", (d,)), ("final_layer_norm.bias", (d,)),
            ("fc1.weight", (acfg.encoder_ffn_dim, d)), ("fc1.bias", (acfg.encoder_ffn_dim,)),
            ("fc2.weight", (d, acfg.encoder_ffn_dim)), ("fc2.bias", (d,)),
        ]:
            state[pre + nm] = rng.standard_normal(shape).astype(np.float32)

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    save_file(state, str(hf_dir / "model.safetensors"))
    # HF convention: n_window counts half a conv chunk (real checkpoints
    # ship 50 for the 100-frame chunks); the converter doubles it back
    hf_audio = asdict(acfg)
    hf_audio["n_window"] = acfg.n_window // 2
    (hf_dir / "config.json").write_text(json.dumps({
        "thinker_config": {
            "audio_config": hf_audio,
            "text_config": {
                "vocab_size": tcfg.vocab_size, "hidden_size": tcfg.hidden_size,
                "num_hidden_layers": tcfg.num_layers, "num_attention_heads": tcfg.num_heads,
                "num_key_value_heads": tcfg.num_kv_heads, "head_dim": tcfg.head_dim,
                "intermediate_size": tcfg.intermediate_size, "rope_theta": 5e6,
            },
        }
    }))

    out_dir = tmp_path / "out"
    thinker = convert_hf_checkpoint(str(hf_dir), str(out_dir), quant="f16")
    assert thinker.text.hidden_size == tcfg.hidden_size

    cfg2, params2, _ = P.load_decoder_gguf(str(out_dir / "qwen3_asr_llm.f16.gguf"), precision="f32")
    np.testing.assert_allclose(
        np.asarray(params2["layers"]["q_proj"][0]),
        state["thinker.model.layers.0.self_attn.q_proj.weight"],
        atol=1e-2,
    )
    ecfg2, eparams2 = P.load_encoder_safetensors(str(out_dir / "qwen3_asr_encoder.safetensors"))
    assert ecfg2.d_model == acfg.d_model
    np.testing.assert_allclose(
        np.asarray(eparams2["conv_out"]), state[ap + "conv_out.weight"], atol=1e-7
    )


def test_dequant_prefill_int8_branch():
    """Int8Weight layers dequantize to dense bf16 (the aligner's prefill
    path on TPU; the int8 matmul's per-call activation quant ran the 0.6B
    prefill at ~12% of the MXU)."""
    import jax.numpy as jnp

    from qwen3_asr_gguf_tpu.ops.qtensor import Int8Weight

    q = np.random.default_rng(0).integers(-127, 128, (4, 8, 16)).astype(np.int8)
    s = (np.abs(np.random.default_rng(1).standard_normal((4, 8))) + 0.01).astype(np.float32)
    p = {"layers": {"w": Int8Weight(q=jnp.asarray(q), scale=jnp.asarray(s)),
                    "norm": jnp.ones((4, 16))}}
    d = P.dequant_prefill_params(p)
    ref = q.astype(np.float32) * s[..., None]
    got = np.asarray(d["layers"]["w"], dtype=np.float32)
    assert d["layers"]["w"].dtype == jnp.bfloat16
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.005  # bf16 rounding
    np.testing.assert_array_equal(np.asarray(d["layers"]["norm"]), np.ones((4, 16)))


def test_ram_mirror_roundtrip(tmp_path, monkeypatch):
    """Sidecar RAM mirror: fresh files copy once, stale mirror entries
    refresh, removed sources drop from the mirror."""
    from qwen3_asr_gguf_tpu.models.params import _ram_mirror

    src = tmp_path / "side.int4"
    src.mkdir()
    np.save(src / "a__x.npy", np.arange(4))
    np.save(src / "b__y.npy", np.ones(3))
    mroot = tmp_path / "ram"
    monkeypatch.setenv("QWEN3_ASR_RAM_CACHE", str(mroot))
    m1 = _ram_mirror(src)
    assert m1 != src and (m1 / "a__x.npy").exists()
    np.testing.assert_array_equal(np.load(m1 / "a__x.npy"), np.arange(4))
    # update a source file -> mirror refreshes
    import os
    import time

    time.sleep(0.01)
    np.save(src / "a__x.npy", np.arange(5))
    os.utime(src / "a__x.npy")
    m2 = _ram_mirror(src)
    np.testing.assert_array_equal(np.load(m2 / "a__x.npy"), np.arange(5))
    # remove a source file -> mirror entry drops
    (src / "b__y.npy").unlink()
    m3 = _ram_mirror(src)
    assert not (m3 / "b__y.npy").exists()
    # disabled -> identity
    monkeypatch.setenv("QWEN3_ASR_RAM_CACHE", "0")
    assert _ram_mirror(src) == src
