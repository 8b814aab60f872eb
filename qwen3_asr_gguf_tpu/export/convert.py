"""Checkpoint conversion toolchain.

TPU-native replacement for the reference's numbered export scripts
(00-07 / 11-17): instead of PyTorch -> ONNX -> optimize -> int4 plus
PyTorch -> GGUF f16 -> llama-quantize q4_k, one step converts a HuggingFace
Qwen3-ASR checkpoint (or generates a synthetic random one) into the model
directory the engine consumes:

    <model_dir>/
      qwen3_asr_encoder.safetensors      (f32 master; int4 applied at load)
      qwen3_asr_llm.<quant>.gguf         (decoder + vocab)
      config.json                        (thinker config + special ids)
      mel_filters.npy                    (00-Export-Mel-Filters equivalent)
"""

from __future__ import annotations

import json
from dataclasses import replace
from pathlib import Path

import jax
import numpy as np

from ..audio.mel import mel_filterbank
from ..models import decoder as dec_model
from ..models import encoder as enc_model
from ..models import params as P
from ..models.configs import ThinkerConfig, preset
from ..text.tokenizer import BPETokenizer, build_synthetic_tokenizer

ASR_ENCODER_FN = "qwen3_asr_encoder.safetensors"
ALIGNER_ENCODER_FN = "qwen3_aligner_encoder.safetensors"


def _thinker_ids_from_tokenizer(thinker: ThinkerConfig, tok: BPETokenizer) -> ThinkerConfig:
    def tid(s, default):
        try:
            return tok.token_to_id(s)
        except KeyError:
            return default

    im_end = tid("<|im_end|>", thinker.im_end_token_id)
    eot = tid("<|endoftext|>", im_end)
    return replace(
        thinker,
        im_start_token_id=tid("<|im_start|>", thinker.im_start_token_id),
        im_end_token_id=im_end,
        audio_start_token_id=tid("<|audio_start|>", thinker.audio_start_token_id),
        audio_end_token_id=tid("<|audio_end|>", thinker.audio_end_token_id),
        asr_text_token_id=tid("<asr_text>", thinker.asr_text_token_id),
        timestamp_token_id=tid("<timestamp>", thinker.timestamp_token_id),
        eos_token_ids=(im_end, eot),
    )


def _np_init_like(shapes, seed: int) -> dict:
    """Fill a ShapeDtypeStruct pytree with numpy-initialized weights:
    *norm*/ones-like -> 1.0, biases -> 0.0, everything else N(0, 0.02)."""
    rng = np.random.default_rng(seed)

    def fill(path, s):
        name = ".".join(str(getattr(p, "key", p)) for p in path)
        if "norm" in name or name.endswith(("ln1_w", "ln2_w", "ln_post_w")):
            return np.ones(s.shape, np.float32)
        if name.endswith("_b") or "bias" in name:
            return np.zeros(s.shape, np.float32)
        return (rng.standard_normal(s.shape, dtype=np.float32) * 0.02)

    return jax.tree_util.tree_map_with_path(fill, shapes)


def cjk_word_token_ids(tok) -> "np.ndarray":
    """Vocab ids that decode to exactly one CJK character and round-trip
    through encode() — the ids a real Chinese transcript is made of (and
    the ids the speculative-align word table classifies as words)."""
    ids = []
    for tid in range(tok.n_vocab):
        try:
            s = tok.token_to_bytes(tid).decode("utf-8")
        except (UnicodeDecodeError, KeyError):
            continue
        from ..text.align_text import is_cjk_char

        if len(s) == 1 and is_cjk_char(s) and tok.encode(s, allow_special=False) == [tid]:
            ids.append(tid)
    return np.asarray(ids, dtype=np.int64)


def _bias_lm_head_cjk(dec_params: dict, tok) -> None:
    """Shrink non-CJK lm_head rows so a random-weight decoder SAMPLES a
    plausible Chinese transcript (single-CJK-char tokens), the workload the
    reference's own benchmark measures (50.2 s Chinese audio whose output
    is a per-character Chinese text, README.md:49). Without this a uniform
    random vocab draw is ~54 % multi-char/byte pieces — a transcript no
    real ASR model produces. FLOP/byte cost is untouched (same shapes)."""
    head = dec_params.get("lm_head")
    if head is None or head.ndim != 2:
        return
    word_ids = cjk_word_token_ids(tok)
    if len(word_ids) < 100:
        return
    scale = np.full(head.shape[0], 0.3, dtype=head.dtype)
    scale[word_ids] = 1.0
    head *= scale[:, None]


def make_synthetic_checkpoint(
    model_dir: str,
    preset_name: str = "tiny",
    *,
    seed: int = 0,
    quant: str = "q4_k",
    aligner: bool = False,
) -> ThinkerConfig:
    """Random-weight checkpoint at real architecture shapes — for tests and
    hardware benchmarking (no public weights ship with the reference either)."""
    thinker = preset(preset_name)
    if aligner and thinker.text.classify_num is None:
        thinker = replace(thinker, text=replace(thinker.text, classify_num=5000))

    tok = build_synthetic_tokenizer(thinker.text.vocab_size)
    thinker = _thinker_ids_from_tokenizer(thinker, tok)

    d = Path(model_dir)
    d.mkdir(parents=True, exist_ok=True)
    # numpy host init: at 1.7B scale, jax's counter-based RNG on one CPU
    # core (or a remote accelerator + ~7 GB download) is minutes; PCG64 is
    # seconds
    enc_params = _np_init_like(
        jax.eval_shape(lambda k: enc_model.init_params(thinker.audio, k), jax.random.key(0)),
        seed,
    )
    enc_params["pos_embed"] = enc_model.sinusoid_positions(
        thinker.audio.max_source_positions, thinker.audio.d_model
    )
    dec_params = _np_init_like(
        jax.eval_shape(lambda k: dec_model.init_params(thinker.text, k), jax.random.key(0)),
        seed + 1,
    )
    if not aligner:
        _bias_lm_head_cjk(dec_params, tok)

    enc_fn = ALIGNER_ENCODER_FN if aligner else ASR_ENCODER_FN
    llm_fn = f"qwen3_{'aligner' if aligner else 'asr'}_llm.{quant}.gguf"
    P.save_encoder_safetensors(str(d / enc_fn), thinker.audio, enc_params)
    P.save_decoder_gguf(str(d / llm_fn), thinker.text, dec_params, tok, quant=quant)
    P.save_thinker_config(str(d), thinker)
    np.save(d / "mel_filters.npy", mel_filterbank())
    return thinker


# --------------------------------------------------------------------------
# HuggingFace checkpoint conversion
# --------------------------------------------------------------------------

_DEC_LAYER_HF = {
    "attn_norm": "input_layernorm.weight",
    "q_proj": "self_attn.q_proj.weight",
    "k_proj": "self_attn.k_proj.weight",
    "v_proj": "self_attn.v_proj.weight",
    "o_proj": "self_attn.o_proj.weight",
    "q_norm": "self_attn.q_norm.weight",
    "k_norm": "self_attn.k_norm.weight",
    "mlp_norm": "post_attention_layernorm.weight",
    "gate_proj": "mlp.gate_proj.weight",
    "up_proj": "mlp.up_proj.weight",
    "down_proj": "mlp.down_proj.weight",
}

_ENC_TOP_HF = {
    "conv1_w": "conv2d1.weight", "conv1_b": "conv2d1.bias",
    "conv2_w": "conv2d2.weight", "conv2_b": "conv2d2.bias",
    "conv3_w": "conv2d3.weight", "conv3_b": "conv2d3.bias",
    "conv_out": "conv_out.weight",
    "ln_post_w": "ln_post.weight", "ln_post_b": "ln_post.bias",
    "proj1_w": "proj1.weight", "proj1_b": "proj1.bias",
    "proj2_w": "proj2.weight", "proj2_b": "proj2.bias",
}

_ENC_LAYER_HF = {
    "ln1_w": "self_attn_layer_norm.weight", "ln1_b": "self_attn_layer_norm.bias",
    "q_w": "self_attn.q_proj.weight", "q_b": "self_attn.q_proj.bias",
    "k_w": "self_attn.k_proj.weight", "k_b": "self_attn.k_proj.bias",
    "v_w": "self_attn.v_proj.weight", "v_b": "self_attn.v_proj.bias",
    "o_w": "self_attn.out_proj.weight", "o_b": "self_attn.out_proj.bias",
    "ln2_w": "final_layer_norm.weight", "ln2_b": "final_layer_norm.bias",
    "fc1_w": "fc1.weight", "fc1_b": "fc1.bias",
    "fc2_w": "fc2.weight", "fc2_b": "fc2.bias",
}


def convert_text_llm(
    hf_dir: str,
    out_path: str,
    *,
    quant: str = "q4_k",
) -> "TextDecoderConfig":
    """Plain Qwen3-family text-LLM HF checkpoint dir -> one decoder GGUF.

    Converter breadth beyond the ASR thinker family: the reference vendors
    llama.cpp's convert_hf_to_gguf.py (~250 archs) for this step; the
    architectures this framework's decoder actually executes are the
    Qwen3 text family (q/k-norm attention, no qkv biases — the same math
    as the ASR thinker, models/decoder.py), so any `Qwen3ForCausalLM`
    checkpoint (0.6B..8B, incl. tie_word_embeddings ones that ship no
    lm_head tensor) converts to a GGUF that `load_decoder_gguf` +
    `runtime.generate.Generator` run directly. Anything else fails loudly
    here rather than emitting a file whose forward pass would be wrong.
    """
    from ..models.configs import TextDecoderConfig

    with open(Path(hf_dir) / "config.json", encoding="utf-8") as f:
        hf_cfg = json.load(f)
    archs = hf_cfg.get("architectures", [])
    if "Qwen3ForCausalLM" not in archs:
        raise ValueError(
            f"unsupported text-LLM architecture {archs}: this converter "
            "emits checkpoints for the Qwen3 decoder this framework "
            "executes (q/k-norm attention, bias-free projections); "
            "Qwen2-style models (qkv biases, no q/k norm) would load but "
            "compute the wrong function"
        )
    state = _load_hf_state_dict(hf_dir)

    text_cfg = TextDecoderConfig(
        vocab_size=hf_cfg.get("vocab_size", 151936),
        hidden_size=hf_cfg.get("hidden_size", 2048),
        num_layers=hf_cfg.get("num_hidden_layers", 28),
        num_heads=hf_cfg.get("num_attention_heads", 16),
        num_kv_heads=hf_cfg.get("num_key_value_heads", 8),
        head_dim=hf_cfg.get("head_dim", 128),
        intermediate_size=hf_cfg.get("intermediate_size", 6144),
        rms_norm_eps=hf_cfg.get("rms_norm_eps", 1e-6),
        rope_theta=hf_cfg.get("rope_theta", 5e6),
    )

    def g(name):
        return state[name].astype(np.float32)

    embed = g("model.embed_tokens.weight")
    # small Qwen3 checkpoints tie the head; HF then omits lm_head.weight
    lm_head = g("lm_head.weight") if "lm_head.weight" in state else embed
    dec_params = {
        "embed": embed,
        "layers": {
            mine: np.stack(
                [g(f"model.layers.{i}.{suffix}") for i in range(text_cfg.num_layers)]
            )
            for mine, suffix in _DEC_LAYER_HF.items()
        },
        "final_norm": g("model.norm.weight"),
        "lm_head": lm_head,
    }

    tok_json = Path(hf_dir) / "tokenizer.json"
    if tok_json.exists():
        tok = BPETokenizer.from_hf_tokenizer_json(str(tok_json))
    else:
        tok = build_synthetic_tokenizer(text_cfg.vocab_size)

    out = Path(out_path)
    if out.suffix != ".gguf":  # treat as a directory
        out.mkdir(parents=True, exist_ok=True)
        out = out / f"qwen3_llm.{quant}.gguf"
    out.parent.mkdir(parents=True, exist_ok=True)
    P.save_decoder_gguf(str(out), text_cfg, dec_params, tok, quant=quant, arch="qwen3")
    return text_cfg


def _load_hf_state_dict(hf_dir: str) -> dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    d = Path(hf_dir)
    files = sorted(d.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors files in {hf_dir}")
    state: dict[str, np.ndarray] = {}
    for f in files:
        state.update(load_file(str(f)))
    return state


def convert_hf_checkpoint(
    hf_dir: str,
    model_dir: str,
    *,
    quant: str = "q4_k",
    aligner: bool = False,
) -> ThinkerConfig:
    """HF Qwen3-ASR checkpoint dir -> engine model dir.

    Strips the `thinker.` prefix and splits audio tower from text model the
    way the reference's extract step does (05-Export-ASR-Decoder-HF.py
    remaps thinker.model.* -> model.*); no Qwen3-VL disguise is needed
    because our GGUF loader reads the qwen3vl schema natively.
    """
    state = _load_hf_state_dict(hf_dir)
    # tolerate both raw-thinker and full-model layouts
    prefix = "thinker." if any(k.startswith("thinker.") for k in state) else ""

    with open(Path(hf_dir) / "config.json", encoding="utf-8") as f:
        hf_cfg = json.load(f)
    tcfg_raw = hf_cfg.get("thinker_config", hf_cfg)
    audio_raw = tcfg_raw.get("audio_config", {})
    text_raw = tcfg_raw.get("text_config", {})

    from ..models.configs import AudioEncoderConfig, TextDecoderConfig

    audio_cfg = AudioEncoderConfig(
        num_mel_bins=audio_raw.get("num_mel_bins", 128),
        d_model=audio_raw.get("d_model", 1024),
        encoder_layers=audio_raw.get("encoder_layers", 24),
        encoder_attention_heads=audio_raw.get("encoder_attention_heads", 16),
        encoder_ffn_dim=audio_raw.get("encoder_ffn_dim", 4096),
        downsample_hidden_size=audio_raw.get("downsample_hidden_size", 480),
        output_dim=audio_raw.get("output_dim", 2048),
        # HF checkpoints ship n_window=50 meaning 2*n_window-frame conv
        # chunks (modeling_qwen3_asr.py:682-694); our n_window IS the conv
        # chunk length, so the import doubles it (50 -> 100). The doubling
        # is only valid for 100-frame conv chunks: the modeling code's
        # token-length formula hard-codes %100 steps, so any other value
        # means the checkpoint disagrees with the architecture this
        # converter (and the reference) implements — fail loudly rather
        # than emit a model whose windowed attention silently mismatches.
        n_window=2 * audio_raw.get("n_window", 50),
        n_window_infer=audio_raw.get("n_window_infer", 400),
        conv_chunksize=audio_raw.get("conv_chunksize", 500),
        max_source_positions=audio_raw.get("max_source_positions", 1500),
    )
    if audio_cfg.n_window != 100:
        raise ValueError(
            f"unsupported audio n_window={audio_raw.get('n_window')} in HF "
            "config: the Qwen3-ASR conv frontend and its hard-coded "
            "100-frame token-length formula (modeling get_feat_extract_"
            "output_lengths) require n_window=50 (100-frame conv chunks); "
            "refusing to convert a checkpoint this architecture mishandles"
        )
    head_dim = text_raw.get("head_dim", 128)
    text_cfg = TextDecoderConfig(
        vocab_size=text_raw.get("vocab_size", 151936),
        hidden_size=text_raw.get("hidden_size", 2048),
        num_layers=text_raw.get("num_hidden_layers", 28),
        num_heads=text_raw.get("num_attention_heads", 16),
        num_kv_heads=text_raw.get("num_key_value_heads", 8),
        head_dim=head_dim,
        intermediate_size=text_raw.get("intermediate_size", 6144),
        rms_norm_eps=text_raw.get("rms_norm_eps", 1e-6),
        rope_theta=text_raw.get("rope_theta", 5e6),
    )

    # decoder params (numpy, dense) ---------------------------------------
    def g(name):
        return state[prefix + name].astype(np.float32)

    lm_head = g("lm_head.weight")
    if lm_head.shape[0] != text_cfg.vocab_size and lm_head.shape[0] < 20_000:
        text_cfg = replace(text_cfg, classify_num=int(lm_head.shape[0]))
    layers = {
        mine: np.stack([g(f"model.layers.{i}.{suffix}") for i in range(text_cfg.num_layers)])
        for mine, suffix in _DEC_LAYER_HF.items()
    }
    dec_params = {
        "embed": g("model.embed_tokens.weight"),
        "layers": layers,
        "final_norm": g("model.norm.weight"),
        "lm_head": lm_head,
    }

    # encoder params -------------------------------------------------------
    ap = prefix + "audio_tower."
    enc_params = {mine: state[ap + suffix].astype(np.float32) for mine, suffix in _ENC_TOP_HF.items()}
    enc_params["pos_embed"] = enc_model.sinusoid_positions(
        audio_cfg.max_source_positions, audio_cfg.d_model
    )
    enc_params["layers"] = {
        mine: np.stack(
            [state[f"{ap}layers.{i}.{suffix}"].astype(np.float32) for i in range(audio_cfg.encoder_layers)]
        )
        for mine, suffix in _ENC_LAYER_HF.items()
    }

    # tokenizer ------------------------------------------------------------
    tok_json = Path(hf_dir) / "tokenizer.json"
    if tok_json.exists():
        tok = BPETokenizer.from_hf_tokenizer_json(str(tok_json))
    else:
        tok = build_synthetic_tokenizer(text_cfg.vocab_size)

    thinker = ThinkerConfig(
        audio=audio_cfg,
        text=text_cfg,
        audio_token_id=tcfg_raw.get("audio_token_id", 151646),
        audio_start_token_id=tcfg_raw.get("audio_start_token_id", 151647),
    )
    thinker = _thinker_ids_from_tokenizer(thinker, tok)

    d = Path(model_dir)
    d.mkdir(parents=True, exist_ok=True)
    enc_fn = ALIGNER_ENCODER_FN if aligner else ASR_ENCODER_FN
    llm_fn = f"qwen3_{'aligner' if aligner else 'asr'}_llm.{quant}.gguf"
    P.save_encoder_safetensors(str(d / enc_fn), audio_cfg, enc_params)
    P.save_decoder_gguf(str(d / llm_fn), text_cfg, dec_params, tok, quant=quant)
    P.save_thinker_config(str(d), thinker)
    np.save(d / "mel_filters.npy", mel_filterbank())
    return thinker
