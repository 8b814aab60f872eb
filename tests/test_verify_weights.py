"""cli/verify_weights: the one-command convert-and-verify rehearsal for
real checkpoints (VERDICT r4 missing #2), driven on a tiny
real-architecture torch checkpoint exactly as it would run on public
weights."""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch oracle + engine compiles

IM_START, IM_END, EOT = 256, 257, 258
AUDIO_START, AUDIO_END, AUDIO_PAD, ASR_TEXT = 259, 260, 261, 262


@pytest.fixture(scope="module")
def tiny_hf_checkpoint(tmp_path_factory):
    from test_composed_oracle import _load_ref_modeling

    torch, modeling, config_mod = _load_ref_modeling()
    audio_cfg = dict(
        num_mel_bins=128, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, encoder_ffn_dim=128,
        downsample_hidden_size=32, output_dim=48,
        n_window=50, n_window_infer=400, conv_chunksize=500,
        max_source_positions=1500,
    )
    text_cfg = dict(
        vocab_size=512, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=96, rms_norm_eps=1e-6, rope_theta=5e6,
        tie_word_embeddings=False,
        rope_scaling={"rope_type": "default", "mrope_section": [4, 2, 2]},
    )
    cfg = config_mod.Qwen3ASRThinkerConfig(
        audio_config=audio_cfg, text_config=text_cfg,
        audio_token_id=AUDIO_PAD, audio_start_token_id=AUDIO_START,
    )
    torch.manual_seed(11)
    model = modeling.Qwen3ASRThinkerForConditionalGeneration(cfg)
    model.eval()
    hf_dir = tmp_path_factory.mktemp("vw_hf")
    model.save_pretrained(str(hf_dir), safe_serialization=True)
    return str(hf_dir)


def test_verify_weights_end_to_end(tiny_hf_checkpoint, tmp_path):
    from qwen3_asr_gguf_tpu.cli.verify_weights import verify

    rep = verify(
        tiny_hf_checkpoint, str(tmp_path / "model"),
        quant="q4_k", seconds=2.0, language="English", max_new=8,
    )
    stages = {s: (st, d) for s, st, d in rep.rows}
    assert stages["convert"][0] == "PASS", stages
    assert stages["load"][0] == "PASS", stages
    # the oracle stage must actually run here (torch + reference modeling
    # are present in this environment) and must agree
    assert stages["oracle"][0] == "PASS", stages
    assert stages["fidelity/quant-cosine"][0] == "PASS", stages
    assert stages["fidelity/ppl-delta"][0] in ("PASS", "SKIP"), stages
    assert not rep.failed
