"""Sharded train step + checkpoint/resume tests (8 virtual CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_gguf_tpu.models.configs import (
    AudioEncoderConfig,
    TextDecoderConfig,
    ThinkerConfig,
)
from qwen3_asr_gguf_tpu.parallel.sharding import make_mesh
from qwen3_asr_gguf_tpu.parallel.train import (
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
    ),
    pytest.mark.slow,  # sharded train-step compiles; fast lane: -m "not slow"
]


def _tiny_cfg(model: int) -> ThinkerConfig:
    return ThinkerConfig(
        audio=AudioEncoderConfig(
            num_mel_bins=128, d_model=8 * model, encoder_layers=1,
            encoder_attention_heads=model, encoder_ffn_dim=16 * model,
            downsample_hidden_size=16, output_dim=16 * model,
        ),
        text=TextDecoderConfig(
            vocab_size=64 * model, hidden_size=16 * model, num_layers=2,
            num_heads=2 * model, num_kv_heads=model, head_dim=16,
            intermediate_size=32 * model,
        ),
    )


def _batch(cfg, b):
    rng = np.random.default_rng(0)
    t_tok = 24
    audio_mask = np.zeros((b, t_tok), dtype=bool)
    audio_mask[:, 1:14] = True
    return {
        "mel": jnp.asarray(rng.standard_normal((b, 128, 100)), dtype=jnp.float32),
        "tokens": jnp.asarray(rng.integers(0, cfg.text.vocab_size, (b, t_tok)), dtype=jnp.int32),
        "loss_mask": jnp.ones((b, t_tok), jnp.float32),
        "audio_mask": jnp.asarray(audio_mask),
    }


def test_train_step_decreases_loss():
    mesh = make_mesh({"data": 2, "model": 4})
    cfg = _tiny_cfg(4)
    init_fn, step_fn = make_train_step(cfg, mesh, learning_rate=1e-3)
    with mesh:
        state = init_fn(jax.random.key(0))
        batch = _batch(cfg, 4)
        losses = []
        for _ in range(5):
            state, loss = step_fn(state, batch)
            losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_checkpoint_roundtrip(tmp_path):
    mesh = make_mesh({"data": 1, "model": 8})
    cfg = _tiny_cfg(8)
    init_fn, step_fn = make_train_step(cfg, mesh)
    with mesh:
        state = init_fn(jax.random.key(1))
        state, _ = step_fn(state, _batch(cfg, 2))
        save_checkpoint(str(tmp_path / "ckpt"), state)

        template = init_fn(jax.random.key(2))
        restored = restore_checkpoint(str(tmp_path / "ckpt"), template)
    assert int(restored.step) == 1
    a = np.asarray(state.params["decoder"]["final_norm"])
    b = np.asarray(restored.params["decoder"]["final_norm"])
    np.testing.assert_array_equal(a, b)
