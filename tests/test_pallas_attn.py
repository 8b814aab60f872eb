"""Flash-style GQA decode-attention kernel vs the XLA reference
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_gguf_tpu.models.decoder import _gqa_attention
from qwen3_asr_gguf_tpu.ops.pallas_attn import TS, gqa_decode_attention, supported


def test_decode_attention_matches_xla():
    rng = np.random.default_rng(0)
    s, hkv, hq, d = 1024, 8, 16, 128
    kc = jnp.asarray(rng.standard_normal((s, hkv, d)).astype(np.float32)).astype(jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((s, hkv, d)).astype(np.float32)).astype(jnp.bfloat16)
    for win, pos in ((TS, TS - 10), (3 * TS, 700), (1024, 900)):
        q = jnp.asarray(rng.standard_normal((1, hq, d)).astype(np.float32)).astype(jnp.bfloat16)
        valid = (jnp.arange(win) <= pos)[None, :]
        ref = np.asarray(_gqa_attention(q, kc[:win], vc[:win], valid, 0.088), np.float32)
        assert supported(q.shape, win)
        got = np.asarray(
            gqa_decode_attention(q, kc, vc, jnp.int32(pos), 0.088, win), np.float32
        )
        # bf16 output quantization bounds the difference
        assert np.abs(ref - got).max() / np.abs(ref).max() < 1e-2


def test_supported_gates():
    assert not supported((1, 16, 128), TS - 1)  # unaligned window
    assert not supported((4, 16, 128), TS)  # multi-row
