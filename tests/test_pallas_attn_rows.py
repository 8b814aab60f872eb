"""Batched-rows int8-KV decode attention kernel vs its XLA twin.

The rows kernel (ops/pallas_attn.gqa_rows_q8_attention) must compute the
same function as decoder._gqa_attention_rows_q8 — per-(slot, head) scale
folds, per-row slot<=pos masking — with only online-softmax/dot-order
float noise separating them. Runs in interpret mode on CPU (the TPU
lowering is exercised by bench_serve --kv int8 on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_gguf_tpu.models import decoder as dec
from qwen3_asr_gguf_tpu.ops.pallas_attn import (
    TS,
    gqa_rows_q8_attention,
    rows_q8_supported,
)


@pytest.mark.parametrize("win_tiles", [1, 2])
def test_rows_q8_kernel_matches_xla_twin(win_tiles):
    b, hq, hkv, d = 3, 8, 4, 128
    s = 2 * TS
    win = win_tiles * TS
    rng = np.random.default_rng(3)

    dense_k = rng.standard_normal((b, s, hkv, d)).astype(np.float32) * 0.3
    dense_v = rng.standard_normal((b, s, hkv, d)).astype(np.float32) * 0.3
    kq, ks = dec._quant_kv(jnp.asarray(dense_k))
    vq, vs = dec._quant_kv(jnp.asarray(dense_v))
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32) * 0.3
    # rows at different depths, incl. one inside tile 0 only and one at the
    # window edge
    poss = jnp.asarray([5, TS - 1, win - 1], jnp.int32)
    scale = d ** -0.5

    assert rows_q8_supported((b, hq, d), hkv, win)
    got = gqa_rows_q8_attention(q, kq, ks, vq, vs, poss, scale, win)

    mask = jnp.arange(win, dtype=jnp.int32)[None, :] <= poss[:, None]
    want = dec._gqa_attention_rows_q8(
        q, kq[:, :win], ks[:, :win], vq[:, :win], vs[:, :win], mask, scale
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_rows_q8_supported_gate():
    assert not rows_q8_supported((2, 8, 128), 4, TS - 32)  # unaligned window
    assert not rows_q8_supported((2, 8, 64), 4, TS)  # sub-lane head_dim
    assert rows_q8_supported((64, 16, 128), 8, 1024)  # the serving shape


def test_forward_step_rows_picks_kernel_at_aligned_window(monkeypatch):
    """At a TS-aligned window the int8 rows step routes through the pallas
    kernel and still matches the XLA twin route end to end."""
    cfg = dec.TextDecoderConfig(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=128, intermediate_size=128,
    )
    params = dec.init_params(cfg, jax.random.key(1))
    layers = dec.unstack_layers(params["layers"], cfg.num_layers)
    b, s = 2, TS
    rng = np.random.default_rng(7)
    caches = {"k": [], "v": [], "k_s": [], "v_s": []}
    for _ in range(cfg.num_layers):
        kq, ks = dec._quant_kv(jnp.asarray(
            rng.standard_normal((b, s, cfg.num_kv_heads, cfg.head_dim))
            .astype(np.float32) * 0.1))
        vq, vs = dec._quant_kv(jnp.asarray(
            rng.standard_normal((b, s, cfg.num_kv_heads, cfg.head_dim))
            .astype(np.float32) * 0.1))
        caches["k"].append(kq)
        caches["v"].append(vq)
        caches["k_s"].append(ks)
        caches["v_s"].append(vs)
    poss = jnp.asarray([4, 9], jnp.int32)
    embd = jnp.asarray(rng.standard_normal((b, cfg.hidden_size)),
                       jnp.float32) * 0.1

    h_kernel, _ = dec.forward_step_rows(
        layers, params["final_norm"], cfg, embd, caches, poss, attn_window=s)
    monkeypatch.setenv("QWEN3_ROWS_Q8_ATTN", "xla")
    h_xla, _ = dec.forward_step_rows(
        layers, params["final_norm"], cfg, embd, caches, poss, attn_window=s)
    np.testing.assert_allclose(np.asarray(h_kernel), np.asarray(h_xla),
                               rtol=2e-3, atol=2e-3)
