"""Quant format tests.

Golden vectors in tests/golden/quants_golden.npz were produced by
cross-checking against the ggml NumPy oracle (reference
qwen_asr_gguf/export/gguf/quants.py): for each format, `*_bytes` is our
quantizer's output and `*_dequant` is the ORACLE's dequantization of those
bytes. Bit-exact agreement of our dequantizer with `*_dequant` proves both
directions follow the ggml byte layout.
"""

from pathlib import Path

import numpy as np
import pytest

from qwen3_asr_gguf_tpu.formats import quants as q

GOLDEN = np.load(Path(__file__).parent / "golden" / "quants_golden.npz")


@pytest.mark.parametrize("name,dequant", [
    ("q8_0", q.dequantize_q8_0),
    ("q4_k", q.dequantize_q4_k),
    ("q6_k", q.dequantize_q6_k),
])
def test_dequant_bit_exact_vs_oracle(name, dequant):
    x = GOLDEN["x"]
    got = dequant(GOLDEN[f"{name}_bytes"], x.shape)
    np.testing.assert_array_equal(got, GOLDEN[f"{name}_dequant"])


@pytest.mark.parametrize("name,quantize", [
    ("q8_0", q.quantize_q8_0),
    ("q4_k", q.quantize_q4_k),
    ("q6_k", q.quantize_q6_k),
])
def test_quantize_deterministic_bytes(name, quantize):
    got = quantize(GOLDEN["x"])
    np.testing.assert_array_equal(got.reshape(-1), GOLDEN[f"{name}_bytes"].reshape(-1))


@pytest.mark.parametrize("gt,rel_rmse_bar", [
    (q.GGML_Q8_0, 0.01),
    (q.GGML_Q6_K, 0.03),
    (q.GGML_Q4_K, 0.12),
])
def test_roundtrip_fidelity(rng, gt, rel_rmse_bar):
    x = (rng.standard_normal((16, 1024)) * rng.uniform(0.05, 4.0, (16, 1))).astype(np.float32)
    deq = q.dequantize(q.quantize(x, gt), gt, x.shape)
    rel = np.sqrt(((deq - x) ** 2).mean()) / x.std()
    assert rel < rel_rmse_bar, f"{q.TYPE_NAMES[gt]}: rel rmse {rel}"
    # cosine bar mirroring the reference's encoder fidelity gate (>=96%)
    cos = (deq * x).sum() / (np.linalg.norm(deq) * np.linalg.norm(x))
    assert cos > 0.99


def test_repack_q4k_matches_dequant():
    x = GOLDEN["x"]
    p = q.repack_q4_k(GOLDEN["q4_k_bytes"], x.shape)
    np.testing.assert_array_equal(q.unpack_q4(p), GOLDEN["q4_k_dequant"])
    assert p.packed.shape == (x.shape[0], x.shape[1] // 2)
    assert p.scale.shape == (x.shape[0], x.shape[1] // 32)


def test_pack_q4_direct_fidelity(rng):
    w = rng.standard_normal((64, 256)).astype(np.float32)
    p = q.pack_q4_direct(w)
    deq = q.unpack_q4(p)
    cos = (deq * w).sum() / (np.linalg.norm(deq) * np.linalg.norm(w))
    assert cos > 0.995


def test_bf16_roundtrip(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    u = q.f32_to_bf16_bytes(x)
    back = q.bf16_bytes_to_f32(u)
    assert np.abs(back - x).max() < 0.01 * np.abs(x).max() + 1e-6


def test_f16_f32_dispatch(rng):
    x = rng.standard_normal((4, 64)).astype(np.float32)
    assert np.array_equal(q.dequantize(q.quantize(x, q.GGML_F32), q.GGML_F32, x.shape), x)
    assert np.allclose(q.dequantize(q.quantize(x, q.GGML_F16), q.GGML_F16, x.shape), x, atol=1e-3)
