"""Native host-runtime parity tests (C++ codecs vs NumPy reference).

Builds the library on first run (cmake/ninja or g++, ~5 s); skips if no
toolchain is available.
"""

import shutil

import numpy as np
import pytest

from qwen3_asr_gguf_tpu import native
from qwen3_asr_gguf_tpu.formats import quants as q


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        if shutil.which("g++") is None and shutil.which("cmake") is None:
            pytest.skip("no native toolchain")
        native.build(verbose=False)
        native._load_attempted = False  # retry load
        native._lib = None
    if not native.available():
        pytest.skip("native lib failed to load")
    return native.load()


@pytest.fixture()
def numpy_only(monkeypatch):
    """Force the NumPy fallback inside formats.quants."""
    monkeypatch.setattr(native, "available", lambda: False)


def _sample(rng, rows=32, k=1024):
    return (rng.standard_normal((rows, k)) * rng.uniform(0.1, 3.0, (rows, 1))).astype(np.float32)


def test_dequant_parity(lib, rng):
    x = _sample(rng)
    for qt, blk in ((q.GGML_Q4_K, 144), (q.GGML_Q6_K, 210), (q.GGML_Q8_0, 34)):
        by = q.quantize(x, qt)  # native quantize where applicable
        import qwen3_asr_gguf_tpu.native as nat

        real = nat.available
        nat.available = lambda: False
        try:
            ref = q.dequantize(by, qt, x.shape)
        finally:
            nat.available = real
        got = q.dequantize(by, qt, x.shape)
        np.testing.assert_array_equal(got, ref, err_msg=q.TYPE_NAMES[qt])


def test_quantize_q4k_parity(lib, rng):
    x = _sample(rng)
    import qwen3_asr_gguf_tpu.native as nat

    real = nat.available
    nat.available = lambda: False
    try:
        ref = q.quantize_q4_k(x)
    finally:
        nat.available = real
    np.testing.assert_array_equal(q.quantize_q4_k(x), ref)


def test_repack_and_pack_parity(lib, rng):
    x = _sample(rng)
    by = q.quantize_q4_k(x)
    import qwen3_asr_gguf_tpu.native as nat

    real = nat.available
    nat.available = lambda: False
    try:
        ref_rp = q.repack_q4_k(by, x.shape)
        ref_pd = q.pack_q4_direct(x)
    finally:
        nat.available = real
    rp = q.repack_q4_k(by, x.shape)
    pd = q.pack_q4_direct(x)
    for field in ("packed", "scale", "minv"):
        np.testing.assert_array_equal(getattr(rp, field), getattr(ref_rp, field))
        np.testing.assert_array_equal(getattr(pd, field), getattr(ref_pd, field))


def test_golden_vectors_via_native(lib):
    """The committed oracle golden vectors must hold through the C++ path."""
    from pathlib import Path

    golden = np.load(Path(__file__).parent / "golden" / "quants_golden.npz")
    x = golden["x"]
    got = q.dequantize_q4_k(golden["q4_k_bytes"], x.shape)
    np.testing.assert_array_equal(got, golden["q4_k_dequant"])
    got6 = q.dequantize_q6_k(golden["q6_k_bytes"], x.shape)
    np.testing.assert_array_equal(got6, golden["q6_k_dequant"])
