"""Fused q4 matmul kernel tests (interpret mode on CPU; real on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_gguf_tpu.formats.quants import pack_q4_direct, unpack_q4
from qwen3_asr_gguf_tpu.ops import pallas_qmm
from qwen3_asr_gguf_tpu.ops.qtensor import Q4Weight, matmul


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Force interpreter-mode pallas on CPU (no Mosaic)."""
    if jax.default_backend() != "tpu":
        import functools
        from jax.experimental import pallas as pl

        orig = pl.pallas_call
        monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    yield


def _weight(rng, n, k):
    wf = rng.standard_normal((n, k)).astype(np.float32)
    p = pack_q4_direct(wf)
    return Q4Weight.from_packed(p), unpack_q4(p)


@pytest.mark.parametrize("t", [1, 4, 32])
def test_kernel_matches_oracle(rng, t):
    w, dense = _weight(rng, 512, 1024)
    x = rng.standard_normal((t, 1024)).astype(np.float32)
    out = np.asarray(pallas_qmm.q4_matmul(jnp.asarray(x), w))
    ref = x @ dense.T
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 1e-2, rel


def test_unsupported_shape_falls_back(rng):
    # K=96 is off the tile grid -> XLA dequant fallback, still correct
    w, dense = _weight(rng, 64, 96)
    x = rng.standard_normal((3, 96)).astype(np.float32)
    out = np.asarray(pallas_qmm.q4_matmul(jnp.asarray(x), w))
    np.testing.assert_allclose(out, x @ dense.T, rtol=1e-4, atol=1e-4)
    assert not pallas_qmm.supported(x.shape, w)


def test_matmul_dispatch_uses_pallas(rng):
    w, dense = _weight(rng, 512, 1024)
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    out = np.asarray(matmul(jnp.asarray(x), w, use_pallas=True))
    rel = np.abs(out - x @ dense.T).max() / np.abs(x @ dense.T).max()
    assert rel < 1e-2


def test_leading_dims_flattened(rng):
    w, dense = _weight(rng, 256, 512)
    x = rng.standard_normal((2, 3, 512)).astype(np.float32)
    out = np.asarray(pallas_qmm.q4_matmul(jnp.asarray(x), w))
    assert out.shape == (2, 3, 256)
    np.testing.assert_allclose(
        out.reshape(6, 256), x.reshape(6, 512) @ dense.T, rtol=1e-2, atol=1e-2
    )
