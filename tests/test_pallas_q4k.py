"""q4_k MXU-matvec kernel: layout, dequant exactness, kernel numerics.

The kernel streams int4 weight bytes and applies the exact per-32-group
q4_k scale/offset (reference quant semantics:
/root/reference/qwen_asr_gguf/export/gguf/quants.py:475-522); these tests
pin the host repack + XLA dequant bit-exactness against the PackedQ4
oracle and the kernel (interpret mode on CPU) against a float reference.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qwen3_asr_gguf_tpu.formats import quants as q
from qwen3_asr_gguf_tpu.ops import pallas_q4k as pq
from qwen3_asr_gguf_tpu.ops.qtensor import matmul


def _random_packed(n, k, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    return q.pack_q4_direct(w), w


def test_dequant_mxu_vs_oracle():
    """Same int values and group structure as the PackedQ4 oracle; for
    direct-packed f32 sources the only deviation is the 6-bit sub-scale
    factorization (<= d/2 = max_scale/126 per group, the same rounding
    native q4_k carries)."""
    p, _ = _random_packed(64, 256)
    dense_oracle = q.unpack_q4(p)
    w = pq.from_packed_q4(p, pad=False)
    dense = np.asarray(pq.dequant_mxu(w, dtype=jnp.float32))
    tol = (15 * np.abs(p.scale).max() + np.abs(p.minv).max()) / 126 + 1e-6
    np.testing.assert_allclose(dense, dense_oracle, atol=tol)


def test_dequant_mxu_bit_exact_for_native_q4k():
    """GGUF-sourced (native q4_k) weights reconstruct BIT-EXACTLY: integer
    6-bit sub-scales are lossless and the f32 supers hold the file's f16
    without rounding (reference dequant semantics:
    /root/reference/qwen_asr_gguf/export/gguf/quants.py:475-522)."""
    rng = np.random.default_rng(41)
    n, k = 16, 512
    wsrc = (rng.standard_normal((n, k)) * 0.07).astype(np.float32)
    blob = q.quantize_q4_k(wsrc)
    dense_oracle = q.dequantize_q4_k(blob, (n, k)).astype(np.float32)
    p = q.repack_q4_k(blob, (n, k))
    w = pq.from_packed_q4(p, pad=False)
    dense = np.asarray(pq.dequant_mxu(w, dtype=jnp.float32))
    np.testing.assert_allclose(dense, dense_oracle, rtol=0, atol=1e-6)


def test_pack_row_pair_layout():
    p, _ = _random_packed(8, 64, seed=3)
    rows, sub_t, min_t, dd_t = pq.pack_q4k_mxu(p)
    assert rows.shape == (4, 64)
    assert sub_t.shape == (2, 8) and min_t.shape == (2, 8)
    assert dd_t.shape == (2, 8)  # one superblock: [d; dmin]
    # low nibble = even channel, high nibble = odd channel, signed q-8
    dense_oracle = q.unpack_q4(p)
    lo = ((rows & 0xF).astype(np.int8) ^ 8) - 8
    scale = (sub_t.astype(np.float32) * dd_t[0::2].repeat(8, axis=0)[:2]).T
    minv = (min_t.astype(np.float32) * dd_t[1::2].repeat(8, axis=0)[:2]).T
    offs = 8.0 * scale - minv
    g = 64 // 32
    rec0 = (lo[0].reshape(g, 32) * scale[0][:, None] + offs[0][:, None]).reshape(64)
    tol = (15 * np.abs(p.scale).max() + np.abs(p.minv).max()) / 126 + 1e-6
    np.testing.assert_allclose(rec0, dense_oracle[0], atol=tol)


def test_pad_rows_dequants_to_zero():
    p, _ = _random_packed(6, 64, seed=1)
    parts = pq.pad_rows(*pq.pack_q4k_mxu(p), multiple=16)
    w = pq.Q4KMXUWeight(*(jnp.asarray(a) for a in parts))
    dense = np.asarray(pq.dequant_mxu(w, dtype=jnp.float32))
    assert dense.shape == (16, 64)
    assert np.all(dense[6:] == 0.0)


def test_matvec_kernel_interpret():
    n, k = pq.BN, 1024  # one N tile, two K steps
    p, _ = _random_packed(n, k, seed=7)
    w = pq.from_packed_q4(p)
    dense = q.unpack_q4(p)
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((1, k)) * 0.1).astype(np.float32)

    y = np.asarray(pq.q4k_matvec(jnp.asarray(x), w))
    ref = x @ dense.T
    # activation int8 quant is the only approximation (same as int8 path)
    cos = np.dot(y.ravel(), ref.ravel()) / (
        np.linalg.norm(y) * np.linalg.norm(ref) + 1e-12
    )
    assert cos > 0.9995, cos
    np.testing.assert_allclose(y, ref, atol=np.abs(ref).max() * 0.02)


def test_matmul_dispatch_matvec_and_fallback():
    n, k = pq.BN, 512
    p, _ = _random_packed(n, k, seed=5)
    w = pq.from_packed_q4(p)
    dense = q.unpack_q4(p)
    rng = np.random.default_rng(2)

    x1 = (rng.standard_normal((1, k)) * 0.1).astype(np.float32)
    y1 = np.asarray(matmul(jnp.asarray(x1), w))
    np.testing.assert_allclose(y1, x1 @ dense.T, atol=np.abs(dense).max() * k * 0.002)

    # prefill shape -> dense fallback: matches its own dequant tightly, and
    # the full-precision oracle within the 6-bit scale-factorization noise
    xT = (rng.standard_normal((4, k)) * 0.1).astype(np.float32)
    yT = np.asarray(matmul(jnp.asarray(xT), w))
    dense_m = np.asarray(pq.dequant_mxu(w, dtype=jnp.float32))
    np.testing.assert_allclose(yT, xT @ dense_m.T, rtol=2e-2, atol=5e-4)
    np.testing.assert_allclose(yT, xT @ dense.T, atol=np.abs(yT).max() * 0.05)


def test_unsupported_shapes_fall_back():
    # K not a multiple of 512 -> supported() false, dense path still correct
    p, _ = _random_packed(32, 64, seed=9)
    w = pq.from_packed_q4(p, pad=False)
    assert not pq.supported((1, 64), w)
    dense = np.asarray(pq.dequant_mxu(w, dtype=jnp.float32))
    x = np.ones((1, 64), np.float32)
    y = np.asarray(matmul(jnp.asarray(x), w))
    np.testing.assert_allclose(y, x @ dense.T, rtol=2e-2, atol=1e-4)


def test_per_group_activation_quant_beats_per_row():
    """Kernel v2 quantizes activations per 32-group IN-KERNEL (llama.cpp
    q8_1 semantics). An outlier activation must no longer poison the whole
    row (VERDICT r2 weak #5): with one huge element, per-row int8 quant
    zeroes most of the vector; the kernel's per-group quant keeps every
    other group exact to ~1%."""
    n, k = pq.BN, 1024
    p, _ = _random_packed(n, k, seed=13)
    w = pq.from_packed_q4(p)
    # reference = the kernel's own dequantized weights, so the comparison
    # isolates ACTIVATION quantization (not the 6-bit scale factorization)
    dense = np.asarray(pq.dequant_mxu(w, dtype=jnp.float32))
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((1, k)) * 0.1).astype(np.float32)
    x[0, 7] = 500.0  # outlier in group 0

    y = np.asarray(pq.q4k_matvec(jnp.asarray(x), w))
    ref = x @ dense.T
    cos = np.dot(y.ravel(), ref.ravel()) / (
        np.linalg.norm(y) * np.linalg.norm(ref) + 1e-12
    )
    assert cos > 0.9995, cos

    # per-ROW quant reference: the outlier scale flattens everything else
    sx = np.abs(x).max() / 127.0
    xq = np.clip(np.round(x / sx), -127, 127) * sx
    ref_rowq = xq @ dense.T
    cos_row = np.dot(ref_rowq.ravel(), ref.ravel()) / (
        np.linalg.norm(ref_rowq) * np.linalg.norm(ref) + 1e-12
    )
    assert cos > cos_row  # strictly better than the old per-row behavior


def test_matvec_kernel_multi_kstep_offsets():
    """K > SUBK exercises the in-kernel offset accumulation across K steps
    (asymmetric minv applied per 32-group inside the pallas kernel)."""
    n, k = pq.BN, 4096  # subk=2048 -> 2 K steps
    p, _ = _random_packed(n, k, seed=17)
    w = pq.from_packed_q4(p)
    dense = np.asarray(pq.dequant_mxu(w, dtype=jnp.float32))
    rng = np.random.default_rng(19)
    x = (rng.standard_normal((1, k)) * 0.2 + 0.05).astype(np.float32)

    y = np.asarray(pq.q4k_matvec(jnp.asarray(x), w))
    ref = x @ dense.T
    np.testing.assert_allclose(y, ref, atol=np.abs(ref).max() * 0.02)


def test_matmul_rows_matches_matvec():
    """Multi-row batched kernel: each row must match the single-row matvec
    (same per-group activation quant + offset math)."""
    n, k = pq.BN, 2048
    p, _ = _random_packed(n, k, seed=23)
    w = pq.from_packed_q4(p)
    rng = np.random.default_rng(29)
    x = (rng.standard_normal((pq.T_TILE * 2, k)) * 0.15).astype(np.float32)

    assert pq.supported_rows(x.shape, w)
    y = np.asarray(pq.q4k_matmul_rows(jnp.asarray(x), w))
    assert y.shape == (pq.T_TILE * 2, n)
    for t in range(x.shape[0]):
        y1 = np.asarray(pq.q4k_matvec(jnp.asarray(x[t : t + 1]), w))
        np.testing.assert_allclose(y[t], y1[0], rtol=1e-5, atol=1e-4)


def test_matmul_rows_dispatch_via_matmul():
    from qwen3_asr_gguf_tpu.ops.qtensor import matmul as qmatmul

    n, k = pq.BN, 1024
    p, _ = _random_packed(n, k, seed=31)
    w = pq.from_packed_q4(p)
    dense = q.unpack_q4(p)
    rng = np.random.default_rng(37)
    x = (rng.standard_normal((pq.T_TILE, k)) * 0.1).astype(np.float32)
    y = np.asarray(qmatmul(jnp.asarray(x), w))
    ref = x @ dense.T
    np.testing.assert_allclose(y, ref, atol=np.abs(ref).max() * 0.02)


def test_matvec_normed_bit_parity():
    """The norm-fused matvec equals rms_norm -> q4k_matvec exactly (the
    kernel replays the bf16 round-trip the unfused path takes)."""
    import jax.numpy as jnp

    from qwen3_asr_gguf_tpu.formats.quants import pack_q4_direct
    from qwen3_asr_gguf_tpu.models.decoder import rms_norm
    from qwen3_asr_gguf_tpu.ops.pallas_q4k import (
        from_packed_q4,
        q4k_matvec,
        q4k_matvec_normed,
        supported_normed,
    )

    rng = np.random.default_rng(0)
    k, n = 2048, 512
    w = from_packed_q4(pack_q4_direct(rng.standard_normal((n, k)).astype(np.float32)))
    x = jnp.asarray(rng.standard_normal((1, k)).astype(np.float32)).astype(jnp.bfloat16)
    nw = jnp.asarray(np.abs(rng.standard_normal(k)).astype(np.float32))
    assert supported_normed(x.shape, w)
    a = np.asarray(q4k_matvec(rms_norm(x, nw, 1e-6), w), np.float32)
    b = np.asarray(q4k_matvec_normed(x, w, nw, 1e-6), np.float32)
    np.testing.assert_array_equal(a, b)
