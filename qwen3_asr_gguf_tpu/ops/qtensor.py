"""Quantized weight containers + matmul dispatch.

`Q4Weight` is the device-side mirror of `formats.quants.PackedQ4`: int4
values packed two-per-byte plus per-32-group effective scale/offset planes.
Weights stay packed in HBM; `matmul` dequantizes on the fly — through the
Pallas fused kernel on TPU (ops/pallas_qmm.py) or an XLA
dequant-then-matmul fallback elsewhere.

Convention: weights are [out_features, in_features] (GGUF row order), and
``matmul(x, w) == x @ dequant(w).T``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.quants import PackedQ4


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["packed", "scale", "minv"],
    meta_fields=[],
)
@dataclass
class Q4Weight:
    packed: jax.Array  # uint8 [N, K//2]
    scale: jax.Array  # f32 [N, K//32]
    minv: jax.Array  # f32 [N, K//32]

    @property
    def shape(self) -> tuple[int, int]:
        n, k2 = self.packed.shape
        return (n, k2 * 2)

    @classmethod
    def from_packed(cls, p: PackedQ4) -> "Q4Weight":
        return cls(
            packed=jnp.asarray(p.packed),
            scale=jnp.asarray(p.scale.astype(np.float32)),
            minv=jnp.asarray(p.minv.astype(np.float32)),
        )


def dequant_q4(w: Q4Weight, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize to a dense [N, K] array (XLA path)."""
    n, k = w.shape
    group = k // w.scale.shape[1]
    low = (w.packed & 0x0F).astype(jnp.uint8)
    high = (w.packed >> 4).astype(jnp.uint8)
    if group == 32 and (k // 2) % 32 == 0:
        # undo the rank-major packing: [rank, g] -> [g, rank] per half
        g_half = k // 64

        def unperm(h):
            return h.reshape(n, 32, g_half).transpose(0, 2, 1).reshape(n, k // 2)

        low, high = unperm(low), unperm(high)
    q = jnp.concatenate([low, high], axis=-1)  # planar: [first half | second half]
    qf = q.reshape(n, -1, group).astype(jnp.float32)
    dense = qf * w.scale[..., None] - w.minv[..., None]
    return dense.reshape(n, k).astype(dtype)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["q", "scale"],
    meta_fields=[],
)
@dataclass
class Int8Weight:
    """Per-output-channel symmetric int8 weight for the MXU's native int8
    path. Decode is VPU-dequant-bound with packed int4 (each weight element
    needs ~6 VPU ops to unpack+scale, capping streaming at ~95 GB/s on
    v5e); int8 feeds the MXU directly — activations are quantized per row
    on the fly and both scales apply AFTER the matmul, so the weight path
    has zero per-element VPU work."""

    q: jax.Array  # int8 [N, K]
    scale: jax.Array  # f32 [N]

    @property
    def shape(self) -> tuple[int, int]:
        return tuple(self.q.shape[-2:])  # type: ignore[return-value]


def int8_matmul(x: jax.Array, w: Int8Weight) -> jax.Array:
    """x [..., K] @ dequant(w).T via int8 MXU with dynamic activation quant."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(amax / 127.0, 1e-10)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, w.q,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * sx * w.scale
    return out.astype(x.dtype)


@jax.jit
def to_int8(w) -> Int8Weight:
    """Convert a Q4Weight (or dense array) to per-channel int8, on device."""
    dense = dequant_q4(w, dtype=jnp.float32) if isinstance(w, Q4Weight) else w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(dense), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-10)
    q = jnp.clip(jnp.round(dense / scale[:, None]), -127, 127).astype(jnp.int8)
    return Int8Weight(q=q, scale=scale)


def matmul_normed(x: jax.Array, w, norm_w: jax.Array, eps: float) -> jax.Array:
    """rms_norm(x, norm_w, eps) @ w.T, fusing the norm into the q4_k matvec
    kernel when it applies (single row, full-row K step). The fallback is
    bit-identical: norm as XLA, then the normal matmul dispatch."""
    from ..models.decoder import rms_norm
    from .pallas_q4k import Q4KMXUWeight, q4k_matvec_normed, supported_normed

    if isinstance(w, Q4KMXUWeight) and supported_normed(x.shape, w):
        return q4k_matvec_normed(x, w, norm_w, eps)
    return matmul(rms_norm(x, norm_w, eps), w)


def matmul(x: jax.Array, w, *, use_pallas: bool | None = None) -> jax.Array:
    """x [..., K] @ w.T -> [..., N]; w is Q4KMXUWeight, Int8Weight, Q4Weight
    or dense [N, K]."""
    from .pallas_q4k import (
        Q4KMXUWeight,
        dequant_mxu,
        q4k_matmul_rows,
        q4k_matvec,
        supported as q4k_ok,
        supported_rows,
    )

    if isinstance(w, Q4KMXUWeight):
        if q4k_ok(x.shape, w):
            return q4k_matvec(x, w)  # decode matvec: int4 stream, exact q4_k
        if supported_rows(x.shape, w):
            return q4k_matmul_rows(x, w)  # batched decode rows (serving)
        dense = dequant_mxu(w, dtype=x.dtype)  # prefill / large-batch fallback
        return jax.lax.dot_general(
            x, dense,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    if isinstance(w, Int8Weight):
        return int8_matmul(x, w)
    if isinstance(w, Q4Weight):
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            from .pallas_qmm import q4_matmul

            return q4_matmul(x, w)
        dense = dequant_q4(w, dtype=x.dtype)
        return jax.lax.dot_general(
            x, dense,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    return jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


@jax.jit
def _dequant_q6k_blocks(blocks: jax.Array) -> jax.Array:
    """ggml Q6_K block dequant on device (blocks [nb, 210] uint8 -> f32 [nb, 256]).

    Used at load time for the big q6_k tensors (token_embd/output in a
    q4_k_m file): the vectorized host dequant of a 151k x 2048 table costs
    ~40 s on one CPU core; on the accelerator it is milliseconds.
    """
    nb = blocks.shape[0]
    ql = blocks[:, 0:128]
    qh = blocks[:, 128:192]
    sc = jax.lax.bitcast_convert_type(blocks[:, 192:208], jnp.int8).astype(jnp.float32)
    d = jax.lax.bitcast_convert_type(
        blocks[:, 208:210].reshape(nb, 1, 2), jnp.float16
    ).astype(jnp.float32)  # [nb, 1]

    qlg = ql.reshape(nb, 2, 1, 64)
    lo = jnp.concatenate([qlg & 0x0F, qlg >> 4], axis=2).reshape(nb, 256)
    qhg = qh.reshape(nb, 2, 1, 32)
    hi = jnp.concatenate(
        [(qhg >> s) & 0x03 for s in (0, 2, 4, 6)], axis=2
    ).reshape(nb, 256)
    q = (lo | (hi << 4)).astype(jnp.int32) - 32

    w = (d * sc).reshape(nb, 16, 1) * q.reshape(nb, 16, 16).astype(jnp.float32)
    return w.reshape(nb, 256)


def dequant_q6k_device(blocks_u8: np.ndarray, shape: tuple[int, ...], dtype=jnp.bfloat16) -> jax.Array:
    blocks = jnp.asarray(np.ascontiguousarray(blocks_u8).reshape(-1, 210))
    return _dequant_q6k_blocks(blocks).reshape(shape).astype(dtype)


def quantize_dense(w: np.ndarray | jax.Array, group: int = 32) -> Q4Weight:
    """Quantize a dense [N, K] weight into the TPU int4 layout."""
    from ..formats.quants import pack_q4_direct

    return Q4Weight.from_packed(pack_q4_direct(np.asarray(w, dtype=np.float32), group=group))
