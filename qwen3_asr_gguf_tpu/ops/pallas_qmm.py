"""Pallas TPU kernel: fused int4 dequant + matmul.

The decoder's weights stay nibble-packed in HBM (`Q4Weight`, planar
layout); this kernel streams packed tiles into VMEM, dequantizes on the VPU
(two shifts + per-32-group scale/offset) and feeds the MXU — the TPU
equivalent of llama.cpp's fused q4_K matmul kernels
(ref ggml-cuda / ggml-vulkan mul_mat_vec_q4_K paths).

Why it matters: at batch<=8 decode the matmul is HBM-bandwidth-bound, and
int4 halves the bytes/weight vs int8 (4.5x vs bf16 including scales), which
is directly the token-rate ceiling.

Grid: (N/BN, K/BK) with the K axis innermost accumulating into the
revisited output block. The planar packing means a packed tile's low
nibbles contract against x[:, k0:k0+BKh] and its high nibbles against
x[:, K/2+k0:...], so x and the scale planes are passed pre-split in halves
and no lane interleave ever happens in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qtensor import Q4Weight, dequant_q4

GROUP = 32  # quantization group size along K


def _kernel(xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref, mlo_ref, mhi_ref, o_ref, *, bn, bkh):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    packed = w_ref[:]  # [BN, BKh] uint8, rank-major columns

    def expand(s_ref):
        # rank-major packing makes every tile's per-column scale pattern a
        # whole-row tile-repeat of [s0..s_{G-1}] — one VPU repeat, no
        # matmuls, identical for every K step.
        s = s_ref[:]  # [BN, G_half]
        return pltpu.repeat(s, bkh // s.shape[1], axis=1)

    # uint8 -> int32 -> f32 (Mosaic has no direct u8->f32 cast)
    p32 = packed.astype(jnp.int32)
    lo_w = (p32 & 0x0F).astype(jnp.float32) * expand(slo_ref) - expand(mlo_ref)
    hi_w = (p32 >> 4).astype(jnp.float32) * expand(shi_ref) - expand(mhi_ref)

    acc = jax.lax.dot_general(
        xlo_ref[:].astype(jnp.float32), lo_w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc += jax.lax.dot_general(
        xhi_ref[:].astype(jnp.float32), hi_w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("bn", "bkh"))
def _q4_matmul_2d(x, packed, scale, minv, bn: int, bkh: int):
    t, k = x.shape
    n, k2 = packed.shape
    g = k2 // GROUP  # groups per half

    def perm(xh):  # natural -> rank-major to match the packed columns
        return xh.reshape(t, g, GROUP).transpose(0, 2, 1).reshape(t, k2)

    xlo, xhi = perm(x[:, : k // 2]), perm(x[:, k // 2 :])
    slo, shi = scale[:, :g], scale[:, g:]
    mlo, mhi = minv[:, :g], minv[:, g:]

    grid = (n // bn, k2 // bkh)

    scale_spec = pl.BlockSpec((bn, g), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, bn=bn, bkh=bkh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, bkh), lambda i, j: (0, j), memory_space=pltpu.VMEM),  # xlo
            pl.BlockSpec((t, bkh), lambda i, j: (0, j), memory_space=pltpu.VMEM),  # xhi
            pl.BlockSpec((bn, bkh), lambda i, j: (i, j), memory_space=pltpu.VMEM),  # packed
            scale_spec,  # slo
            scale_spec,  # shi
            scale_spec,  # mlo
            scale_spec,  # mhi
        ],
        out_specs=pl.BlockSpec((t, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * n * k,
            bytes_accessed=n * k2 + 4 * n * (k // GROUP) * 2 + t * k * 2 + t * n * 4,
            transcendentals=0,
        ),
    )(xlo, xhi, packed, slo, shi, mlo, mhi)
    return out


def _gcd(a: int, b: int) -> int:
    while b:
        a, b = b, a % b
    return a


def pick_bkh(k: int) -> int | None:
    """Packed-bytes-per-K-step: a lane-aligned multiple of the per-half
    group count that divides the half width (so the scale tile-repeat and
    the grid both line up)."""
    k2 = k // 2
    if k2 % GROUP:
        return None
    g = k2 // GROUP
    base = g * 128 // _gcd(g, 128)  # lcm(g, 128)
    if base > k2 or k2 % base:
        return k2 if k2 % 128 == 0 else None  # single K step
    # grow toward ~512 bytes per step for fewer grid iterations; beyond 512
    # the per-step VMEM footprint risks the 16 MB scoped limit
    bkh = base
    while bkh * 2 <= min(k2, 512) and k2 % (bkh * 2) == 0:
        bkh *= 2
    return bkh if bkh <= 512 else None


def supported(x_shape: tuple[int, ...], w: Q4Weight, bn: int = 256) -> bool:
    n, k = w.shape
    if k // w.scale.shape[1] != GROUP:
        return False  # non-32 grouping: no rank-major packing
    return pick_bkh(k) is not None and n % bn == 0


def q4_matmul(x: jax.Array, w: Q4Weight, *, bn: int = 256) -> jax.Array:
    """x [..., K] @ dequant(w).T -> [..., N] via the fused kernel.

    Falls back to XLA dequant-then-matmul for shapes off the tile grid.
    """
    n, k = w.shape
    lead = x.shape[:-1]
    t = int(np.prod(lead)) if lead else 1
    # large T is matmul-bound: the XLA dequant-then-dot path amortizes the
    # dequant over T rows and avoids the kernel's VMEM pressure on wide x
    if t > 64 or not supported(x.shape, w, bn):
        dense = dequant_q4(w, dtype=x.dtype)
        return jax.lax.dot_general(
            x, dense, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    bkh = pick_bkh(k)
    x2 = x.reshape(t, k)
    tp = max(8, -(-t // 8) * 8)  # sublane-align rows
    if tp != t:
        x2 = jnp.pad(x2, ((0, tp - t), (0, 0)))
    out = _q4_matmul_2d(x2, w.packed, w.scale, w.minv, bn, bkh)
    out = out[:t].reshape(*lead, n)
    return out.astype(x.dtype)
