"""Pallas TPU kernel: single-token GQA decode attention over the KV window.

The XLA decode attention (decoder._gqa_attention at T=1) costs ~0.25 ms/tok
at 1.7B/win 1024 — the window read rides generic fusions below the HBM
roof and the scores/softmax/PV chain adds launch-bound VPU ops between the
weight-streaming matvec kernels. This kernel streams the K/V window tiles
once at full bandwidth and keeps the whole score -> online-softmax -> PV
chain in VMEM (flash-decoding structure, one tile of slots per grid step).

Equivalent of the reference's ggml attention at T=1 (llama.cpp
ggml-cuda/fattn*.cu is the CUDA analogue); numerics follow
decoder._gqa_attention: f32 score accumulation, f32 softmax, probs cast to
the V dtype for the PV dot.

Mosaic-shaped design (v5e):
- K/V tiles arrive [TS, Hkv, d] (the cache's natural slot-major layout)
  and flatten FREE to [TS*Hkv, d] (row = slot*Hkv + head).
- scores compute as ONE [Hq, d] x [d, TS*Hkv] MXU dot — all (q-head,
  kv-head) pairs. The 8x extra MXU work is free (the kernel is
  bandwidth-bound; Mosaic has no cross-position batched matmul), and a
  one-hot head-selection mask keeps only each query's own kv head.
- online softmax keeps running (max, sum, acc) f32 scratch across the
  window grid; masking uses the global slot index vs `pos`.
- PV is the mirrored trick: probs scatter into the [Hq, TS*Hkv] layout by
  the same one-hot, then ONE [Hq, TS*Hkv] x [TS*Hkv, d] MXU dot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TS = 256  # KV slots per grid step (window buckets are 256-aligned)


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, *, scale, group):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, -1e30)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    q = q_ref[:]  # [Hq, d] (cache dtype)
    hq, d = q.shape
    ts, hkv, _ = k_ref.shape
    rows = ts * hkv
    k_flat = k_ref[:].reshape(rows, d)  # row = slot*Hkv + head (free reshape)
    v_flat = v_ref[:].reshape(rows, d)

    # all-pairs scores on the (idle) MXU, then select each q head's kv head
    s_all = jax.lax.dot_general(
        q, k_flat,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [Hq, TS*Hkv]
    row_head = jax.lax.broadcasted_iota(jnp.int32, (hq, rows), 1) % hkv
    my_head = jax.lax.broadcasted_iota(jnp.int32, (hq, rows), 0) // group
    slot = j * ts + jax.lax.broadcasted_iota(jnp.int32, (hq, rows), 1) // hkv
    keep = (row_head == my_head) & (slot <= pos_ref[0])
    s_all = jnp.where(keep, s_all, -1e30)

    m_prev = m_s[:]  # [Hq, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s_all, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p_all = jnp.where(keep, jnp.exp(s_all - m_new), 0.0)  # [Hq, TS*Hkv]
    l_s[:] = l_s[:] * alpha + jnp.sum(p_all, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p_all.astype(v_flat.dtype), v_flat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Hq, d]
    acc_s[:] = acc_s[:] * alpha + pv
    m_s[:] = m_new

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = (acc_s[:] / jnp.maximum(l_s[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "win", "group"))
def _attn_call(pos, q, k_full, v_full, scale: float, win: int, group: int):
    """k_full/v_full are the FULL cache arrays [S, Hkv, d]; the grid bounds
    the read to the first `win` slots (a host-side k[:win] slice would
    materialize a [win, Hkv, d] copy per layer per token)."""
    hq, d = q.shape
    hkv = k_full.shape[1]
    grid = (win // TS,)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((hq, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, hkv, d), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, hkv, d), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hq, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hq, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * win * hq * d * k_full.shape[1],
            bytes_accessed=2 * win * k_full.shape[1] * d * k_full.dtype.itemsize,
            transcendentals=win * hq,
        ),
        interpret=jax.default_backend() != "tpu",
    )(pos, q, k_full, v_full)


def supported(q_shape, win: int) -> bool:
    """Single token, TS-aligned window."""
    t = 1 if len(q_shape) == 2 else int(q_shape[0])
    return t == 1 and win % TS == 0 and win >= TS


def gqa_decode_attention(q, k_full, v_full, pos, scale: float, win: int):
    """q [1, Hq, d], k/v the FULL cache [S, Hkv, d], pos int32 scalar (last
    valid slot), win static (<= S, TS-aligned) -> [1, Hq, d]. Matches
    decoder._gqa_attention(q, k[:win], v[:win], slot<=pos mask)."""
    _, hq, d = q.shape
    hkv = k_full.shape[1]
    group = hq // hkv
    qr = q.reshape(hq, d).astype(k_full.dtype)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    out = _attn_call(pos_arr, qr, k_full, v_full, float(scale), int(win), group)
    return out.reshape(1, hq, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# Batched-rows int8-KV decode attention (the serving decode body).
#
# The XLA twin (decoder._gqa_attention_rows_q8) folds the per-(slot, head)
# scales into the dots, but XLA materializes the int8->bf16 window cast as
# its own HBM-resident fusion output at batch width — measured 689 vs 818
# s-audio/s against bf16 KV at batch 64, i.e. int8 KV LOST despite half the
# bytes. This kernel streams the int8 tiles once and keeps the cast, the
# scale folds, and the online softmax entirely in VMEM, so the dominant
# HBM term of a batched decode step (the KV window: ~2x the weight bytes
# at batch 64, VERDICT r4 ask #3) is actually halved.
#
# Per-kv-head unrolled structure: one [g, d] x [d, TS] MXU dot per kv head
# per tile (g = Hq/Hkv). Unlike the single-token kernel's all-pairs trick
# this wastes no MXU work, and — more importantly — every operand keeps a
# natural Mosaic layout: k/v tiles slice to [TS, d] (lane = d), scale rows
# reshape [TS] -> [1, TS] only.
# ---------------------------------------------------------------------------


def _rows_kernel(pos_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
                 m_s, l_s, acc_s, *, scale, hkv, group):
    i = pl.program_id(0)  # batch row
    j = pl.program_id(1)  # window tile (innermost: streams row i's window)

    @pl.when(j == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, -1e30)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    q = q_ref[0]  # [Hq, d]
    ts = k_ref.shape[1]
    pos = pos_ref[i]
    slot = jax.lax.broadcasted_iota(jnp.int32, (group, ts), 1) + j * ts
    keep = slot <= pos

    for h in range(hkv):
        r0, r1 = h * group, (h + 1) * group
        qh = q[r0:r1]  # [g, d]
        kh = k_ref[0, :, h, :].astype(qh.dtype)  # int8 -> compute dtype, VMEM-only
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [g, TS]
        ksh = ks_ref[0, :, h].reshape(1, ts)  # f32 per-slot K scales
        s = s * (ksh * scale)
        s = jnp.where(keep, s, -1e30)

        m_prev = m_s[r0:r1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(keep, jnp.exp(s - m_new), 0.0)  # [g, TS] f32
        l_s[r0:r1] = l_s[r0:r1] * alpha + jnp.sum(p, axis=1, keepdims=True)

        vsh = vs_ref[0, :, h].reshape(1, ts)
        pf = (p * vsh).astype(qh.dtype)  # scale fold mirrors the XLA twin
        vh = v_ref[0, :, h, :].astype(qh.dtype)
        pv = jax.lax.dot_general(
            pf, vh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [g, d]
        acc_s[r0:r1] = acc_s[r0:r1] * alpha + pv
        m_s[r0:r1] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = (acc_s[:] / jnp.maximum(l_s[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "win"))
def _rows_attn_call(poss, q, k_full, ks_full, v_full, vs_full,
                    scale: float, win: int):
    b, hq, d = q.shape
    hkv = k_full.shape[2]
    group = hq // hkv
    grid = (b, win // TS)
    return pl.pallas_call(
        functools.partial(_rows_kernel, scale=scale, hkv=hkv, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS, hkv, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS, hkv), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS, hkv, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS, hkv), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * win * hq * d,
            bytes_accessed=b * win * hkv * (2 * d + 8),
            transcendentals=b * win * hq,
        ),
        interpret=jax.default_backend() != "tpu",
    )(poss, q, k_full, ks_full, v_full, vs_full)


def rows_q8_supported(q_shape, hkv: int, win: int) -> bool:
    """[B, Hq, d] queries, TS-aligned window, lane-exact head_dim."""
    if len(q_shape) != 3:
        return False
    b, hq, d = q_shape
    return (win % TS == 0 and win >= TS and d % 128 == 0
            and hq % hkv == 0 and b >= 1)


def gqa_rows_q8_attention(q, k_full, ks_full, v_full, vs_full, poss,
                          scale: float, win: int):
    """q [B, Hq, d]; k/v the FULL int8 caches [B, S, Hkv, d] with f32
    scales [B, S, Hkv]; poss [B] per-row last valid slot; win static
    (<= S, TS-aligned) -> [B, Hq, d]. Matches
    decoder._gqa_attention_rows_q8(q, k[:, :win], ..., slot<=pos mask)."""
    out = _rows_attn_call(
        jnp.asarray(poss, jnp.int32), q, k_full, ks_full, v_full, vs_full,
        float(scale), int(win),
    )
    return out.astype(q.dtype)
