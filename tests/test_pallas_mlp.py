"""Fused int8 MLP kernel vs an exact NumPy twin of its quantization math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_gguf_tpu.ops.pallas_mlp import fused_mlp_matvec


def _np_reference(x, wg_q, sg, wu_q, su, wd_q, sd, tile_m):
    """Same math as the kernel, in NumPy (per-tile act quantization)."""
    xf = x.astype(np.float64).astype(np.float32)
    sx = max(np.abs(xf).max() / 127.0, 1e-10)
    xq = np.clip(np.round(xf / sx), -127, 127).astype(np.int32)

    m, d = wg_q.shape
    acc = np.zeros((1, d), np.float32)
    for t0 in range(0, m, tile_m):
        t1 = t0 + tile_m
        g = (xq @ wg_q[t0:t1].astype(np.int32).T).astype(np.float32) * (sx * sg[t0:t1])
        u = (xq @ wu_q[t0:t1].astype(np.int32).T).astype(np.float32) * (sx * su[t0:t1])
        act = (g * (1.0 / (1.0 + np.exp(-g)))) * u
        s_act = max(np.abs(act).max() / 127.0, 1e-10)
        actq = np.clip(np.round(act / s_act), -127, 127).astype(np.int32)
        acc += (actq @ wd_q[:, t0:t1].astype(np.int32).T).astype(np.float32) * s_act
    return acc * sd[None, :]


@pytest.mark.parametrize("m,d,tile", [(512, 256, 256), (1024, 128, 512)])
def test_fused_mlp_matches_numpy_twin(rng, m, d, tile):
    x = (rng.standard_normal((1, d)) * 0.1).astype(np.float32)
    wg = rng.integers(-127, 128, (m, d)).astype(np.int8)
    wu = rng.integers(-127, 128, (m, d)).astype(np.int8)
    wd = rng.integers(-127, 128, (d, m)).astype(np.int8)
    sg = (rng.random(m) * 0.01 + 0.001).astype(np.float32)
    su = (rng.random(m) * 0.01 + 0.001).astype(np.float32)
    sd = (rng.random(d) * 0.01 + 0.001).astype(np.float32)

    got = np.asarray(fused_mlp_matvec(
        jnp.asarray(x), jnp.asarray(wg), jnp.asarray(sg),
        jnp.asarray(wu), jnp.asarray(su), jnp.asarray(wd), jnp.asarray(sd),
        tile_m=tile, interpret=True,
    ))
    want = _np_reference(x, wg, sg, wu, su, wd, sd, tile)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_mlp_tracks_float_mlp(rng):
    """End-to-end sanity: the kernel approximates the dense float MLP."""
    m, d = 1024, 256
    wg_f = (rng.standard_normal((m, d)) * 0.05).astype(np.float32)
    wu_f = (rng.standard_normal((m, d)) * 0.05).astype(np.float32)
    wd_f = (rng.standard_normal((d, m)) * 0.05).astype(np.float32)

    def quant(w):
        s = np.maximum(np.abs(w).max(axis=1) / 127.0, 1e-10)
        return np.clip(np.round(w / s[:, None]), -127, 127).astype(np.int8), s.astype(np.float32)

    wg, sg = quant(wg_f)
    wu, su = quant(wu_f)
    wd, sd = quant(wd_f)
    x = (rng.standard_normal((1, d)) * 0.2).astype(np.float32)

    got = np.asarray(fused_mlp_matvec(
        jnp.asarray(x), jnp.asarray(wg), jnp.asarray(sg),
        jnp.asarray(wu), jnp.asarray(su), jnp.asarray(wd), jnp.asarray(sd),
        tile_m=512, interpret=True,
    ))
    g = x @ wg_f.T
    act = (g / (1 + np.exp(-g))) * (x @ wu_f.T)
    want = act @ wd_f.T
    cos = (got.ravel() * want.ravel()).sum() / (
        np.linalg.norm(got) * np.linalg.norm(want)
    )
    assert cos > 0.999, cos
