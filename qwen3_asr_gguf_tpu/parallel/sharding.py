"""Device-mesh sharding rules.

The reference has no distributed layer at all (SURVEY.md §2.6 — its only
"distributed" axis is a helper process and three mp.Queues). Scaling here
is the TPU-native design: a `jax.sharding.Mesh` with

- ``data``  : data parallelism (batch axis),
- ``model`` : tensor parallelism (attention heads / MLP columns),

param/activation shardings annotated below, and XLA inserting the ICI
collectives. Sequence-sharded activations (SP) are applied as constraints
inside the train step where the tokens axis is large.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.configs import AudioEncoderConfig, TextDecoderConfig
from ..ops.qtensor import Int8Weight, Q4Weight


def make_mesh(shape: Optional[dict[str, int]] = None, devices=None) -> Mesh:
    """shape e.g. {"data": 2, "model": 4}; default: all devices on `model`."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = {"data": 1, "model": devices.size}
    names = tuple(shape)
    dims = tuple(shape[n] for n in names)
    if int(np.prod(dims)) != devices.size:
        raise ValueError(f"mesh {shape} wants {np.prod(dims)} devices, have {devices.size}")
    return Mesh(devices.reshape(dims), names)


# -- decoder param specs ---------------------------------------------------
# Weights are [out, in] ([L, out, in] stacked); TP shards the out axis of
# column-parallel projections and the in axis of row-parallel ones, so each
# attention head / MLP column lives wholly on one device and o_proj/down_proj
# contractions end in one psum over `model` (Megatron layout).

_DEC_LAYER_SPECS = {
    "attn_norm": P(),
    "q_proj": P(None, "model", None),
    "k_proj": P(None, "model", None),
    "v_proj": P(None, "model", None),
    "o_proj": P(None, None, "model"),
    "q_norm": P(),
    "k_norm": P(),
    "mlp_norm": P(),
    "gate_proj": P(None, "model", None),
    "up_proj": P(None, "model", None),
    "down_proj": P(None, None, "model"),
}


def _q4_spec(spec: P) -> Q4Weight:
    """Q4Weight fields shard like the dense weight: packed/scale/minv all
    follow [*, out, in_packed] with the same out/in split."""
    return Q4Weight(packed=spec, scale=spec, minv=spec)  # type: ignore[arg-type]


def _int8_spec(spec: P) -> Int8Weight:
    """Int8Weight: q shards like the dense weight; the per-out-channel scale
    follows the out axis of the q spec (drops the in axis)."""
    scale_spec = P(*spec[:-1])
    return Int8Weight(q=spec, scale=scale_spec)  # type: ignore[arg-type]


def _q4kmxu_spec(spec: P):
    """Q4KMXUWeight (packed int4 MXU layout) sharded like its dense
    [*, out, in] weight: `packed` is [*, out//2, in] (follows the dense
    spec), while the scale planes `sub_t`/`min_t` [*, G, out] and `dd_t`
    [*, 2S, out] are K-major x N — their out/in axes are SWAPPED. K splits
    land on whole 256-wide superblocks (the engine gates int4 TP on that
    divisibility), so every shard's scale rows stay self-contained."""
    from ..ops.pallas_q4k import Q4KMXUWeight

    lead = tuple(spec[:-2])
    swapped = P(*lead, spec[-1], spec[-2])
    return Q4KMXUWeight(packed=spec, sub_t=swapped, min_t=swapped, dd_t=swapped)  # type: ignore[arg-type]


def _weight_spec(w: Any, spec: P):
    from ..ops.pallas_q4k import Q4KMXUWeight

    if isinstance(w, Q4KMXUWeight):
        return _q4kmxu_spec(spec)
    if isinstance(w, Q4Weight):
        return _q4_spec(spec)
    if isinstance(w, Int8Weight):
        return _int8_spec(spec)
    return spec


def int4_tp_supported(cfg: TextDecoderConfig, model: int) -> bool:
    """Can the PACKED int4 decode path shard over `model` ways? Heads and
    KV heads must divide (Megatron tiles), and every K split must land on
    whole 256-wide q4_k superblocks (o_proj splits K = heads*head_dim,
    down_proj splits K = intermediate)."""
    return (
        model >= 1
        and cfg.num_heads % model == 0
        and cfg.num_kv_heads % model == 0
        and (cfg.num_heads * cfg.head_dim) % (model * 256) == 0
        and cfg.intermediate_size % (model * 256) == 0
    )


def decoder_param_specs(cfg: TextDecoderConfig, params: Any | None = None) -> dict:
    layers = {}
    for name, spec in _DEC_LAYER_SPECS.items():
        if params is not None:
            layers[name] = _weight_spec(params["layers"][name], spec)
        else:
            layers[name] = spec
    head_spec = P("model", None)  # vocab-sharded logits
    if params is not None:
        head_spec = _weight_spec(params["lm_head"], head_spec)
    return {
        "embed": P(None, None),  # replicated: gathered on host & every step
        "layers": layers,
        "final_norm": P(),
        "lm_head": head_spec,
    }


def decoder_cache_specs(cfg: TextDecoderConfig, cache_dtype=None) -> dict:
    """Per-layer decode cache (models.decoder.init_cache layout: lists of
    [S, H_kv, hd]): shard the kv-head axis over `model`."""
    import jax.numpy as jnp

    specs = {
        "k": [P(None, "model", None)] * cfg.num_layers,
        "v": [P(None, "model", None)] * cfg.num_layers,
    }
    if cache_dtype == jnp.int8:
        specs["k_s"] = [P(None, "model")] * cfg.num_layers
        specs["v_s"] = [P(None, "model")] * cfg.num_layers
    return specs


def encoder_param_specs(cfg: AudioEncoderConfig) -> dict:
    return {
        "conv1_w": P(), "conv1_b": P(),
        "conv2_w": P(), "conv2_b": P(),
        "conv3_w": P(), "conv3_b": P(),
        "conv_out": P("model", None),
        "pos_embed": P(),
        "layers": {
            "ln1_w": P(), "ln1_b": P(),
            "q_w": P(None, "model", None), "q_b": P(None, "model"),
            "k_w": P(None, "model", None), "k_b": P(None, "model"),
            "v_w": P(None, "model", None), "v_b": P(None, "model"),
            "o_w": P(None, None, "model"), "o_b": P(),
            "ln2_w": P(), "ln2_b": P(),
            "fc1_w": P(None, "model", None), "fc1_b": P(None, "model"),
            "fc2_w": P(None, None, "model"), "fc2_b": P(),
        },
        "ln_post_w": P(), "ln_post_b": P(),
        "proj1_w": P("model", None), "proj1_b": P("model"),
        "proj2_w": P(None, "model"), "proj2_b": P(),
    }


def kv_cache_specs() -> dict:
    # [L, S, H_kv, hd]: shard the kv heads across `model`
    return {"k": P(None, None, "model", None), "v": P(None, None, "model", None)}


def named(mesh: Mesh, tree_specs):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        tree_specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params: Any, specs: Any) -> Any:
    shardings = named(mesh, specs)
    return jax.tree.map(jax.device_put, params, shardings)
