"""Sharded training / fine-tuning step.

The reference is inference-only; this module adds the one capability a
production ASR stack needs beyond it — fine-tuning the thinker on
(audio, transcript) pairs — and doubles as the multichip validation path:
a full train step (audio encoder -> decoder -> cross-entropy -> AdamW)
jitted over a data x model mesh with the sharding rules from
`parallel.sharding` (TP on heads/MLP columns, DP on batch, sequence-dim
sharding constraints on the long activations).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import decoder as dec
from ..models import encoder as enc
from ..models.configs import ThinkerConfig
from . import sharding as S


class TrainState(NamedTuple):
    params: Any  # {"encoder": ..., "decoder": ...}
    opt_state: Any
    step: jax.Array


def thinker_param_specs(cfg: ThinkerConfig) -> dict:
    return {
        "encoder": S.encoder_param_specs(cfg.audio),
        "decoder": S.decoder_param_specs(cfg.text),
    }


def _forward_loss(params, cfg: ThinkerConfig, batch):
    """batch: mel [B, n_mels, Tmel], tokens [B, T], loss_mask [B, T],
    audio_mask [B, T] (True where the audio embedding stream is spliced)."""
    mel = batch["mel"]
    tokens = batch["tokens"]

    def encode_one(m):
        hidden = enc.conv_frontend(params["encoder"], cfg.audio, m)
        return enc.backend_transformer(params["encoder"], cfg.audio, hidden)

    audio_embd = jax.vmap(encode_one)(mel)  # [B, Ta, D]
    audio_embd = jax.lax.with_sharding_constraint(
        audio_embd, P("data", None, None)
    )

    text_embd = jnp.take(params["decoder"]["embed"], tokens, axis=0)  # [B, T, D]
    # splice audio embeddings over the <|audio_pad|> span
    # (reference masked_scatter on audio_token_id, modeling_qwen3_asr.py:1194-1203)
    b, ta, d = audio_embd.shape
    positions = jnp.cumsum(batch["audio_mask"].astype(jnp.int32), axis=-1) - 1
    gathered = jnp.take_along_axis(
        audio_embd, jnp.clip(positions, 0, ta - 1)[..., None], axis=1
    )
    embd = jnp.where(batch["audio_mask"][..., None], gathered, text_embd)
    embd = jax.lax.with_sharding_constraint(embd, P("data", None, None))

    def decode_one(e):
        hidden, _ = dec.forward_prefill(params["decoder"], cfg.text, e, None)
        return hidden

    hidden = jax.vmap(decode_one)(embd)  # [B, T, D]
    logits = dec.lm_logits(params["decoder"], hidden)  # [B, T, V]

    targets = jnp.roll(tokens, -1, axis=-1)
    # the roll wraps the last position's target around to tokens[0] — never
    # train on it, regardless of the caller-supplied loss_mask
    t_len = tokens.shape[-1]
    mask = batch["loss_mask"].astype(jnp.float32) * (
        jnp.arange(t_len) < t_len - 1
    ).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def make_train_step(
    cfg: ThinkerConfig,
    mesh: Mesh,
    *,
    learning_rate: float = 1e-4,
    weight_decay: float = 0.01,
):
    """Returns (init_fn, step_fn); both jitted over `mesh`."""
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    pspecs = thinker_param_specs(cfg)
    param_sh = S.named(mesh, pspecs)
    batch_sh = {
        "mel": NamedSharding(mesh, P("data", None, None)),
        "tokens": NamedSharding(mesh, P("data", None)),
        "loss_mask": NamedSharding(mesh, P("data", None)),
        "audio_mask": NamedSharding(mesh, P("data", None)),
    }

    def init_fn(key) -> TrainState:
        k_enc, k_dec = jax.random.split(key)
        params = {
            "encoder": enc.init_params(cfg.audio, k_enc),
            "decoder": dec.init_params(cfg.text, k_dec),
        }
        params = jax.tree.map(jax.device_put, params, param_sh)
        opt_state = tx.init(params)
        return TrainState(params=params, opt_state=opt_state, step=jnp.int32(0))

    @partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, batch) -> tuple[TrainState, jax.Array]:
        batch = jax.tree.map(
            lambda x, sh: jax.lax.with_sharding_constraint(x, sh), batch, batch_sh
        )
        loss, grads = jax.value_and_grad(_forward_loss)(state.params, cfg, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss

    return init_fn, step_fn


# --------------------------------------------------------------------------
# checkpoint / resume (orbax)
# --------------------------------------------------------------------------


def save_checkpoint(path: str, state: TrainState) -> None:
    """Persist a (sharded) train state; restorable across restarts."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(path, state, force=True)


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the template's shardings/shapes (template = init_fn(key))."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckpt:
        return ckpt.restore(path, template)
