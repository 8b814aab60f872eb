"""Device-resident generation runtime.

Replaces the reference's per-token llama_decode ctypes loop
(asr.py:141-165) with jitted programs:

- `Generator.prefill` — one causal prefill over the (bucketed) prompt
  embedding sequence, sampling the first token on device;
- `Generator.decode_block` — K decode steps in one `lax.scan`, with
  on-device sampling and EOS latching, so the host syncs once per K tokens
  instead of once per token.

Buckets: prompt lengths are padded up to multiples of `bucket` so XLA
compiles a handful of shapes, not one per utterance (SURVEY.md §7
"variable-length audio vs XLA static shapes").

The KV cache is donated through both calls — it lives in HBM and is updated
in place across the whole chunk decode.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models import decoder as dec
from ..models.configs import TextDecoderConfig
from ..ops.sampling import sample_greedy, sample_topk_topp


@dataclasses.dataclass
class GenState:
    """Host-side handle on an in-flight generation."""

    cache: Any
    pos: int  # tokens already in cache
    last_token: jax.Array  # sampled but not yet fed
    key: jax.Array
    done: jax.Array  # bool scalar on device


def round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def prompt_bucket(t: int) -> int:
    """Prompt-length bucket: fine steps for short prompts, coarser for long
    ones, so an unbounded streaming session compiles O(log T) prefill
    shapes instead of one per 128 tokens (padded rows are masked, so the
    only cost is <=1 bucket step of wasted prefill compute)."""
    if t <= 1024:
        return round_up(max(t, 1), 128)
    if t <= 2048:
        return round_up(t, 256)
    return round_up(t, 512)


class Generator:
    def __init__(
        self,
        params: dict,
        cfg: TextDecoderConfig,
        *,
        n_ctx: int = 2048,
        eos_ids: tuple[int, ...] = (151645, 151643),
        cache_dtype=jnp.bfloat16,
        bucket: int = 128,
        block: int = 64,
        prefill_params: dict | None = None,
        dequant_prefill: bool = False,  # derive a dense bf16 prefill view
        #                                 of int4 weights on first prefill
        mesh=None,  # jax.sharding.Mesh: TP-shard weights/cache over "model"
    ):
        self.mesh = mesh
        self._tp_axis = None  # set for packed-int4 TP: decode runs shard_map
        if mesh is not None:
            # tensor-parallel inference (SURVEY.md §2.6: "pjit over ICI
            # replaces the queues"): weights shard Megatron-style over the
            # mesh's `model` axis, the KV cache shards by kv head, and XLA
            # SPMD inserts the psums at o_proj/down_proj/logits. The caller
            # passes UNFUSED layer weights (a fused qkv/gateup row split
            # would cross q/k/v section boundaries).
            #
            # PACKED int4 containers additionally flip the decode step to a
            # shard_map program (see _build_block): XLA SPMD cannot split a
            # pallas_call, so each shard runs the int4-stream kernel on its
            # local Megatron tile with explicit psums (VERDICT r3 #5 — the
            # headline precision no longer remaps to int8 under a mesh).
            from ..ops.pallas_q4k import Q4KMXUWeight
            from ..parallel.sharding import decoder_param_specs, shard_params

            if "qkv_proj" in params["layers"] or "gateup_proj" in params["layers"]:
                raise ValueError("sharded inference requires unfused layer weights")
            if any(
                isinstance(v, Q4KMXUWeight)
                for v in jax.tree.leaves(
                    params["layers"],
                    is_leaf=lambda x: isinstance(x, Q4KMXUWeight),
                )
            ) or isinstance(params.get("lm_head"), Q4KMXUWeight):
                self._tp_axis = "model"
                tp = int(mesh.shape["model"])
                head = params.get("lm_head")
                if isinstance(head, Q4KMXUWeight):
                    # the load-time head pad (1024 rows) need not divide
                    # evenly into BN-aligned shards; re-pad so every local
                    # vocab tile stays a whole kernel tile (zero rows
                    # dequantize to exactly 0; lm_logits slices them away)
                    from ..ops.pallas_q4k import BN, pad_rows

                    mult = 2 * BN * tp
                    if head.shape[0] % mult:
                        parts = pad_rows(
                            *(np.asarray(a) for a in
                              (head.packed, head.sub_t, head.min_t, head.dd_t)),
                            multiple=mult,
                        )
                        params = dict(params)
                        params["lm_head"] = Q4KMXUWeight(
                            *(jnp.asarray(a) for a in parts)
                        )
            params = shard_params(mesh, params, decoder_param_specs(cfg, params))
            prefill_params = None  # int4 prefill split is a single-chip path
        self.params = params
        # prefill may run through a different weight representation than the
        # decode matvecs: with int4 weights the per-call dense-dequant
        # materialization costs ~50-80 ms per prefill; a one-time bf16
        # dequant (see the `prefill_params` property) removes that while
        # decode keeps streaming 4-bit. Derived lazily at first prefill —
        # engine init stays load-and-go like the reference's mmap bring-up.
        self._prefill_params = prefill_params
        self._dequant_prefill = dequant_prefill and mesh is None
        import threading as _threading

        self._derive_lock = _threading.RLock()
        self.cfg = cfg
        self.n_ctx = n_ctx
        self.eos_ids = jnp.asarray(list(eos_ids), dtype=jnp.int32)
        self.cache_dtype = cache_dtype
        self.bucket = bucket
        self.block = block
        # unstacked per-layer weights for the UNROLLED decode step (a scan
        # over stacked weights copies every slice it feeds to a matmul —
        # decoder.unstack_layers). ~2x weight HBM, bought back in tok/s.
        # Derived lazily (`layers_list` property): the jit trace + dispatch
        # cost moves off engine init onto warmup.
        self._layers_list = None
        # fused int8 MLP matvec kernel for the decode step (one HBM stream
        # for Wg/Wu/Wd instead of three op-bounded matmuls). Measured OFF:
        # in the full 28-layer step the pallas_call is a scheduling barrier
        # and loses to XLA's overlapped matmuls (3.76 vs 3.25 ms/tok at
        # 1.7B, win=2048, v5e — tools/bench_block_ab.py --production).
        # Kept as an opt-in for future Mosaic revisions.
        import os as _os

        self.fused_mlp = (
            jax.default_backend() == "tpu"
            and _os.environ.get("QWEN3_FUSED_MLP", "0") != "0"
            and self._mlp_fusable()
        )
        # A/B knob (default off — measured neutral, 0.01156 vs 0.01145):
        # pass the STACKED layer arrays to the block program and unstack at
        # trace time (static leading-axis slices alias): ~16 arg buffers
        # instead of ~450 per dispatch. Arg marshaling turned out NOT to be
        # the residual per-block overhead.
        self._stacked_args = _os.environ.get("QWEN3_STACKED_ARGS", "0") != "0"
        # flash-style GQA decode-attention pallas kernel (ops/pallas_attn):
        # streams the KV window once at bandwidth and keeps score/softmax/PV
        # in VMEM. A/B knob while hardware numbers accumulate.
        self.pallas_attn = (
            jax.default_backend() == "tpu"
            and _os.environ.get("QWEN3_PALLAS_ATTN", "0") != "0"
        )
        self._prefill_jit = self._build_prefill()
        self._spliced_prefill_jit = self._build_spliced_prefill()
        self._spliced_prefill_at_jit = self._build_spliced_prefill_at()
        self._block_jit = self._build_block()
        self._rebase_jit = self._build_rebase()

    @property
    def prefill_params(self) -> dict:
        """Prefill-side weight view, derived on first use (int4 engines pass
        dequant_prefill=True and pay the dense bf16 dequant after init, not
        during it)."""
        with self._derive_lock:
            if self._prefill_params is None:
                if self._dequant_prefill:
                    from ..models.params import dequant_prefill_params

                    self._prefill_params = dequant_prefill_params(self.params)
                else:
                    self._prefill_params = self.params
            return self._prefill_params

    @property
    def layers_list(self) -> list:
        with self._derive_lock:
            if self._layers_list is None:
                ll = jax.jit(
                    lambda ls: dec.unstack_layers(ls, self.cfg.num_layers)
                )(self.params["layers"])
                if self.fused_mlp:
                    ll = jax.jit(dec.split_mlp_weights)(ll)
                self._layers_list = ll
            return self._layers_list

    def warm_derivations_async(self) -> None:
        """Materialize the lazy weight views on a worker thread, called by
        the engine right after init returns: the dispatches overlap the
        caller's own bring-up, and — unlike deriving at first decode — they
        run while no KV cache / activation buffers are live yet (deriving
        the ~3.7 GB of dense-prefill + unstacked views mid-request OOMed a
        16 GB chip)."""
        import threading

        from ..utils import bg

        # strong ref on self: the exit-join registry is weak, and a
        # quick-exiting caller must not tear down the interpreter under
        # this thread mid-dispatch
        self._derive_thread = threading.Thread(
            target=lambda: (self.prefill_params, self.layers_list),
            daemon=True,
            name="gen-derive",
        )
        self._derive_thread.start()
        bg.register(self._derive_thread)

    @property
    def _block_layers_arg(self):
        if self._stacked_args and not self.fused_mlp:
            return self.params["layers"]
        return self.layers_list

    def _mlp_fusable(self) -> bool:
        from ..ops.qtensor import Int8Weight

        # inspect the STACKED containers (leading axis = layer) so the check
        # does not force the lazy unstack
        layers = self.params["layers"]
        gu = layers.get("gateup_proj")
        if not isinstance(gu, Int8Weight):
            return False
        m, d = gu.q.shape[-2] // 2, gu.q.shape[-1]
        return m % 512 == 0 and d % 128 == 0 and isinstance(layers.get("down_proj"), Int8Weight)

    # -- jitted programs ---------------------------------------------------

    def _build_prefill(self) -> Callable:
        cfg = self.cfg

        @partial(jax.jit, static_argnames=("greedy",), donate_argnames=("cache",))
        def prefill(params, embd, length, cache, key, temperature, greedy: bool):
            hidden, cache = dec.forward_prefill(params, cfg, embd, cache, length=length)
            last_hidden = jax.lax.dynamic_index_in_dim(hidden, length - 1, axis=0, keepdims=False)
            logits = dec.lm_logits(params, last_hidden, cfg.lm_head_dim)
            if greedy:
                tok = sample_greedy(logits)
            else:
                key, sub = jax.random.split(key)
                tok = sample_topk_topp(logits, sub, temperature)
            return cache, tok.astype(jnp.int32), key

        return prefill

    def _build_spliced_prefill(self) -> Callable:
        """Prefill that assembles the prompt ON DEVICE from token ids plus a
        spliced audio-embedding stream — the host never touches embedding
        rows (device->host bandwidth is the scarce resource; also mirrors
        the official masked_scatter merge, modeling_qwen3_asr.py:1194-1203)."""
        cfg = self.cfg

        @partial(jax.jit, static_argnames=("greedy",), donate_argnames=("cache",))
        def prefill(params, ids, audio_mask, audio_embd, length, cache, key, temperature, greedy: bool):
            embd = dec.splice_prompt(params, ids, audio_mask, audio_embd)
            hidden, cache = dec.forward_prefill(params, cfg, embd, cache, length=length)
            last_hidden = jax.lax.dynamic_index_in_dim(hidden, length - 1, axis=0, keepdims=False)
            logits = dec.lm_logits(params, last_hidden, cfg.lm_head_dim)
            if greedy:
                tok = sample_greedy(logits)
            else:
                key, sub = jax.random.split(key)
                tok = sample_topk_topp(logits, sub, temperature)
            return cache, tok.astype(jnp.int32), key

        return prefill

    def _build_spliced_prefill_at(self) -> Callable:
        """Suffix prefill on top of a reused cache prefix (KV prefix reuse:
        the header + memory-audio KV from the previous chunk stay in the
        cache; only [current audio | suffix tokens] are prefilled)."""
        cfg = self.cfg

        @partial(
            jax.jit,
            static_argnames=("greedy", "prefix_window"),
            donate_argnames=("cache",),
        )
        def prefill(params, ids, audio_mask, audio_embd, start, length, cache, key,
                    temperature, greedy: bool, prefix_window: int):
            embd = dec.splice_prompt(params, ids, audio_mask, audio_embd)
            hidden, cache = dec.forward_prefill_at(
                params, cfg, embd, cache, start,
                prefix_window=prefix_window, length=length,
            )
            last_hidden = jax.lax.dynamic_index_in_dim(hidden, length - 1, axis=0, keepdims=False)
            logits = dec.lm_logits(params, last_hidden, cfg.lm_head_dim)
            if greedy:
                tok = sample_greedy(logits)
            else:
                key, sub = jax.random.split(key)
                tok = sample_topk_topp(logits, sub, temperature)
            return cache, tok.astype(jnp.int32), key

        return prefill

    def _build_rebase(self) -> Callable:
        cfg = self.cfg

        @partial(jax.jit, static_argnames=("block",), donate_argnames=("cache",))
        def rebase(cache, src, dst, block: int):
            return dec.shift_kv_block(cfg, cache, src, dst, block=block)

        return rebase

    def _build_tp_step(self, attn_window: int) -> Callable:
        """shard_map decode step for packed-int4 TP (see __init__ note):
        per-shard forward over local Megatron tiles with psums at o_proj/
        down_proj, local-vocab logits all_gathered back to replicated."""
        import dataclasses as _dc

        import functools as _ft

        try:
            from jax import shard_map

            # check_vma off: the pallas matvec calls inside don't annotate
            # varying-mesh-axes on their out shapes; replication of the
            # psum/all_gather outputs is by construction (and pinned
            # token-exact by test_parallel_infer / dryrun_multichip)
            shard_map = _ft.partial(shard_map, check_vma=False)
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

            shard_map = _ft.partial(shard_map, check_rep=False)
        from jax.sharding import PartitionSpec as P

        from ..parallel.sharding import decoder_cache_specs, decoder_param_specs

        cfg = self.cfg
        mesh = self.mesh
        tp = int(mesh.shape["model"])
        cfg_local = _dc.replace(
            cfg,
            num_heads=cfg.num_heads // tp,
            num_kv_heads=cfg.num_kv_heads // tp,
        )
        pspecs = decoder_param_specs(cfg, self.params)
        drop_lead = lambda s: P(*s[1:])  # stacked [L, ...] -> per-layer
        layer_specs = jax.tree.map(
            drop_lead, pspecs["layers"], is_leaf=lambda x: isinstance(x, P)
        )
        head_specs = {"final_norm": pspecs["final_norm"], "lm_head": pspecs["lm_head"]}
        cache_specs = decoder_cache_specs(cfg, self.cache_dtype)

        def step(head, layers_local, embd, cache, pos):
            hidden, cache = dec.forward_step_layers(
                layers_local, head["final_norm"], cfg_local, embd, cache, pos,
                attn_window=attn_window, tp_axis="model",
            )
            logits = dec.lm_logits(head, hidden)  # local vocab tile
            logits = jax.lax.all_gather(logits, "model", axis=0, tiled=True)
            return hidden, cache, logits

        return shard_map(
            step, mesh=mesh,
            in_specs=(
                head_specs,
                [layer_specs] * cfg.num_layers,
                P(),
                cache_specs,
                P(),
            ),
            out_specs=(P(), cache_specs, P()),
        )

    def _build_block(self) -> Callable:
        cfg = self.cfg
        eos = self.eos_ids
        block = self.block
        fused_mlp = self.fused_mlp
        pallas_attn = self.pallas_attn
        stacked_args = self._stacked_args and not self.fused_mlp
        tp_axis = self._tp_axis
        tp_steps: dict[int, Callable] = {}  # attn_window -> shard_map step

        @partial(jax.jit, static_argnames=("greedy", "attn_window"), donate_argnames=("cache",))
        def decode_block(params, layers_arg, cache, pos0, tok0, key, temperature, done0,
                         greedy: bool, attn_window: int):
            # trace-time unstack of stacked layer weights (leading-axis
            # slices alias; far fewer arg buffers to marshal per dispatch)
            layers_list = (
                dec.unstack_layers(layers_arg, cfg.num_layers)
                if stacked_args else layers_arg
            )
            # while_loop (not scan): the device exits as soon as EOS is
            # sampled, so a large block costs only the tokens it produces —
            # one host dispatch + one tiny fetch per block either way
            emitted0 = jnp.full((block,), -1, jnp.int32)

            def cond(carry):
                i, cache, pos, tok, key, done, aborted, emitted = carry
                return (i < block) & jnp.logical_not(done)

            def body(carry):
                i, cache, pos, tok, key, done, aborted, emitted = carry
                embd = dec.embed_tokens(params, tok)
                if tp_axis is not None:
                    if attn_window not in tp_steps:
                        tp_steps[attn_window] = self._build_tp_step(attn_window)
                    head = {"final_norm": params["final_norm"],
                            "lm_head": params["lm_head"]}
                    hidden, cache, logits = tp_steps[attn_window](
                        head, layers_list, embd, cache, pos
                    )
                    logits = logits[: cfg.lm_head_dim]
                else:
                    hidden, cache = dec.forward_step_layers(
                        layers_list, params["final_norm"], cfg, embd, cache, pos,
                        attn_window=attn_window, fused_mlp=fused_mlp,
                        pallas_attn=pallas_attn,
                    )
                    logits = dec.lm_logits(params, hidden, cfg.lm_head_dim)
                if greedy:
                    nxt = sample_greedy(logits).astype(jnp.int32)
                else:
                    key, sub = jax.random.split(key)
                    nxt = sample_topk_topp(logits, sub, temperature).astype(jnp.int32)
                emitted = emitted.at[i].set(tok)
                # on-device repetition latch (reference circuit breaker,
                # asr.py:157-161: <=3 distinct in the last 15): exits the
                # block after ~15 wasted tokens instead of the full block.
                # The host re-checks exactly over the whole stable stream;
                # this latch only sees the current block's emissions.
                if block > 15:
                    win = jax.lax.dynamic_slice(
                        emitted, (jnp.maximum(i - 14, 0),), (15,)
                    )
                    eq = win[:, None] == win[None, :]
                    first = jnp.sum(jnp.tril(eq, k=-1), axis=1) == 0
                    distinct = jnp.sum(jnp.where(win >= 0, first, False))
                    rep = (i >= 15) & (distinct <= 3)
                else:
                    rep = jnp.bool_(False)
                aborted = aborted | rep
                done = jnp.any(nxt == eos) | rep
                return (i + 1, cache, pos + 1, nxt, key, done, aborted, emitted)

            i, cache, pos, tok, key, done, aborted, emitted = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), cache, pos0, tok0, key, done0, jnp.bool_(False), emitted0),
            )
            # pack [emitted..., done, aborted] so the host fetches ONE tiny array
            packed = jnp.concatenate(
                [emitted, done.astype(jnp.int32)[None], aborted.astype(jnp.int32)[None]]
            )
            return cache, pos, tok, key, done, packed

        return decode_block

    # -- host API ----------------------------------------------------------

    def new_cache(self):
        # one jitted program allocates the whole 2L-array cache pytree —
        # eager init_cache would issue one host dispatch per layer array
        # (~2 ms each through the remote runtime)
        if not hasattr(self, "_new_cache_jit"):
            cfg, n_ctx, dt = self.cfg, self.n_ctx, self.cache_dtype
            out_shardings = None
            if self.mesh is not None:
                from ..parallel.sharding import decoder_cache_specs, named

                out_shardings = named(self.mesh, decoder_cache_specs(cfg, dt))
            self._new_cache_jit = jax.jit(
                lambda: dec.init_cache(cfg, n_ctx, dt), out_shardings=out_shardings
            )
        return self._new_cache_jit()

    def start(
        self,
        embd: np.ndarray,  # [T, D] prompt embeddings (f32)
        *,
        temperature: float = 0.4,
        seed: int | None = None,
        cache=None,
    ) -> GenState:
        """Prefill the prompt and sample the first token."""
        t = embd.shape[0]
        if t > self.n_ctx:
            raise ValueError(f"prompt of {t} tokens exceeds n_ctx={self.n_ctx}")
        padded_len = min(prompt_bucket(t), self.n_ctx)
        pad = padded_len - t
        if pad:
            embd = np.concatenate([embd, np.zeros((pad, embd.shape[1]), embd.dtype)], axis=0)
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        key = jax.random.key(seed)
        cache = cache if cache is not None else self.new_cache()
        greedy = temperature <= 0.0
        cache, tok, key = self._prefill_jit(
            self.prefill_params,
            jnp.asarray(embd),
            jnp.int32(t),
            cache,
            key,
            jnp.float32(max(temperature, 1e-6)),
            greedy,
        )
        # the prefill-sampled token may itself be EOS (reference checks EOS
        # before feeding, asr.py:142)
        done = jnp.any(tok == self.eos_ids)
        return GenState(cache=cache, pos=t, last_token=tok, key=key, done=done)

    def start_spliced(
        self,
        ids: np.ndarray,  # [T] int32 prompt ids (0 at audio slots)
        audio_mask: np.ndarray,  # [T] bool, True where audio embeddings go
        audio_embd: jax.Array,  # [Ta, D] device array (encoder output)
        *,
        length: int | None = None,  # valid prompt length (<= T)
        temperature: float = 0.4,
        seed: int | None = None,
        cache=None,
    ) -> GenState:
        """Device-side prompt assembly + prefill: the audio embeddings never
        leave the device (device->host is the scarce path on TPU pods and
        especially through remote runtimes)."""
        t = int(ids.shape[0]) if length is None else int(length)
        if t > self.n_ctx:
            raise ValueError(f"prompt of {t} tokens exceeds n_ctx={self.n_ctx}")
        padded_len = min(prompt_bucket(t), self.n_ctx)
        ids_p = np.zeros(padded_len, dtype=np.int32)
        mask_p = np.zeros(padded_len, dtype=bool)
        ids_p[: len(ids)] = ids[:padded_len]
        mask_p[: len(audio_mask)] = audio_mask[:padded_len]
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        key = jax.random.key(seed)
        cache = cache if cache is not None else self.new_cache()
        greedy = temperature <= 0.0
        cache, tok, key = self._spliced_prefill_jit(
            self.prefill_params,
            jnp.asarray(ids_p),
            jnp.asarray(mask_p),
            audio_embd,
            jnp.int32(t),
            cache,
            key,
            jnp.float32(max(temperature, 1e-6)),
            greedy,
        )
        done = jnp.any(tok == self.eos_ids)
        return GenState(cache=cache, pos=t, last_token=tok, key=key, done=done)

    def _build_spec_assemble(self) -> Callable:
        """Device-side suffix-prompt assembly for PIPELINED chunk dispatch:
        chunk i+1's prompt tail is chunk i's stable tokens, which live in the
        emitted-token buffer ON DEVICE — assembling there lets chunk i+1's
        prefill+decode dispatch before the host ever fetches chunk i's
        result (each device->host fetch costs a full link round trip)."""

        @partial(jax.jit, static_argnames=("n_audio", "n_template", "bucket", "rollback", "max_keep"))
        def assemble(template_ids, emitted, n_audio: int, n_template: int,
                     bucket: int, rollback: int, max_keep: int):
            # emitted: [block] int32, -1 padded, EOS excluded (decode_block's
            # packed[:-2]); stable tail drops the last `rollback` tokens
            n_emit = jnp.sum((emitted >= 0).astype(jnp.int32))
            n_keep = jnp.clip(n_emit - rollback, 0, max_keep)
            ids = jnp.zeros((bucket,), jnp.int32)
            ids = jax.lax.dynamic_update_slice(ids, template_ids, (n_audio,))
            # place emitted[0:n_keep] right after the template
            tail_pos = jnp.arange(emitted.shape[0], dtype=jnp.int32) + n_audio + n_template
            keep = jnp.arange(emitted.shape[0], dtype=jnp.int32) < n_keep
            ids = ids.at[jnp.where(keep, tail_pos, bucket)].set(
                jnp.where(keep, emitted, 0), mode="drop"
            )
            length = jnp.int32(n_audio + n_template) + n_keep
            return ids, length

        return assemble

    def start_spliced_at_spec(
        self,
        template_ids: np.ndarray,  # [n_t] int32 suffix tokens after the audio span
        emitted,  # [block] device int32 (-1 padded) from the previous chunk
        audio_embd: jax.Array,  # [Ta, D] current-chunk encoder output
        *,
        n_audio: int,  # valid audio tokens of this chunk
        start: int,  # cache prefix length (host int)
        cache,
        rollback: int,
        max_keep: int,
        temperature: float = 0.4,
        seed: int | None = None,
    ) -> GenState:
        """Speculative suffix prefill: prompt assembled on device from the
        previous chunk's emitted tokens (see _build_spec_assemble). The
        host later verifies its own token accounting matched; on a
        circuit-breaker abort the cache prefix [0:start) is still valid, so
        recovery is a plain `start_spliced_at` with the corrected suffix."""
        if not hasattr(self, "_spec_assemble_jit"):
            self._spec_assemble_jit = self._build_spec_assemble()
        n_t = len(template_ids)
        t_max = n_audio + n_t + max_keep
        if start + t_max > self.n_ctx:
            raise ValueError(f"speculative prompt may exceed n_ctx ({start + t_max})")
        padded_len = min(prompt_bucket(t_max), self.n_ctx - start)
        ids_dev, length = self._spec_assemble_jit(
            jnp.asarray(np.asarray(template_ids, dtype=np.int32)),
            emitted,
            n_audio, n_t, padded_len, rollback, max_keep,
        )
        mask_p = np.zeros(padded_len, dtype=bool)
        mask_p[:n_audio] = True
        prefix_window = min(round_up(max(start, 1), 64), self.n_ctx)
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        key = jax.random.key(seed)
        greedy = temperature <= 0.0
        cache, tok, key = self._spliced_prefill_at_jit(
            self.prefill_params,
            ids_dev,
            jnp.asarray(mask_p),
            audio_embd,
            jnp.int32(start),
            length,
            cache,
            key,
            jnp.float32(max(temperature, 1e-6)),
            greedy,
            prefix_window,
        )
        done = jnp.any(tok == self.eos_ids)
        return GenState(
            cache=cache, pos=jnp.int32(start) + length, last_token=tok,
            key=key, done=done,
        )

    def restart_at(self, cache, *, pos: int, last_token: int,
                   seed: int | None = None) -> GenState:
        """Re-seed generation from an existing cache at `pos` (the last
        prompt position): the next decode block re-processes that
        position's input token, reproducing the prefill's final logits,
        and re-samples at the caller's temperature/key.

        This makes a circuit-breaker retry (reference asr.py:193-209
        re-decodes the whole prompt) cost ZERO prefill work and — more
        important on this platform — ZERO extra compiled programs: the
        retry rides the already-warm decode-block program, where a
        dedicated 1-token suffix prefill would load a fresh
        (prompt-bucket x embd-shape x prefix-window) executable per chunk
        shape (observed: 0.5-0.9 s per streaming chunk whose breaker
        fired). Stale KV beyond `pos` from the failed attempt is masked
        by position until overwritten.

        NOTE the decode block EMITS its input token, so the first emitted
        entry after a restart is the prompt token fed back in — the caller
        must drop it (engine._decode does)."""
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        return GenState(
            cache=cache, pos=pos, last_token=jnp.int32(last_token),
            key=jax.random.key(seed), done=jnp.bool_(False),
        )

    def rebase_kv(self, cache, src: int, dst: int, block: int):
        """Move a KV block (e.g. last chunk's audio) to new positions with
        RoPE re-basing; returns the updated cache (donated)."""
        return self._rebase_jit(cache, jnp.int32(src), jnp.int32(dst), block)

    def start_spliced_at(
        self,
        ids: np.ndarray,  # [T] int32 suffix ids (0 at audio slots)
        audio_mask: np.ndarray,  # [T] bool
        audio_embd: jax.Array,  # [Ta, D] device array
        *,
        start: int,  # first position of this suffix (cache[0:start) reused)
        cache,  # existing cache holding the prefix KV
        length: int | None = None,
        temperature: float = 0.4,
        seed: int | None = None,
    ) -> GenState:
        """Suffix prefill with KV prefix reuse. The caller guarantees
        cache[0:start) holds valid KV for the prompt's first `start`
        positions (header + rebased memory audio)."""
        t = int(ids.shape[0]) if length is None else int(length)
        if start + t > self.n_ctx:
            raise ValueError(f"prompt of {start + t} tokens exceeds n_ctx={self.n_ctx}")
        padded_len = min(prompt_bucket(t), self.n_ctx - start)
        ids_p = np.zeros(padded_len, dtype=np.int32)
        mask_p = np.zeros(padded_len, dtype=bool)
        ids_p[: len(ids)] = ids[:padded_len]
        mask_p[: len(audio_mask)] = audio_mask[:padded_len]
        prefix_window = min(round_up(max(start, 1), 64), self.n_ctx)
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        key = jax.random.key(seed)
        greedy = temperature <= 0.0
        cache, tok, key = self._spliced_prefill_at_jit(
            self.prefill_params,
            jnp.asarray(ids_p),
            jnp.asarray(mask_p),
            audio_embd,
            jnp.int32(start),
            jnp.int32(t),
            cache,
            key,
            jnp.float32(max(temperature, 1e-6)),
            greedy,
            prefix_window,
        )
        done = jnp.any(tok == self.eos_ids)
        return GenState(cache=cache, pos=start + t, last_token=tok, key=key, done=done)

    def decode_block_dispatch(self, state: GenState, temperature: float = 0.4,
                              pos_bound: int | None = None):
        """Enqueue one K-step block WITHOUT waiting; returns
        (new_state, packed_device) — fetch `packed` later with
        `collect_block`. Lets the caller dispatch block n+1 while block n's
        tiny result array crosses the (high-latency) device->host link;
        post-EOS steps are latched no-ops on device, so speculative blocks
        are safe.

        `pos_bound`: host-side upper bound on state.pos, REQUIRED when pos
        is a device scalar (speculative pipelined dispatch) — it drives the
        static attention-window bucket and the context-full check without a
        blocking device sync."""
        greedy = temperature <= 0.0
        bound = pos_bound if pos_bound is not None else int(state.pos)
        if bound + self.block > self.n_ctx:
            return state, None  # context full
        # 256-slot window buckets: the attention read is ~25% of decode HBM
        # traffic, so tighter buckets pay for their extra compiled variants
        win = min(self.n_ctx, round_up(bound + self.block, 256))
        cache, pos, tok, key, done, packed = self._block_jit(
            self.params,
            self._block_layers_arg,
            state.cache,
            jnp.int32(state.pos),
            state.last_token,
            state.key,
            jnp.float32(max(temperature, 1e-6)),
            state.done,
            greedy,
            win,
        )
        new_state = GenState(
            cache=cache, pos=state.pos + self.block, last_token=tok, key=key, done=done
        )
        try:
            # start the device->host copy as soon as the block completes,
            # instead of paying the request leg of the link round trip when
            # the host finally blocks in collect_block (~40 ms measured)
            packed.copy_to_host_async()
        except AttributeError:
            pass
        return new_state, packed

    @staticmethod
    def collect_block(packed) -> tuple[list[int], bool, bool]:
        """(emitted_tokens, finished, rep_aborted) from a dispatched block's
        packed array — one device->host fetch."""
        from ..ops import pallas_q4k

        err = pallas_q4k.check_error()
        if err is not None:  # background bitcast self-check failed
            raise err
        if packed is None:
            return [], True, False
        arr = np.asarray(packed)
        return [int(t) for t in arr[:-2] if t >= 0], bool(arr[-2]), bool(arr[-1])

    def decode_block(self, state: GenState, temperature: float = 0.4) -> tuple[list[int], GenState, bool]:
        """Run up to `block` steps; returns (emitted_tokens, state, finished).

        `emitted_tokens` excludes EOS (mirrors reference asr.py:141-148:
        tokens are emitted after surviving the EOS check).
        """
        greedy = temperature <= 0.0
        if state.pos + self.block > self.n_ctx:
            return [], state, True  # context full
        # bucket the attention window to the live prefix (multiples of 256):
        # scanning all n_ctx cache slots per token costs ~235 MB of HBM reads
        # at 1.7B; a 1100-token prompt only needs the 1280 bucket. Static arg
        # -> at most n_ctx/256 compiled variants.
        win = min(self.n_ctx, round_up(state.pos + self.block, 256))
        cache, pos, tok, key, done, packed = self._block_jit(
            self.params,
            self._block_layers_arg,
            state.cache,
            jnp.int32(state.pos),
            state.last_token,
            state.key,
            jnp.float32(max(temperature, 1e-6)),
            state.done,
            greedy,
            win,
        )
        packed = np.asarray(packed)  # ONE device->host fetch per block
        toks = [int(t) for t in packed[:-2] if t >= 0]
        finished = bool(packed[-2])
        new_state = GenState(
            cache=cache, pos=state.pos + self.block, last_token=tok, key=key, done=done
        )
        return toks, new_state, finished


class SparseLogitsRunner:
    """Single-prefill sparse-logits readout for the forced aligner.

    One causal prefill; logits are computed only at the requested positions
    (reference aligner.py:307-323: batch.logits[ts_pos]=1 then
    get_logits_ith + argmax over the timestamp classes).
    """

    def __init__(self, params: dict, cfg: TextDecoderConfig, *, n_ctx: int = 2048,
                 cache_dtype=jnp.bfloat16, bucket: int = 128):
        self.params = params
        self.cfg = cfg
        self.n_ctx = n_ctx
        self.cache_dtype = cache_dtype
        self.bucket = bucket

        @jax.jit
        def run(params, embd, length, positions):
            hidden, _ = dec.forward_prefill(params, cfg, embd, None, length=length)
            sel = jnp.take(hidden, positions, axis=0)  # [n_positions, D]
            return dec.lm_logits(params, sel, cfg.lm_head_dim)

        @partial(jax.jit, static_argnames=("limit",))
        def run_argmax(params, ids, audio_mask, audio_embd, length, positions, limit: int):
            embd = dec.splice_prompt(params, ids, audio_mask, audio_embd)
            hidden, _ = dec.forward_prefill(params, cfg, embd, None, length=length)
            sel = jnp.take(hidden, positions, axis=0)
            logits = dec.lm_logits(params, sel, cfg.lm_head_dim)
            return jnp.argmax(logits[:, :limit], axis=-1).astype(jnp.int32)

        @partial(
            jax.jit,
            static_argnames=("limit", "n_slots", "total", "n_pos",
                             "tok_start", "tok_end", "tok_ts"),
        )
        def run_argmax_spec(
            params, toks, cls_tab, audio_embd, n_audio, drop,
            limit: int, n_slots: int, total: int, n_pos: int,
            tok_start: int, tok_end: int, tok_ts: int,
        ):
            """Speculative align prompt assembled ON DEVICE from a decode
            block's emitted-token buffer (`toks`, -1 padded): tokens whose
            word-class (`cls_tab`, int8[vocab]: 2=single-CJK-char word,
            1=droppable punctuation/whitespace, 0=needs the host path) is 2
            become one `word TS TS` triplet each — the exact per-character
            prompt `align()` builds for CJK text (reference aligner.py:281-
            300), dispatched before the block's result reaches the host so
            the final chunk's alignment overlaps the device->host round
            trip instead of tailing it. The host validates exactness after
            the fetch and falls back to the synchronous path on mismatch.

            `drop` (traced int32) excludes the last N valid tokens from the
            prompt — non-last chunks align their rollback-trimmed stable
            text, so the device prompt must mirror the host's trim."""
            valid = toks >= 0
            n_valid = jnp.sum(valid.astype(jnp.int32))
            used = valid & (jnp.arange(toks.shape[0]) < n_valid - drop)
            cls = jnp.where(used, cls_tab[jnp.clip(toks, 0)].astype(jnp.int32), 1)
            keep = cls == 2
            kidx = jnp.cumsum(keep) - 1  # word slot for each kept token
            n_words = jnp.sum(keep.astype(jnp.int32))
            prefix = n_audio + 2  # AUDIO_START + audio rows + AUDIO_END
            ids = jnp.zeros((total,), jnp.int32)
            ids = ids.at[0].set(tok_start)
            ids = ids.at[1 + n_audio].set(tok_end)
            j = jnp.arange(n_slots)
            live = j < n_words
            slot = prefix + 3 * j
            ids = ids.at[jnp.where(live, slot + 1, total)].set(tok_ts, mode="drop")
            ids = ids.at[jnp.where(live, slot + 2, total)].set(tok_ts, mode="drop")
            ids = ids.at[jnp.where(keep, prefix + 3 * kidx, total)].set(toks, mode="drop")
            pos_t = jnp.arange(total)
            mask = (pos_t >= 1) & (pos_t < 1 + n_audio)
            embd = dec.splice_prompt(params, ids, mask, audio_embd)
            length = prefix + 3 * n_words
            hidden, _ = dec.forward_prefill(params, cfg, embd, None, length=length)
            k = jnp.arange(n_pos)
            pos = prefix + 3 * (k // 2) + 1 + (k % 2)
            pos = jnp.where(k < 2 * n_words, pos, 0)
            sel = jnp.take(hidden, pos, axis=0)
            logits = dec.lm_logits(params, sel, cfg.lm_head_dim)
            out = jnp.argmax(logits[:, :limit], axis=-1).astype(jnp.int32)
            return jnp.concatenate([out, n_words[None]])

        self._run = run
        self._run_argmax = run_argmax
        self._run_argmax_spec = run_argmax_spec

    def argmax_at_spec(
        self,
        toks: jax.Array,  # device int32[block] emitted tokens, -1 padded
        cls_tab: jax.Array,  # device int8[vocab] word-class table
        audio_embd: jax.Array,  # bucket-shaped [A, D] window embedding
        n_audio: int,
        limit: int,
        special: tuple[int, int, int],  # (AUDIO_START, AUDIO_END, TIMESTAMP)
        drop_last: int = 0,  # rollback trim for non-last chunks
    ):
        """Dispatch the speculative align prefill; returns the device array
        `[ts[0..n_pos), n_words]` (fetch later). None if the worst-case
        prompt would not fit n_ctx."""
        n_slots = int(toks.shape[0])
        total = self._prompt_pad(n_audio + 2 + 3 * n_slots)
        if n_audio + 2 + 3 * n_slots > self.n_ctx:
            return None
        n_pos = round_up(max(2 * n_slots, 1), 256)
        out = self._run_argmax_spec(
            self.params, toks, cls_tab, audio_embd, jnp.int32(n_audio),
            jnp.int32(drop_last),
            limit, n_slots, total, n_pos, special[0], special[1], special[2],
        )
        try:
            out.copy_to_host_async()
        except AttributeError:
            pass
        return out

    def _pad_positions(self, positions: np.ndarray) -> np.ndarray:
        # coarse 256-slot buckets: align prompts vary with every sampled
        # transcript, and each new (prompt, positions) shape pair is a fresh
        # remote compile (2-8 s) landing mid-pipeline — coarse buckets
        # collapse the variant space to a handful that warm up immediately
        n_pos = round_up(max(len(positions), 1), 256)
        pos_padded = np.zeros(n_pos, dtype=np.int32)
        pos_padded[: len(positions)] = positions
        return pos_padded

    def _prompt_pad(self, t: int) -> int:
        return min(round_up(max(prompt_bucket(t), 1), 256), self.n_ctx)

    def logits_at(self, embd: np.ndarray, positions: np.ndarray) -> np.ndarray:
        t = embd.shape[0]
        padded_len = self._prompt_pad(t)
        pad = padded_len - t
        if pad:
            embd = np.concatenate([embd, np.zeros((pad, embd.shape[1]), embd.dtype)], axis=0)
        pos_padded = self._pad_positions(positions)
        out = self._run(self.params, jnp.asarray(embd), jnp.int32(t), jnp.asarray(pos_padded))
        return np.asarray(out)[: len(positions)]

    def argmax_at(
        self,
        ids: np.ndarray,
        audio_mask: np.ndarray,
        audio_embd: jax.Array,
        positions: np.ndarray,
        limit: int,
    ) -> np.ndarray:
        """Device-side prompt splice + prefill + restricted argmax; only the
        class indices cross back to the host (the reference reads full
        logits per position, aligner.py:317-323 — on TPU that transfer is
        the bottleneck, the argmax is free)."""
        t = len(ids)
        padded_len = self._prompt_pad(t)
        ids_p = np.zeros(padded_len, dtype=np.int32)
        ids_p[:t] = ids
        mask_p = np.zeros(padded_len, dtype=bool)
        mask_p[:t] = audio_mask
        pos_padded = self._pad_positions(positions)
        out = self._run_argmax(
            self.params, jnp.asarray(ids_p), jnp.asarray(mask_p), audio_embd,
            jnp.int32(t), jnp.asarray(pos_padded), limit,
        )
        try:
            out.copy_to_host_async()  # overlap the transfer with completion
        except AttributeError:
            pass
        return np.asarray(out)[: len(positions)]
