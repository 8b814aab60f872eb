"""Continuous batching: per-request admission into free rows of a
persistent batched decode loop.

The round-1 MicroBatcher coalesced same-temperature requests into fixed
windows (all rows start and finish together — late arrivals wait a full
generation). Here a worker thread keeps ONE batched decode program running
and admits each request into any free KV-cache row as soon as one exists
(vLLM-style continuous batching — the upstream stack's concurrency model,
BASELINE.md 128-stream rows), with per-row temperature/greedy sampling.

Device programs:
  - `_prefill_stage`: batched (cohort) spliced prefill into STAGING buffers
    — dispatched from a dedicated admission thread so the decode worker
    never stalls on admission host work (prompt building, padding, encode
    dispatch) — one compile per (cohort, prompt-length) bucket;
  - `_scatter_cohort`: staged KV lanes scatter into free live rows between
    decode blocks (donated live caches; ~0.5 ms of HBM writes);
  - `_decode_block`: K vmapped steps over all B rows with per-row
    position/temperature/EOS latch; ONE small host fetch per block.

The round-3 design ran admission inline on the worker loop: cohort host
work + encode + prefill stalled every active row (~25 ms/request, the
measured serving ceiling — VERDICT r3 missing #2). Here admission overlaps
decode: the worker's only admission cost is the scatter.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..schema import TranscribeResult
from ..models import decoder as dec
from ..ops.sampling import sample_greedy, sample_topk_topp
from .generate import round_up

SAMPLE_RATE = 16_000


@dataclass
class _Request:
    audio: np.ndarray
    context: str
    language: Optional[str]
    temperature: float
    timestamps: bool = False  # run forced alignment after transcription
    rollback: int = 5  # engine rollback_num (non-final chunk trim)
    done_evt: threading.Event = field(default_factory=threading.Event)
    result: Optional[TranscribeResult] = None
    error: Optional[Exception] = None
    submitted_at: float = field(default_factory=time.time)
    # long-audio chunk state (engine chunk loop semantics, asr.py:269-404):
    # each chunk runs as its own row session; memory carries the previous
    # chunk's encoder feature + stable tokens into the next chunk's prompt
    chunk_idx: int = 0
    n_chunks: int = 1
    chunk_texts: List[str] = field(default_factory=list)
    # auto language mode (language=None): chunk 0 runs the detection
    # protocol prompt (no forced <asr_text>); the parsed language carries
    # into later chunk prompts and the aligner (engine `detecting`
    # semantics, qwen3_asr.py:454-465)
    detected_lang: Optional[str] = None
    mem_feature: Optional[object] = None  # [a_full, D] device array
    mem_tokens: List[int] = field(default_factory=list)
    cur_feature: Optional[object] = None  # this chunk's feature (next memory)


@dataclass
class _Row:
    req: Optional[_Request] = None
    tokens: List[int] = field(default_factory=list)
    pos: int = 0
    started_at: float = 0.0


@dataclass
class _Cohort:
    """A staged admission: device futures from `_prefill_stage` plus the
    host metadata needed to scatter lanes into live rows as they free."""

    staged: object  # cache pytree, leaves [P, t_pad, ...]
    toks: object  # [P] device
    keys: object  # [P] device
    reqs: List[_Request]  # p_real <= P entries
    lens: List[int]
    t_pad: int
    next_lane: int = 0


class ContinuousBatcher:
    PREFILL_COHORT = 4  # compat alias: default mid cohort size
    # compiled staging-prefill widths: 16-wide halves the per-cohort host
    # cost (dispatches + prompt builds amortize) — at 128-burst the
    # admission thread's host time, not the device, is the throughput wall
    # staged-admission widths. 16 is the measured knee: 32-wide cohorts
    # (fewer programs, bigger matmul M) measured WORSE on the serving
    # benchmark (574 vs 818 s-audio/s median at 128x10 s) — the wider
    # encode dispatch doubles the admission thread's host time and the
    # wider prefill program gains nothing the 1-deep staging overlap had
    # not already hidden
    COHORT_SIZES = (1, 4, 8, 16)

    def __init__(self, engine, *, max_batch: int = 8, block: int = 16,
                 max_new_tokens: Optional[int] = None):
        self.engine = engine
        self.cfg = engine.dec_cfg
        # compiled staging widths, capped by the row count (a cohort wider
        # than the batch would stage KV that can never scatter at once)
        self.cohort_sizes = tuple(p for p in self.COHORT_SIZES if p <= max_batch) or (1,)
        # int4 engines expose bf16 prefill_params — batched prefills can't
        # ride the single-stream int4 matvec kernel, and the dense fallback
        # would re-dequantize the packed containers per call
        self.params = engine.generator.prefill_params
        self.n_ctx = engine.config.n_ctx
        self.b = max_batch
        self.block = block
        self.max_new_tokens = max_new_tokens or engine.config.max_new_tokens
        self.eos_ids = jnp.asarray(list(engine.thinker.eos_token_ids), dtype=jnp.int32)
        self.chunk_samples = int(engine.config.chunk_size * SAMPLE_RATE)
        from ..ops.pallas_q4k import Q4KMXUWeight

        gen_params = engine.generator.params
        self._int4_rows = any(
            isinstance(v, Q4KMXUWeight) for v in gen_params["layers"].values()
        )
        if self.params is gen_params or self._int4_rows:
            # int4 engines: batched DECODE streams the packed 4-bit weights
            # through the multi-row kernel (forward_step_rows) — serving
            # keeps the headline precision instead of remapping to dense
            # (VERDICT r2 #6); prefill/admission stays on the bf16 prefill
            # weights (MXU-compute-bound)
            self.dec_params = gen_params
            self.layers_list = engine.generator.layers_list  # pre-unstacked
        else:
            self.dec_params = self.params
            self.layers_list = jax.jit(
                lambda ls: dec.unstack_layers(ls, self.cfg.num_layers)
            )(self.params["layers"])

        # KV dtype follows the engine's generator: an f32 engine must serve
        # with f32 KV — a hardcoded bf16 cache perturbed logits ~0.4%
        # relative, enough to flip near-margin greedy tokens vs the
        # single-stream path (the exact-equality test contract)
        self.kv_dtype = engine.generator.cache_dtype
        # tensor-parallel serving (VERDICT r4 ask #6): when the engine runs
        # over a mesh, the batched rows decode body runs under shard_map on
        # the same Megatron tiles (psums at o_proj/down_proj, vocab
        # all_gather — decoder.forward_step_rows tp_axis) and the live/
        # staged KV rows shard on kv heads. Admission prefill rides XLA
        # SPMD over the already-sharded params.
        self.mesh = engine.generator.mesh
        self._tp = (
            int(dict(self.mesh.shape).get("model", 1))
            if self.mesh is not None else 1
        )
        self._build_programs()

        # device state
        caches_init = jax.vmap(
            lambda _: dec.init_cache(self.cfg, self.n_ctx, self.kv_dtype)
        )
        if self.mesh is not None:
            from ..parallel.sharding import named

            caches_init = jax.jit(
                caches_init, out_shardings=named(self.mesh, self._batched_cache_specs())
            )
        else:
            caches_init = jax.jit(caches_init)
        self.caches = caches_init(jnp.arange(self.b))
        self.toks = jnp.zeros((self.b,), jnp.int32)
        self.keys = jax.vmap(jax.random.key)(np.arange(self.b, dtype=np.uint32))
        # host mirrors
        self.rows = [_Row() for _ in range(self.b)]
        self.poss = np.zeros(self.b, np.int32)
        self.temps = np.full(self.b, 1e-6, np.float32)
        self.greedy = np.ones(self.b, bool)
        self.dones = np.ones(self.b, bool)  # free rows stay "done"
        self.dones_dev = jnp.ones(self.b, bool)  # device-chained EOS latches
        self.row_gen = np.zeros(self.b, np.int64)  # bumped at every retire

        # 1-deep block pipelining (dispatch block n+1 before fetching
        # block n): hides the ~30-50 ms device->host result round trip per
        # block on the TPU tunnel. QWEN3_CB_PIPELINE=0 forces the
        # fetch-synchronous loop (diagnosis only).
        import os as _os

        self.pipeline = _os.environ.get("QWEN3_CB_PIPELINE") not in ("0", "")
        # fill-gate hard cap (seconds); the gate normally exits 0.15 s
        # after cohorts stop landing — see _loop
        self._fill_gate_s = float(_os.environ.get("QWEN3_CB_FILL_MS", "1000")) / 1e3

        self._pending: List[_Request] = []
        self._ready: List[_Cohort] = []
        self._n_staging = 0  # cohorts mid-staging on the admission thread
        self._align_pool = None  # lazy 1-thread pool for timestamped requests
        self._lock = threading.Lock()
        self._work = threading.Event()   # decode worker wake
        self._admit_work = threading.Event()  # admission thread wake
        # backpressure: at most 2 staged-but-unscattered cohorts in flight
        # (bounds staging HBM to ~2 cohorts of KV; admission throughput is
        # already far ahead of decode at that depth)
        self._stage_slots = threading.Semaphore(2)
        self._stop = False
        self.n_admitted = 0
        self.n_completed = 0
        self._t_admit = 0.0   # admission-thread host+dispatch time
        self._t_admit_enc = 0.0     # ... encode-dispatch share
        self._t_admit_prefill = 0.0  # ... prefill-dispatch share
        self._t_scatter = 0.0  # worker host time scattering staged cohorts
        self._t_dispatch = 0.0  # host time dispatching decode blocks
        self._t_fetch = 0.0   # host time blocked on packed fetches
        self._n_blocks = 0
        self._n_cohorts = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self._admit_thread = threading.Thread(target=self._admit_loop, daemon=True)
        self._admit_thread.start()

    # -- device programs -----------------------------------------------------

    def _batched_cache_specs(self) -> dict:
        """Row-batched KV specs: decoder_cache_specs with a leading batch
        axis ([B, S, H_kv, hd], kv heads sharded over `model`)."""
        from jax.sharding import PartitionSpec as P

        from ..parallel.sharding import decoder_cache_specs

        return jax.tree.map(
            lambda s: P(None, *s),
            decoder_cache_specs(self.cfg, self.kv_dtype),
            is_leaf=lambda x: isinstance(x, P),
        )

    def _build_tp_block_body(self, attn_window: int):
        """shard_map rows-decode body for tensor-parallel serving: each
        shard scans `block` steps of forward_step_rows over its local
        Megatron tiles + kv-head cache shard; psums at o_proj/down_proj,
        local-vocab logits all_gathered before (replicated) sampling.
        Mirrors generate.Generator._build_tp_step for the batched rows."""
        import dataclasses as _dc
        import functools as _ft

        try:
            from jax import shard_map

            # check_vma off: replication of psum/all_gather outputs is by
            # construction (pinned by test_continuous_tp / dryrun_multichip)
            shard_map = _ft.partial(shard_map, check_vma=False)
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

            shard_map = _ft.partial(shard_map, check_rep=False)
        from jax.sharding import PartitionSpec as P

        from ..parallel.sharding import decoder_param_specs

        cfg = self.cfg
        eos = self.eos_ids
        block_n = self.block
        tp = self._tp
        cfg_local = _dc.replace(
            cfg,
            num_heads=cfg.num_heads // tp,
            num_kv_heads=cfg.num_kv_heads // tp,
        )
        pspecs = decoder_param_specs(cfg, self.dec_params)
        drop_lead = lambda s: P(*s[1:])  # stacked [L, ...] -> per-layer
        layer_specs = jax.tree.map(
            drop_lead, pspecs["layers"], is_leaf=lambda x: isinstance(x, P)
        )
        head_specs = {
            "embed": pspecs["embed"],
            "final_norm": pspecs["final_norm"],
            "lm_head": pspecs["lm_head"],
        }
        cache_specs = self._batched_cache_specs()

        def body(head, layers_local, caches, poss, toks, keys, dones,
                 temps, greedys):
            def sample_row(lg, k, tmp, g, d, t0):
                k, sub = jax.random.split(k)
                nxt = jnp.where(
                    g,
                    sample_greedy(lg).astype(jnp.int32),
                    sample_topk_topp(lg, sub, tmp).astype(jnp.int32),
                )
                emitted = jnp.where(d, -1, t0)
                nxt_done = d | jnp.any(nxt == eos)
                return jnp.where(d, t0, nxt), k, nxt_done, emitted

            def scan_body(carry, _):
                caches, poss, toks, keys, dones = carry
                embd = dec.embed_tokens(head, toks)
                hidden, caches = dec.forward_step_rows(
                    layers_local, head["final_norm"], cfg_local, embd,
                    caches, poss, attn_window=attn_window, tp_axis="model",
                )
                from ..ops.qtensor import matmul

                logits = matmul(hidden, head["lm_head"])  # local vocab tile
                logits = jax.lax.all_gather(
                    logits, "model", axis=1, tiled=True
                ).astype(jnp.float32)[:, : cfg.lm_head_dim]
                toks, keys, dones, emitted = jax.vmap(sample_row)(
                    logits, keys, temps, greedys, dones, toks
                )
                return (caches, poss + 1, toks, keys, dones), emitted

            (caches, poss, toks, keys, dones), emitted = jax.lax.scan(
                scan_body, (caches, poss, toks, keys, dones), None,
                length=block_n,
            )
            packed = jnp.concatenate(
                [emitted.T, dones.astype(jnp.int32)[:, None]], axis=1
            )
            return caches, toks, keys, dones, packed

        rep = P()
        return shard_map(
            body, mesh=self.mesh,
            in_specs=(head_specs, [layer_specs] * cfg.num_layers, cache_specs,
                      rep, rep, rep, rep, rep, rep),
            out_specs=(cache_specs, rep, rep, rep, rep),
        )

    def _build_programs(self) -> None:
        cfg = self.cfg
        eos = self.eos_ids
        block_n = self.block
        kv_dtype = self.kv_dtype

        def step_one(params, layers_list, cache, pos, tok, key, done, temp, greedy, attn_window):
            embd = dec.embed_tokens(params, tok)
            hidden, cache = dec.forward_step_layers(
                layers_list, params["final_norm"], cfg, embd, cache, pos,
                attn_window=attn_window,
            )
            logits = dec.lm_logits(params, hidden, cfg.lm_head_dim)
            key, sub = jax.random.split(key)
            nxt = jnp.where(
                greedy,
                sample_greedy(logits).astype(jnp.int32),
                sample_topk_topp(logits, sub, temp).astype(jnp.int32),
            )
            emitted = jnp.where(done, -1, tok)
            nxt_done = done | jnp.any(nxt == eos)
            nxt = jnp.where(done, tok, nxt)
            return cache, pos + 1, nxt, key, nxt_done, emitted

        # rows path for every weight precision AND every KV dtype:
        # activations stay [B, K] so weights stream/matmul ONCE per step.
        # The vmapped twin batches the per-row dynamic cache updates into
        # scatters and re-materializes the cache layout per step — measured
        # 14 ms/step at batch 32 (int8, v5e-1) and 40 ms/step at batch 64,
        # vs the rows path's ~7 ms. int8 KV rides the rows body since r5
        # (forward_step_rows threads the per-slot scales; the KV window is
        # ~2x the weight bytes at batch 64, so int8 KV halves the dominant
        # HBM term — r4's "int8 KV loses" measurement was the vmap body).
        # The vmap body remains as a diagnosis path via QWEN3_CB_VMAP_STEP=1.
        use_rows = not os.environ.get("QWEN3_CB_VMAP_STEP")
        tp = self._tp
        if tp > 1 and not use_rows:
            raise ValueError(
                "tensor-parallel serving requires the rows decode body "
                "(unset QWEN3_CB_VMAP_STEP)"
            )
        tp_bodies: dict[int, object] = {}  # attn_window -> shard_map body

        @partial(jax.jit, static_argnames=("attn_window",), donate_argnames=("caches",))
        def decode_block(params, layers_list, caches, poss, toks, keys, dones,
                         host_dones, temps, greedys, attn_window: int):
            if tp > 1:
                # TP rows body: head+layer tiles via shard_map (the packed
                # int4 kernel cannot be split by SPMD; explicit psums keep
                # int8 on the identical path), EOS latch fold outside
                if attn_window not in tp_bodies:
                    tp_bodies[attn_window] = self._build_tp_block_body(attn_window)
                head = {"embed": params["embed"],
                        "final_norm": params["final_norm"],
                        "lm_head": params["lm_head"]}
                return tp_bodies[attn_window](
                    head, layers_list, caches, poss, toks, keys,
                    dones | host_dones, temps, greedys,
                )
            # dones: device-chained EOS latches (exact even when the host's
            # view is one block stale under the pipeline); host_dones:
            # host-side retirements (budget/context exhaustion) the device
            # latch can't know about
            dones = dones | host_dones
            def sample_row(lg, k, tmp, g, d, t0):
                k, sub = jax.random.split(k)
                nxt = jnp.where(
                    g,
                    sample_greedy(lg).astype(jnp.int32),
                    sample_topk_topp(lg, sub, tmp).astype(jnp.int32),
                )
                emitted = jnp.where(d, -1, t0)
                nxt_done = d | jnp.any(nxt == eos)
                return jnp.where(d, t0, nxt), k, nxt_done, emitted

            def scan_body_rows(carry, _):
                # matmuls run on [B, K] activations: quantized weights
                # stream ONCE per step (multi-row int4 kernel / one MXU
                # matmul) instead of once per row under vmap
                caches, poss, toks, keys, dones = carry
                embd = dec.embed_tokens(params, toks)
                hidden, caches = dec.forward_step_rows(
                    layers_list, params["final_norm"], cfg, embd, caches, poss,
                    attn_window=attn_window,
                )
                logits = dec.lm_logits(params, hidden, cfg.lm_head_dim)
                toks, keys, dones, emitted = jax.vmap(sample_row)(
                    logits, keys, temps, greedys, dones, toks
                )
                return (caches, poss + 1, toks, keys, dones), emitted

            def scan_body_vmap(carry, _):
                caches, poss, toks, keys, dones = carry
                caches, poss, toks, keys, dones, emitted = jax.vmap(
                    lambda c, p, t, k, d, tmp, g: step_one(
                        params, layers_list, c, p, t, k, d, tmp, g, attn_window
                    )
                )(caches, poss, toks, keys, dones, temps, greedys)
                return (caches, poss, toks, keys, dones), emitted

            scan_body = scan_body_rows if use_rows else scan_body_vmap
            (caches, poss, toks, keys, dones), emitted = jax.lax.scan(
                scan_body, (caches, poss, toks, keys, dones), None, length=block_n
            )
            packed = jnp.concatenate(
                [emitted.T, dones.astype(jnp.int32)[:, None]], axis=1
            )  # [B, block+1]
            # dones returned ON DEVICE and chained into the next dispatch:
            # under the 1-deep block pipeline a row that hit EOS must stop
            # in the NEXT block (exactly as in the unpipelined flow), not
            # when the host finally fetches packed
            return caches, toks, keys, dones, packed

        @partial(jax.jit, static_argnames=("t_pad",))
        def prefill_stage(params, ids, mask, audio, lengths, keys,
                          temperatures, greedys, t_pad: int):
            """Batched admission into STAGING buffers: P spliced prefills in
            one vmapped program, no live-cache donation — safe to dispatch
            from the admission thread while decode blocks are in flight.
            Admission cost — not decode — is the serving-throughput ceiling
            (decode amortizes over the batch; prefill and encode do not), so
            prefills batch too AND overlap decode."""

            def one(ids1, mask1, audio1, length, key, temperature, greedy):
                embd = dec.splice_prompt(params, ids1, mask1, audio1)
                cache = dec.init_cache(cfg, t_pad, kv_dtype)
                hidden, cache = dec.forward_prefill(params, cfg, embd, cache, length=length)
                last = jax.lax.dynamic_index_in_dim(hidden, length - 1, axis=0, keepdims=False)
                logits = dec.lm_logits(params, last, cfg.lm_head_dim)
                key, sub = jax.random.split(key)
                tok = jnp.where(
                    greedy,
                    sample_greedy(logits).astype(jnp.int32),
                    sample_topk_topp(logits, sub, temperature).astype(jnp.int32),
                )
                return cache, tok, key

            return jax.vmap(one)(ids, mask, audio, lengths, keys, temperatures, greedys)

        @partial(jax.jit, donate_argnames=("caches", "toks", "keys", "dones_dev"))
        def scatter_cohort(caches, staged, lanes, rows, toks, staged_toks,
                           keys, staged_keys, dones_dev):
            """Copy staged KV lanes + first tokens + keys into live rows and
            clear the rows' EOS latches — ONE dispatch per drain (each
            remote-runtime dispatch costs ~2-5 ms of host time; four
            separate programs here measurably stalled the decode worker).
            Padding lanes carry an out-of-range row index and drop
            (mode='drop'), so a cohort can scatter in as many partial steps
            as row availability dictates without a compile per width."""
            caches = jax.tree.map(
                lambda cs, st: cs.at[rows, : st.shape[1]].set(
                    st[lanes].astype(cs.dtype), mode="drop"
                ),
                caches, staged,
            )
            toks = toks.at[rows].set(staged_toks[lanes], mode="drop")
            keys = keys.at[rows].set(staged_keys[lanes], mode="drop")
            dones_dev = dones_dev.at[rows].set(False, mode="drop")
            return caches, toks, keys, dones_dev

        @jax.jit
        def set_rows(arr, rows, vals):
            return arr.at[rows].set(vals, mode="drop")

        self._prefill_stage = prefill_stage
        self._scatter_cohort = scatter_cohort
        self._decode_block = decode_block
        self._set_rows = set_rows

    # -- public API ------------------------------------------------------------

    def eligible(self, audio: np.ndarray) -> bool:
        """Long audio chunks through successive row sessions (engine chunk
        semantics); the only cap is the reference's 1200 s input limit
        (qwen_asr/inference/utils.py:33-36)."""
        return len(audio) <= 1200 * SAMPLE_RATE

    @property
    def supports_timestamps(self) -> bool:
        eng = self.engine
        return eng._aligner is not None or eng._aligner_thread is not None

    def submit(
        self,
        audio: np.ndarray,
        *,
        context: str = "",
        language: Optional[str] = None,
        temperature: float = 0.0,
        timeout: float = 600.0,
        timestamps: bool = False,
        rollback: int = 5,
    ) -> TranscribeResult:
        n_chunks = max(1, int(np.ceil(len(audio) / self.chunk_samples)))
        req = _Request(audio=audio, context=context, language=language,
                       temperature=temperature, n_chunks=n_chunks,
                       timestamps=timestamps and self.supports_timestamps,
                       rollback=rollback)
        with self._lock:
            self._pending.append(req)
        self._admit_work.set()
        if not req.done_evt.wait(timeout):
            raise TimeoutError("transcription timed out in continuous batch queue")
        if req.error is not None:
            raise req.error
        assert req.result is not None
        return req.result

    def close(self) -> None:
        self._stop = True
        self._work.set()
        self._admit_work.set()
        self._stage_slots.release()  # unblock an admission thread in acquire
        self._thread.join(timeout=5.0)
        self._admit_thread.join(timeout=5.0)
        if self._align_pool is not None:
            self._align_pool.shutdown(wait=True)

    @property
    def stats(self) -> dict:
        return {
            "admitted": self.n_admitted,
            "completed": self.n_completed,
            "active_rows": sum(1 for r in self.rows if r.req is not None),
            "queued": len(self._pending),
            # cumulative phase timers (seconds); t_admit runs on the
            # admission thread (overlapped), t_scatter/t_dispatch/t_fetch on
            # the decode worker (critical path)
            "t_admit": round(self._t_admit, 3),
            "t_admit_enc": round(self._t_admit_enc, 3),
            "t_admit_prefill": round(self._t_admit_prefill, 3),
            "t_scatter": round(self._t_scatter, 3),
            "t_dispatch": round(self._t_dispatch, 3),
            "t_fetch": round(self._t_fetch, 3),
            "n_blocks": self._n_blocks,
            "n_cohorts": self._n_cohorts,
        }

    def prewarm(self, *, audio_secs: tuple = (10.0,), language: str = "Chinese",
                context: str = "") -> None:
        """Deterministically load every serving program before traffic.

        Submitting W requests from W racing threads and hoping the admission
        loop takes them as one W-wide cohort is not deterministic on a
        1-core host: a split cohort leaves the W-wide encode/prefill
        programs unloaded, and the first live burst then pays the program
        load (seconds to minutes on this platform — see docs/ROADMAP.md
        round-4 lesson) inside the admission path. Instead, stage a
        synthetic silence cohort at EVERY compiled width directly, scatter
        it into out-of-range rows (device-side drop: live state untouched),
        and dispatch one decode block per 256-slot attention window.

        Call before serving traffic (the worker is idle then; this method
        mutates the device row state that the worker owns once rows are
        live)."""
        from ..audio.mel import HOP

        for sec in audio_secs:
            n = max(int(sec * SAMPLE_RATE), HOP)
            silence = np.zeros(n, np.float32)
            n_chunks = max(1, int(np.ceil(n / self.chunk_samples)))
            for w in self.cohort_sizes:
                reqs = [
                    _Request(audio=silence, context=context, language=language,
                             temperature=0.0, n_chunks=n_chunks)
                    for _ in range(w)
                ]
                cohort = self._stage_cohort(reqs)
                if cohort is None:
                    continue
                target_p = int(np.shape(cohort.toks)[0])
                lanes = jnp.arange(target_p, dtype=jnp.int32)
                rows = jnp.full((target_p,), self.b, jnp.int32)  # OOB -> drop
                self.caches, self.toks, self.keys, self.dones_dev = (
                    self._scatter_cohort(
                        self.caches, cohort.staged, lanes, rows,
                        self.toks, cohort.toks, self.keys, cohort.keys,
                        self.dones_dev,
                    )
                )
        for win in range(256, self.n_ctx + 1, 256):
            # all rows are done -> every step is a latched no-op; this only
            # loads the per-window block program
            self.caches, self.toks, self.keys, self.dones_dev, packed = (
                self._decode_block(
                    self.dec_params, self.layers_list, self.caches,
                    jnp.asarray(self.poss.copy()), self.toks, self.keys,
                    self.dones_dev, jnp.asarray(self.dones.copy()),
                    jnp.asarray(self.temps.copy()),
                    jnp.asarray(self.greedy.copy()), win,
                )
            )
            np.asarray(packed)

    # -- worker ------------------------------------------------------------------

    def _chunk_audio(self, req: _Request) -> np.ndarray:
        from ..audio.mel import HOP

        s = req.chunk_idx * self.chunk_samples
        chunk = req.audio[s : s + self.chunk_samples]
        if len(chunk) < HOP:  # sub-hop tail chunk: pad to one mel frame
            chunk = np.pad(np.asarray(chunk), (0, HOP - len(chunk)))
        return chunk

    def _build_admission(self, req: _Request, chunk: np.ndarray, cur):
        """(ids, mask, embd_dev) for the request's CURRENT chunk (`cur` is
        its dispatched encoder output). Chunk 0 is the plain single-prompt;
        later chunks carry the previous chunk's audio feature + stable
        tokens (engine full_prompt semantics, asr.py:269-393). Raises
        ValueError on an n_ctx overflow."""
        eng = self.engine
        n_valid = eng.encoder.valid_tokens(len(chunk))
        if req.chunk_idx + 1 < req.n_chunks:
            req.cur_feature = cur[:n_valid]  # next chunk's memory (device)
        # language=None runs the detection-protocol prompt (no forced
        # <asr_text>) exactly like the sequential engine's `detecting`
        # mode; _retire parses the emitted ``language X<asr_text>body``.
        # Detection stays live on EVERY chunk until a language parses
        # (engine chunk loop keeps detecting while cur["lang"] is None,
        # engine.py:1210), matching the official per-chunk parse+merge.
        detecting = req.language is None
        if req.chunk_idx == 0:
            ids, mask = eng._build_prompt_ids(
                n_valid, "", req.context, req.language,
                detect_language=detecting,
            )
            if len(ids) > self.n_ctx:
                raise ValueError(
                    f"prompt of {len(ids)} tokens exceeds n_ctx={self.n_ctx}"
                )
            return ids, mask, cur
        lang = req.language or req.detected_lang
        hdr, template = eng._prompt_parts("", req.context, lang, detecting)
        a_mem = int(req.mem_feature.shape[0])
        n_audio = a_mem + n_valid
        # drop the OLDEST carried tokens on overflow (engine
        # trim_prefix_tokens semantics)
        budget = self.n_ctx - min(self.max_new_tokens, 256)
        n_fixed = len(hdr) + n_audio + len(template)
        overflow = n_fixed + len(req.mem_tokens) - budget
        kept_toks = req.mem_tokens[max(overflow, 0):] if overflow < len(req.mem_tokens) else []
        suffix = template + kept_toks
        total = len(hdr) + n_audio + len(suffix)
        if total > self.n_ctx:
            raise ValueError(
                f"chunk prompt of {total} tokens exceeds n_ctx={self.n_ctx} "
                f"(40 s chunks with memory need n_ctx >= 2048)"
            )
        ids = np.zeros(total, dtype=np.int32)
        ids[: len(hdr)] = hdr
        ids[len(hdr) + n_audio :] = suffix
        mask = np.zeros(total, dtype=bool)
        mask[len(hdr) : len(hdr) + n_audio] = True
        embd = jnp.concatenate([req.mem_feature, cur], axis=0)
        return ids, mask, embd

    def _stage_cohort(self, reqs: list) -> Optional[_Cohort]:
        """Stage up to max(COHORT_SIZES) requests with ONE batched prefill
        program dispatched into staging buffers (runs on the admission
        thread — zero decode-worker stall). The cohort pads to the smallest
        compiled width with duplicates of the last request's arrays (their
        lanes are never scattered, and reusing the arrays avoids padding
        re-encodes) to bound compiled shapes."""
        # reject oversize prompts individually BEFORE forming the cohort: one
        # request longer than n_ctx must not fail its cohort peers
        _t_enc = time.time()
        eng = self.engine
        chunks = [self._chunk_audio(req) for req in reqs]
        _trace = os.environ.get("QWEN3_CB_TRACE")
        _t1 = time.time()
        # group same-shape encodes into ONE vmapped dispatch (each remote
        # dispatch costs ~2-5 ms host; per-request encodes dominated the
        # measured per-cohort admit time)
        curs: list = [None] * len(reqs)
        groups: dict = {}
        for i, c in enumerate(chunks):
            groups.setdefault(eng.encoder.batch_key(c), []).append(i)
        for idxs in groups.values():
            if len(idxs) >= 2:
                # pad the encode batch to a COMPILED width (duplicate the
                # last chunk; padding outputs discarded): the batch size is
                # a compiled dimension, and an arbitrary-width cohort (e.g.
                # 9 of a 16-slot take) would load a fresh encoder program
                # mid-traffic — measured 0.6-11 s per novel width on this
                # platform, the dominant serving-throughput noise
                width = next(p for p in self.cohort_sizes if p >= len(idxs))
                batch = [chunks[i] for i in idxs]
                batch += [batch[-1]] * (width - len(batch))
                outs = eng.encoder.encode_batch_async(batch)
                for i, o in zip(idxs, outs):
                    curs[i] = o
            else:
                curs[idxs[0]] = eng.encoder.encode_async(chunks[idxs[0]])
        _t2 = time.time()
        kept = []
        for req, chunk, cur in zip(reqs, chunks, curs):
            try:
                ids, mask, embd = self._build_admission(req, chunk, cur)
            except ValueError as e:
                req.error = e
                req.done_evt.set()
                continue
            kept.append((req, ids, mask, embd))
        _t3 = time.time()
        if _trace:
            print(f"[cb] stage w={len(reqs)}: chunk {_t1-_t_enc:.3f}s "
                  f"enc-dispatch {_t2-_t1:.3f}s build {_t3-_t2:.3f}s",
                  file=sys.stderr, flush=True)
        self._t_admit_enc += time.time() - _t_enc
        if not kept:
            return None
        reqs = [k[0] for k in kept]
        p_real = len(reqs)
        target_p = next(p for p in self.cohort_sizes if p >= p_real)

        embds, ids_list, mask_list, lens = [], [], [], []
        for i in range(target_p):
            _, ids, mask, embd = kept[min(i, p_real - 1)]
            embds.append(embd)
            ids_list.append(ids)
            mask_list.append(mask)
            lens.append(len(ids))

        t_pad = min(round_up(max(lens), 128), self.n_ctx)
        a_pad = max(int(e.shape[0]) for e in embds)
        ids_p = np.zeros((target_p, t_pad), np.int32)
        mask_p = np.zeros((target_p, t_pad), bool)
        for i in range(target_p):
            ids_p[i, : lens[i]] = ids_list[i][:t_pad]
            mask_p[i, : lens[i]] = mask_list[i][:t_pad]
        audio = jnp.stack([
            jnp.pad(e, ((0, a_pad - e.shape[0]), (0, 0))) if e.shape[0] < a_pad else e
            for e in embds
        ])

        pad = target_p - p_real
        greedys = np.asarray([r.temperature <= 0.0 for r in reqs] + [True] * pad)
        temps = np.asarray(
            [max(r.temperature, 1e-6) for r in reqs] + [1e-6] * pad, np.float32
        )
        keys = jax.random.split(
            jax.random.key(int(np.random.randint(0, 2**31 - 1))), target_p
        )
        _t_pf = time.time()
        staged, toks, keys = self._prefill_stage(
            self.params, jnp.asarray(ids_p), jnp.asarray(mask_p), audio,
            jnp.asarray(lens, dtype=jnp.int32), keys,
            jnp.asarray(temps), jnp.asarray(greedys), t_pad,
        )
        self._t_admit_prefill += time.time() - _t_pf
        return _Cohort(staged=staged, toks=toks, keys=keys, reqs=reqs,
                       lens=lens[:p_real], t_pad=t_pad)

    def _admit_loop(self) -> None:
        """Admission thread: host prompt work + encode + staging-prefill
        dispatch, fully overlapped with the decode worker. Bounded by
        `_stage_slots` so staging HBM stays finite when decode is behind."""
        max_take = self.cohort_sizes[-1]
        while not self._stop:
            with self._lock:
                take = min(len(self._pending), max_take)
                reqs = [self._pending.pop(0) for _ in range(take)]
            if not reqs:
                self._admit_work.wait(timeout=0.5)
                self._admit_work.clear()
                continue
            with self._lock:
                self._n_staging += 1
            self._stage_slots.acquire()
            if self._stop:
                # close() raced the slot wait: the popped requests would
                # otherwise hang their submitters until timeout
                err = RuntimeError("batcher closed while staging admission")
                for req in reqs:
                    if not req.done_evt.is_set():
                        req.error = err
                        req.done_evt.set()
                return
            _t0 = time.time()
            cohort = None
            try:
                cohort = self._stage_cohort(reqs)
            except Exception as e:
                for req in reqs:
                    if not req.done_evt.is_set():
                        req.error = e
                        req.done_evt.set()
            self._t_admit += time.time() - _t0
            self._n_cohorts += 1
            with self._lock:
                self._n_staging -= 1
                if cohort is not None:
                    self._ready.append(cohort)
            if cohort is None:
                self._stage_slots.release()
            else:
                self._work.set()

    def _drain_ready(self) -> None:
        """Scatter staged cohort lanes into free rows (decode worker only —
        the single mutator of live caches and row state)."""
        while True:
            with self._lock:
                free = [i for i, r in enumerate(self.rows) if r.req is None]
                if not self._ready or not free:
                    return
                cohort = self._ready[0]
                n = min(len(free), len(cohort.reqs) - cohort.next_lane)
                lanes = list(range(cohort.next_lane, cohort.next_lane + n))
                rows = free[:n]
                cohort.next_lane += n
                finished = cohort.next_lane >= len(cohort.reqs)
                if finished:
                    self._ready.pop(0)
            _t0 = time.time()
            target_p = int(np.shape(cohort.toks)[0])
            # pad to the cohort's compiled width; OOB rows drop on device
            lanes_p = jnp.asarray(lanes + [0] * (target_p - n), dtype=jnp.int32)
            rows_p = jnp.asarray(rows + [self.b] * (target_p - n), dtype=jnp.int32)
            self.caches, self.toks, self.keys, self.dones_dev = self._scatter_cohort(
                self.caches, cohort.staged, lanes_p, rows_p,
                self.toks, cohort.toks, self.keys, cohort.keys, self.dones_dev,
            )
            for lane, row_idx in zip(lanes, rows):
                req = cohort.reqs[lane]
                row = self.rows[row_idx]
                row.req = req
                row.tokens = []
                row.pos = cohort.lens[lane]
                row.started_at = time.time()
                self.poss[row_idx] = cohort.lens[lane]
                self.temps[row_idx] = max(req.temperature, 1e-6)
                self.greedy[row_idx] = req.temperature <= 0.0
                self.dones[row_idx] = False
                self.n_admitted += 1
            self._t_scatter += time.time() - _t0
            if finished:
                self._stage_slots.release()

    def _retire(self, row_idx: int) -> None:
        row = self.rows[row_idx]
        req = row.req
        assert req is not None
        eng = self.engine
        eos = set(int(e) for e in np.asarray(self.eos_ids))
        toks = [t for t in row.tokens[: self.max_new_tokens] if t not in eos]
        row.req = None
        self.dones[row_idx] = True
        self.row_gen[row_idx] += 1  # invalidates in-flight block lanes

        # detection stays live until a language parses (engine keeps
        # detecting while cur["lang"] is None, engine.py:1210)
        still_detecting = req.language is None and req.detected_lang is None

        def parse_detect(text: str, tokens: list) -> tuple[str, list]:
            """Auto-language parse (engine `detecting` semantics): strip
            the ``language X<asr_text>`` protocol from display text and
            from the carried prefix tokens; record the language for later
            chunk prompts and the aligner."""
            from ..text.parsing import parse_asr_output

            d_lang, body = parse_asr_output(text)
            if d_lang:
                req.detected_lang = d_lang
            if eng.ID_ASR_TEXT in tokens:
                tokens = tokens[tokens.index(eng.ID_ASR_TEXT) + 1:]
            return body, tokens

        if req.chunk_idx + 1 < req.n_chunks:
            # non-final chunk: trim the rollback tail from display AND the
            # carried prefix (engine display_queue semantics, asr.py:148-154)
            # and re-enter the admission queue as the next chunk, carrying
            # this chunk's audio feature + stable tokens
            stable = toks[: max(0, len(toks) - req.rollback)]
            text = eng.model.decode(stable)
            if still_detecting:
                text, stable = parse_detect(text, stable)
            req.chunk_texts.append(text)
            req.mem_tokens = stable
            req.mem_feature = req.cur_feature
            req.cur_feature = None
            req.chunk_idx += 1
            with self._lock:
                self._pending.append(req)
            self._admit_work.set()
            return

        text_final = eng.model.decode(toks)
        if still_detecting:
            text_final, _ = parse_detect(text_final, toks)
        req.chunk_texts.append(text_final)
        self.n_completed += 1
        text = "".join(req.chunk_texts)
        perf = {
            "batched": "continuous",
            "n_generate": len(row.tokens),
            "n_chunks": req.n_chunks,
            "latency_s": time.time() - req.submitted_at,
        }
        if req.timestamps:
            # alignment runs on the align pool (prefill-only NAR aligner —
            # its device work rides the same queue, overlapped with decode);
            # done_evt fires when the timestamps land
            self._align_pool_submit(req, text, perf)
        else:
            req.result = TranscribeResult(
                text=text, performance=perf,
                language=req.language or req.detected_lang or "",
            )
            req.done_evt.set()

    def _align_pool_submit(self, req: _Request, text: str, perf: dict) -> None:
        from concurrent.futures import ThreadPoolExecutor

        if self._align_pool is None:
            self._align_pool = ThreadPoolExecutor(max_workers=1)
        self._align_pool.submit(self._align_request, req, text, perf)

    def _align_request(self, req: _Request, text: str, perf: dict) -> None:
        """Forced-align each chunk's text over its overlap-aware window
        (engine align_window semantics, asr.py:322-348); degrades to an
        empty alignment with a warning on failure (reference
        asr_worker.py:36-38)."""
        from ..schema import ForcedAlignResult
        from .. import logger

        chunk_sec = self.chunk_samples / SAMPLE_RATE
        duration = len(req.audio) / SAMPLE_RATE
        items: list = []
        prev_items: list = []
        try:
            aligner = self.engine.aligner
            for j, txt in enumerate(req.chunk_texts):
                seg_end = min((j + 1) * chunk_sec, duration)
                offset = j * chunk_sec
                if j > 0 and prev_items:
                    prev_limit = j * chunk_sec
                    offset = min(prev_limit,
                                 max(prev_items[-1].end_time, prev_limit - 10.0))
                if not txt.strip():
                    prev_items = []
                    continue
                ares = aligner.align(
                    req.audio[int(offset * SAMPLE_RATE): int(seg_end * SAMPLE_RATE)],
                    txt,
                    language=req.language or req.detected_lang or "Chinese",
                    offset_sec=offset,
                )
                prev_items = list(ares.items)
                items.extend(prev_items)
        except Exception:
            logger.warning(
                "forced alignment failed in batched serving; "
                "timestamps degraded to empty", exc_info=True,
            )
        items.sort(key=lambda x: x.start_time)
        req.result = TranscribeResult(
            text=text,
            alignment=ForcedAlignResult(items=items) if items else None,
            performance=perf,
            language=req.language or req.detected_lang or "",
        )
        req.done_evt.set()

    def _process_block(self, packed_dev, snapshot) -> None:
        """Fetch a dispatched block's packed result and retire finished rows.

        `snapshot` is [(row_idx, generation)] captured at dispatch time: a
        row retired (and possibly re-admitted) while this block was in
        flight has a bumped generation, and its lane in this block is junk
        from the pre-retirement request — skip it. The device latches its
        cache/token state harmlessly (re-admission's prefill scatter is
        enqueued after this block, and every decode step rewrites its KV
        slot before reading it)."""
        _t0 = time.time()
        packed = np.asarray(packed_dev)  # ONE fetch per block
        self._t_fetch += time.time() - _t0
        for i, gen in snapshot:
            row = self.rows[i]
            if self.row_gen[i] != gen or row.req is None:
                continue  # retired mid-flight; lane contents are stale
            row.tokens.extend(int(t) for t in packed[i, :-1] if t >= 0)
            finished = bool(packed[i, -1])
            out_of_budget = (
                len(row.tokens) >= self.max_new_tokens
                or row.pos + len(row.tokens) + self.block >= self.n_ctx
            )
            if finished or out_of_budget:
                self.dones[i] = True
                self._retire(i)

    def _loop(self) -> None:
        # 1-deep block pipeline: block n+1 is dispatched BEFORE block n's
        # packed result is fetched, so the ~30-50 ms device->host result
        # round trip rides under the next block's compute instead of
        # stalling the whole batch (same scheme as the single-stream
        # Generator.decode_block_dispatch pipeline).
        inflight = None  # (packed_device, [(row, generation)])
        while not self._stop:
            # scatter staged cohorts into free rows (admission itself —
            # host prompt work, encode, prefill — already ran on the
            # admission thread, overlapped with previous decode blocks)
            self._drain_ready()

            active = [i for i, r in enumerate(self.rows) if r.req is not None]
            if not active:
                if inflight is not None:
                    self._process_block(*inflight)
                    inflight = None
                    continue  # a retire may have unblocked admission
                with self._lock:
                    if not self._pending and not self._ready:
                        self._work.clear()
                self._work.wait(timeout=0.5)
                continue

            # fill gate: a decode block costs the same device time with
            # 3 active rows as with all B — while admissions are in flight
            # and rows are not full, give staging a window to land instead
            # of burning partially-empty blocks. Under a 128-request burst
            # the old 80 ms / half-full gate still dispatched ramp blocks at
            # 16-48 of 64 rows: 9 blocks where ~5 are ideal (measured 744
            # s-audio/s with decode fetch-wait 1.51 s of a 1.72 s wall).
            # The gate waits while admission inflow exists (pending, staged,
            # or mid-staging work) and rows are not full, hard-capped at
            # FILL_MS. Inflow-gated: a lone request with an empty queue
            # never waits here, and a trickle request waits only for its
            # own staging pass (~0.1-0.2 s), which it needed anyway.
            if inflight is None and len(active) < self.b:
                t_gate = time.time()
                fill_s = self._fill_gate_s
                while (
                    len(active) < self.b and time.time() - t_gate < fill_s
                ):
                    with self._lock:
                        inflow = bool(self._pending or self._ready) or self._n_staging > 0
                    if not inflow:
                        break
                    # while inflow exists the DEVICE is not idling here —
                    # it is running the staged cohorts' encode/prefill
                    # programs, which a premature half-empty block would
                    # only delay. The wait ends the moment admission goes
                    # quiet (trickle: one staging pass, ~0.1-0.2 s) or rows
                    # fill; fill_s caps pathological inflow.
                    # plain sleep, NOT _work.wait(): _work is usually
                    # already set here, so wait() returns immediately and
                    # the gate busy-spins, stealing the 1-core host from
                    # the admission thread it is waiting on
                    time.sleep(0.004)
                    self._drain_ready()
                    active = [i for i, r in enumerate(self.rows) if r.req is not None]

            # bucket the attention window to the deepest active row (256-slot
            # steps -> at most n_ctx/256 compiled variants)
            win = min(
                self.n_ctx,
                round_up(int(max(self.poss[i] for i in active)) + self.block, 256),
            )
            # numpy .copy() snapshots, NEVER the live mirrors: jax dispatch
            # is asynchronous and the host->device copy of an argument may
            # happen only when the device thread launches the program — by
            # which time this loop has already mutated poss/dones in place
            # for the next iteration. That race shifted a whole block's RoPE
            # positions by +block and flipped greedy tokens, appearing and
            # disappearing with thread timing (an unrelated environment
            # variable was enough to toggle it). A synchronous host memcpy
            # before dispatch is immune.
            _t0 = time.time()
            self.caches, self.toks, self.keys, self.dones_dev, packed = (
                self._decode_block(
                    self.dec_params, self.layers_list, self.caches,
                    jnp.asarray(self.poss.copy()), self.toks, self.keys,
                    self.dones_dev, jnp.asarray(self.dones.copy()),
                    jnp.asarray(self.temps.copy()),
                    jnp.asarray(self.greedy.copy()), win,
                )
            )
            self._t_dispatch += time.time() - _t0
            self._n_blocks += 1
            if self.pipeline:
                try:
                    packed.copy_to_host_async()
                except AttributeError:
                    pass
            for i in active:
                self.poss[i] += self.block
            snapshot = [(i, int(self.row_gen[i])) for i in active]
            if inflight is not None:
                self._process_block(*inflight)
            if self.pipeline:
                inflight = (packed, snapshot)
            else:
                self._process_block(packed, snapshot)
