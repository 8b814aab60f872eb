"""Parameter loading / saving.

Decoder checkpoints use GGUF with llama.cpp qwen3 tensor naming (the same
files the reference's converter emits, 06-Convert-ASR-Decoder-GGUF.py);
encoder checkpoints use safetensors. Loading maps everything into the
stacked-layer pytrees the models consume, keeping q4_k tensors packed
(`Q4Weight`) unless a dense precision is requested.
"""

from __future__ import annotations

import json
from dataclasses import asdict
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import GGUFReader, GGUFWriter
from ..formats import quants as q
from ..formats.quants import pack_q4_direct
from ..ops.qtensor import Int8Weight, Q4Weight
from ..text.tokenizer import BPETokenizer
from .configs import AudioEncoderConfig, TextDecoderConfig, ThinkerConfig

# my param name -> GGUF per-layer tensor suffix
_LAYER_MAP = {
    "attn_norm": "attn_norm.weight",
    "q_proj": "attn_q.weight",
    "k_proj": "attn_k.weight",
    "v_proj": "attn_v.weight",
    "o_proj": "attn_output.weight",
    "q_norm": "attn_q_norm.weight",
    "k_norm": "attn_k_norm.weight",
    "mlp_norm": "ffn_norm.weight",
    "gate_proj": "ffn_gate.weight",
    "up_proj": "ffn_up.weight",
    "down_proj": "ffn_down.weight",
}
_QUANTIZABLE = {"q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"}


_SIDECAR_MARKER = "__complete"


def _ram_mirror(sidecar_dir: Path) -> Path:
    """Mirror a sidecar directory into tmpfs and return the mirror path.

    This VM's page cache is capped at ~1 GB regardless of free RAM and its
    disk reads at ~15-60 MB/s, so every process re-reads ~1.5 GB of
    sidecars from disk (~10-25 s of engine init). A /dev/shm copy pays the
    disk read once per machine; later inits mmap straight from RAM.
    Disable with QWEN3_ASR_RAM_CACHE=0; redirect with ...=/path."""
    import os as _os
    import shutil as _shutil

    root = _os.environ.get("QWEN3_ASR_RAM_CACHE", "/dev/shm/qwen3_asr_cache")
    if root in ("0", "") or not sidecar_dir.is_dir():
        return sidecar_dir
    try:
        import hashlib
        import time as _time

        key = hashlib.sha1(str(sidecar_dir.resolve()).encode()).hexdigest()[:16]
        dst = Path(root) / f"{sidecar_dir.name}-{key}"
        dst.mkdir(parents=True, exist_ok=True)
        _t0, _copied = _time.time(), 0
        for src in sidecar_dir.iterdir():
            if not src.is_file():
                continue
            out = dst / src.name
            st = src.stat()
            if out.exists():
                so = out.stat()
                if so.st_mtime >= st.st_mtime and so.st_size == st.st_size:
                    continue
            tmp = dst / f".{src.name}.{_os.getpid()}.tmp"
            _shutil.copy2(src, tmp)  # copy2 keeps mtime (freshness witness)
            _os.replace(tmp, out)
            _copied += st.st_size
        if _copied:
            # a fresh machine pays this disk read ONCE; init numbers with a
            # cold mirror are disk-bound, warm ones are link-bound — the log
            # line makes the driver-tail init time interpretable
            from .. import logger as _logger

            _logger.info(
                "sidecar mirror: copied %d MB to tmpfs in %.1fs (cold mirror)",
                _copied >> 20, _time.time() - _t0,
            )
        # drop mirror entries whose source vanished (stale layouts)
        live = {p.name for p in sidecar_dir.iterdir() if p.is_file()}
        for p in dst.iterdir():
            if p.name not in live and not p.name.endswith(".tmp"):
                try:
                    p.unlink()
                except OSError:
                    pass
        return dst
    except OSError:
        return sidecar_dir


def _sidecar_load(
    sidecar_dir: Path, src_mtime: float, expected: set[str] | None = None
) -> dict[str, np.ndarray] | None:
    """Load a per-tensor .npy sidecar dir iff it is complete and fresh.

    Completeness is proven by a marker file written LAST (after every
    np.save): an interrupted save can leave final_norm.npy on disk before
    the lm_head tensors, so any data file is an unsafe freshness witness.
    The `expected` key set is ALWAYS validated (marker or not): a sidecar
    from an older tensor layout has a fresh marker but different keys and
    must rebuild, not KeyError at load (bit us when the int4 layout moved
    from expanded scale planes to the factored q4_k form)."""
    marker = sidecar_dir / _SIDECAR_MARKER
    files = {p.name: p for p in sidecar_dir.glob("*.npy")}
    if expected is not None:
        want = {f"{k.replace('.', '__')}.npy" for k in expected}
        if "embed__q6k.npy" in files or "embed__bf16.npy" in files:
            # packed-q6k / raw-bf16 embed layouts store no embed.npy
            want.discard("embed.npy")
        if not want <= files.keys():
            return None
    if not (marker.exists() and marker.stat().st_mtime >= src_mtime):
        if expected is None:
            return None
        if any(files[n].stat().st_mtime < src_mtime for n in want):
            return None
        try:
            marker.touch()
        except OSError:
            pass
    mirror = _ram_mirror(sidecar_dir)
    if mirror != sidecar_dir:
        files = {p.name: p for p in mirror.glob("*.npy")}
    flat = {f.stem.replace("__", "."): np.load(f, mmap_mode="r") for f in files.values()}
    if "embed.q6k" in flat and "embed.bf16" not in flat:
        # migrate a packed-q6k-era sidecar to the raw-bf16 embed plane once
        # (host dequant via the native codec; see _embed_to_flat for why)
        try:
            import ml_dtypes

            from ..formats import quants as q

            shape = tuple(int(s) for s in np.asarray(flat["embed.q6k_shape"]))
            f32 = q.dequantize(np.asarray(flat["embed.q6k"]), q.GGML_Q6_K, shape)
            bf = f32.astype(ml_dtypes.bfloat16).view(np.uint16)
            np.save(sidecar_dir / "embed__bf16.npy", bf)
            flat["embed.bf16"] = np.load(sidecar_dir / "embed__bf16.npy", mmap_mode="r")
        except Exception:
            pass  # keep the q6k device-dequant path
    return flat


def _sidecar_expected(kind: str) -> set[str]:
    """The full tensor-key set a {int8|int4} sidecar must contain."""
    quant_suffixes = {
        "int8": ("q", "scale"),
        "int4": ("packed", "sub_t", "min_t", "dd_t"),
    }[kind]
    keys: set[str] = {"embed", "final_norm"}
    keys.update(f"lm_head.{s}" for s in quant_suffixes)
    for mine in _LAYER_MAP:
        if mine in _QUANTIZABLE:
            keys.update(f"layers.{mine}.{s}" for s in quant_suffixes)
        else:
            keys.add(f"layers.{mine}")
    return keys


def _sidecar_save(sidecar_dir: Path, flat: dict[str, np.ndarray]) -> None:
    try:
        sidecar_dir.mkdir(exist_ok=True)
        for k, v in flat.items():
            np.save(sidecar_dir / f"{k.replace('.', '__')}.npy", v)
        (sidecar_dir / _SIDECAR_MARKER).touch()
    except OSError:
        pass  # read-only model dir: skip caching


_SIDECAR_META = "__meta.pkl"


def _sidecar_meta_save(sidecar_dir: Path, cfg, tokenizer) -> None:
    """Cache (decoder config, built tokenizer) next to the tensor sidecar:
    a warm engine init then skips GGUF header/kv parsing AND the 152k-vocab
    BPE build entirely (~1.4 s of GIL-bound host work on the init critical
    path)."""
    import pickle

    try:
        sidecar_dir.mkdir(exist_ok=True)
        tmp = sidecar_dir / (_SIDECAR_META + ".tmp")
        with open(tmp, "wb") as f:
            pickle.dump((cfg, tokenizer), f, protocol=pickle.HIGHEST_PROTOCOL)
        tmp.replace(sidecar_dir / _SIDECAR_META)
    except (OSError, pickle.PicklingError):
        pass


def _sidecar_meta_load(sidecar_dir: Path, src_mtime: float):
    import pickle

    p = sidecar_dir / _SIDECAR_META
    try:
        if not (p.exists() and p.stat().st_mtime >= src_mtime):
            return None
        with open(p, "rb") as f:
            return pickle.load(f)
    except Exception:  # stale/incompatible pickle: rebuild from the GGUF
        return None


def _embed_to_flat(reader: GGUFReader, flat: dict) -> None:
    """token_embd into the sidecar as raw bf16 bytes (uint16 view — np.save
    can't serialize the ml_dtypes bfloat16 descr).

    bf16-on-disk makes the init-path embed a PURE device transfer:
    jnp.asarray of a bf16 numpy array compiles nothing. The previous
    packed-q6k layout uploaded 2.4x fewer bytes but paid a
    `dequant_q6k_device` program per process — measured 2.3 s warm / 38 s
    on a compile-cache miss vs 0.7 s for the straight 623 MB upload at the
    link's measured ~880 MB/s. Host-side q6_k decode happens once here at
    sidecar build (native codec; ~40 s pure-numpy fallback is one-time)."""
    import ml_dtypes

    f32 = reader.tensor("token_embd.weight", dtype=np.float32)
    flat["embed.bf16"] = f32.astype(ml_dtypes.bfloat16).view(np.uint16)


def _embed_device(flat: dict, dense_dtype) -> jax.Array:
    if "embed.bf16" in flat:
        import ml_dtypes

        # copy the mmap into RAM before staging: PJRT's host staging reads
        # an mmap source at ~200-450 MB/s (page-granular faults) vs ~1 GB/s
        # from a contiguous RAM buffer — measured 3.3 s vs 0.6 s on the
        # 623 MB plane
        host = np.ascontiguousarray(flat["embed.bf16"]).view(ml_dtypes.bfloat16)
        e = jnp.asarray(host)  # transfer only — no compiled program
        return e.astype(dense_dtype) if e.dtype != dense_dtype else e
    if "embed.q6k" in flat:  # sidecars written before the bf16 layout
        from ..ops.qtensor import dequant_q6k_device

        shape = tuple(int(s) for s in np.asarray(flat["embed.q6k_shape"]))
        return dequant_q6k_device(np.asarray(flat["embed.q6k"]), shape, dtype=dense_dtype)
    e = jnp.asarray(flat["embed"])
    return e.astype(dense_dtype) if e.dtype != dense_dtype else e


def _load_tensor(reader: GGUFReader, name: str, *, keep_packed: bool, dtype) -> Any:
    ti = reader.tensors[name]
    if keep_packed and ti.ggml_type == q.GGML_Q4_K and len(ti.shape) == 2:
        return Q4Weight.from_packed(reader.packed_q4(name))
    from .. import native

    if ti.ggml_type == q.GGML_Q6_K and ti.nbytes > 10 << 20 and not native.available():
        # big q6_k tensors (token_embd/output) dequantize on device when the
        # native host codec isn't built (pure-numpy q6_k costs ~40 s here)
        from ..ops.qtensor import dequant_q6k_device

        return dequant_q6k_device(reader.tensor_bytes(name), ti.shape, dtype=dtype)
    return jnp.asarray(reader.tensor(name), dtype=dtype)


def _host_int8(p: "q.PackedQ4") -> tuple[np.ndarray, np.ndarray]:
    """PackedQ4 (host) -> per-channel symmetric int8 (host numpy)."""
    dense = q.unpack_q4(p)
    amax = np.maximum(np.abs(dense).max(axis=-1), 1e-10)
    scale = (amax / 127.0).astype(np.float32)
    qv = np.clip(np.round(dense / scale[:, None]), -127, 127).astype(np.int8)
    return qv, scale


def _stack(leaves: list[Any]) -> Any:
    if isinstance(leaves[0], Q4Weight):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)
    return jnp.stack(leaves)


def decoder_config_from_gguf(reader: GGUFReader) -> TextDecoderConfig:
    kv = reader.kv
    arch = kv.get("general.architecture", "qwen3vl")

    def g(suffix, default=None):
        return kv.get(f"{arch}.{suffix}", default)

    n_vocab, hidden = reader.tensors["token_embd.weight"].shape
    head_out = reader.tensors["output.weight"].shape[0] if "output.weight" in reader.tensors else n_vocab
    classify = head_out if head_out != n_vocab and head_out < 20_000 else None
    return TextDecoderConfig(
        vocab_size=n_vocab,
        hidden_size=int(g("embedding_length", hidden)),
        num_layers=int(g("block_count")),
        num_heads=int(g("attention.head_count")),
        num_kv_heads=int(g("attention.head_count_kv")),
        head_dim=int(g("attention.key_length", 128)),
        intermediate_size=int(g("feed_forward_length")),
        rms_norm_eps=float(g("attention.layer_norm_rms_epsilon", 1e-6)),
        rope_theta=float(g("rope.freq_base", 5e6)),
        classify_num=classify,
    )


def load_decoder_meta(
    path: str, precision: str
) -> tuple[TextDecoderConfig, BPETokenizer] | None:
    """Warm-path (config, tokenizer) from the sidecar meta pickle, or None.

    Split out of `load_decoder_gguf` so callers can run it BEFORE spinning
    up contending threads: the unpickle is 0.18 s alone but starves on the
    GIL next to an encoder load or tensor staging (measured 1.4-3.8 s), and
    everything downstream of the decoder load waits on it."""
    if precision not in ("int8", "int4"):
        return None
    sidecar_dir = Path(path + "." + precision)
    return _sidecar_meta_load(sidecar_dir, Path(path).stat().st_mtime)


def load_decoder_gguf(
    path: str,
    *,
    precision: str = "int8",  # "int8" (MXU-native compute), "q4_k" (packed
    #                            pallas path, lowest HBM), "bf16", "f32"
    dtype=jnp.bfloat16,
    meta: tuple[TextDecoderConfig, BPETokenizer] | None = None,
) -> tuple[TextDecoderConfig, dict, BPETokenizer]:
    import time as _time

    from .. import logger as _logger

    _t0 = _time.time()
    dense_dtype = jnp.float32 if precision == "f32" else dtype

    if precision in ("int8", "int4"):
        # warm path: the per-tensor sidecar carries a (config, tokenizer)
        # meta pickle too — a fresh sidecar means the GGUF file is never
        # opened, skipping ~1.4 s of GIL-bound header/kv parse + BPE build
        sidecar_dir = Path(path + "." + precision)
        src_mtime = Path(path).stat().st_mtime
        loader = _load_int8_params if precision == "int8" else _load_int4_params
        reader_box: dict = {}

        def _reader() -> GGUFReader:
            if "r" not in reader_box:
                reader_box["r"] = GGUFReader(path)
            return reader_box["r"]

        # meta FIRST, serially (unless the caller pre-loaded it): the
        # unpickle is 0.18 s alone, but run concurrently with tensor staging
        # it starves on the GIL and becomes the load's long pole (measured
        # 3.8 s joined vs 2.6 s for staging dispatch — the overlap is a net
        # loss, do not reintroduce)
        if meta is None:
            meta = _sidecar_meta_load(sidecar_dir, src_mtime)
        if meta is not None:
            cfg, tokenizer = meta
            _logger.info("decoder load: sidecar meta hit at +%.2fs", _time.time() - _t0)
            return cfg, loader(_reader, cfg, path, dense_dtype), tokenizer

        reader = _reader()
        cfg = decoder_config_from_gguf(reader)
        # 152k-vocab BPE construction is ~0.5 s of pure host work
        # independent of the tensor load — run it on a worker thread
        # (reader.kv is parsed and read-only by now)
        import threading as _threading

        tok_box: dict = {}

        def _build_tok():
            try:
                tok_box["tok"] = BPETokenizer.from_gguf_kv(reader.kv)
            except BaseException as e:
                tok_box["error"] = e

        tok_thread = _threading.Thread(target=_build_tok, daemon=True)
        tok_thread.start()
        _logger.info("decoder load: reader up at +%.2fs", _time.time() - _t0)
        params = loader(_reader, cfg, path, dense_dtype)
        tok_thread.join()
        if "error" in tok_box:
            raise tok_box["error"]
        tokenizer = tok_box["tok"]
        _sidecar_meta_save(sidecar_dir, cfg, tokenizer)
        return cfg, params, tokenizer

    reader = GGUFReader(path)
    cfg = decoder_config_from_gguf(reader)
    keep_packed = precision in ("q4_k", "int8")
    _logger.info("decoder load: reader up at +%.2fs", _time.time() - _t0)
    tokenizer = BPETokenizer.from_gguf_kv(reader.kv)

    layers: dict[str, Any] = {}
    for mine, suffix in _LAYER_MAP.items():
        packed = keep_packed and mine in _QUANTIZABLE
        per_layer = [
            _load_tensor(reader, f"blk.{i}.{suffix}", keep_packed=packed,
                         dtype=jnp.float32 if "norm" in mine else dense_dtype)
            for i in range(cfg.num_layers)
        ]
        layers[mine] = _stack(per_layer)

    embed = _load_tensor(reader, "token_embd.weight", keep_packed=False, dtype=dense_dtype)
    head_name = "output.weight" if "output.weight" in reader.tensors else "token_embd.weight"
    if keep_packed and cfg.hidden_size % 64 == 0:
        # The LM head dominates decode bandwidth (vocab x hidden read per
        # token); requantize it into the packed int4 layout, rows padded to
        # the kernel's 256 tile (lm_logits slices back to lm_head_dim).
        head_f32 = reader.tensor(head_name, dtype=np.float32)
        pad_rows = (-head_f32.shape[0]) % 256
        if pad_rows:
            head_f32 = np.concatenate(
                [head_f32, np.zeros((pad_rows, head_f32.shape[1]), np.float32)]
            )
        head = Q4Weight.from_packed(pack_q4_direct(head_f32))
    else:
        head = _load_tensor(reader, head_name, keep_packed=False, dtype=dense_dtype)
    params = {
        "embed": embed,
        "layers": layers,
        "final_norm": jnp.asarray(reader.tensor("output_norm.weight"), dtype=jnp.float32),
        "lm_head": head,
    }
    return cfg, params, tokenizer


def _load_int8_params(reader_fn, cfg: TextDecoderConfig, path: str, dense_dtype) -> dict:
    """int8 load path: q4_k/q6_k content requantized to per-channel int8 on
    the host (decode through the packed int4 kernel is VPU-dequant-bound;
    int8 rides the MXU's native path at ~2.6x the tokens/s). The converted
    arrays are cached in a `.int8.npz` sidecar so later engine inits skip
    GGUF decode + requant entirely (reference init bar: 3.6 s)."""
    sidecar_dir = Path(path + ".int8")
    legacy_npz = Path(path + ".int8.npz")
    src_mtime = Path(path).stat().st_mtime

    def _fresh(p: Path) -> bool:
        return p.exists() and p.stat().st_mtime >= src_mtime

    cached = _sidecar_load(sidecar_dir, src_mtime, _sidecar_expected("int8"))
    if cached is not None:
        # one mmap-able .npy per tensor: jnp.asarray streams straight from
        # the page cache to the device, no full-RAM decompress pass
        flat = cached
    elif _fresh(legacy_npz):
        z = np.load(legacy_npz)
        flat = {k: z[k] for k in z.files}
        _sidecar_save(sidecar_dir, flat)  # migrate once to per-tensor layout
    else:
        reader = reader_fn()
        flat: dict[str, np.ndarray] = {}
        for mine, suffix in _LAYER_MAP.items():
            if mine in _QUANTIZABLE:
                qs, ss = zip(*(
                    _host_int8(reader.packed_q4(f"blk.{i}.{suffix}"))
                    for i in range(cfg.num_layers)
                ))
                flat[f"layers.{mine}.q"] = np.stack(qs)
                flat[f"layers.{mine}.scale"] = np.stack(ss)
            else:
                flat[f"layers.{mine}"] = np.stack([
                    reader.tensor(f"blk.{i}.{suffix}", dtype=np.float32)
                    for i in range(cfg.num_layers)
                ])
        # packed q6_k (or f16) embed: upload-light, dequantized on device
        _embed_to_flat(reader, flat)
        flat["final_norm"] = reader.tensor("output_norm.weight", dtype=np.float32)
        head_name = "output.weight" if "output.weight" in reader.tensors else "token_embd.weight"
        head = reader.tensor(head_name, dtype=np.float32)
        amax = np.maximum(np.abs(head).max(axis=-1), 1e-10)
        flat["lm_head.scale"] = (amax / 127.0).astype(np.float32)
        flat["lm_head.q"] = np.clip(
            np.round(head / flat["lm_head.scale"][:, None]), -127, 127
        ).astype(np.int8)
        _sidecar_save(sidecar_dir, flat)

    # embed uploads on its own thread, overlapping the layer staging (same
    # pattern as the int4 path below; the two are the decoder-load wall)
    import threading as _threading

    _embed_box: dict[str, Any] = {}

    def _embed_worker():
        try:
            _embed_box["embed"] = _embed_device(flat, dense_dtype)
        except Exception as e:
            _embed_box["error"] = e

    _embed_thread = _threading.Thread(
        target=_embed_worker, name="embed-upload", daemon=True
    )
    _embed_thread.start()

    # staged on a small pool like the int4 path: memcpy + PJRT staging both
    # release the GIL and overlap across groups
    from concurrent.futures import ThreadPoolExecutor as _TPE

    def _stage(mine: str):
        if mine in _QUANTIZABLE:
            return Int8Weight(
                q=jnp.asarray(np.ascontiguousarray(flat[f"layers.{mine}.q"])),
                scale=jnp.asarray(np.ascontiguousarray(flat[f"layers.{mine}.scale"])),
            )
        return jnp.asarray(flat[f"layers.{mine}"], dtype=jnp.float32)

    group_names = list(_LAYER_MAP)
    with _TPE(max_workers=4, thread_name_prefix="stage") as _pool:
        layers = dict(zip(group_names, _pool.map(_stage, group_names)))
    _embed_thread.join()
    if "error" in _embed_box:
        raise _embed_box["error"]
    embed_dev = _embed_box["embed"]
    return {
        "embed": embed_dev,
        "layers": layers,
        "final_norm": jnp.asarray(np.ascontiguousarray(flat["final_norm"]), dtype=jnp.float32),
        "lm_head": Int8Weight(
            q=jnp.asarray(flat["lm_head.q"]), scale=jnp.asarray(flat["lm_head.scale"])
        ),
    }


def _load_int4_params(reader_fn, cfg: TextDecoderConfig, path: str, dense_dtype) -> dict:
    """int4 load path: q4_k content repacked into the MXU matvec layout
    (`ops.pallas_q4k.Q4KMXUWeight`) — weights stream 4-bit at decode with
    exact per-32-group q4_k scales, ~half the int8 path's HBM bytes/token.
    Cached in a `.int4/` per-tensor sidecar like the int8 path."""
    from ..ops.pallas_q4k import pack_q4k_mxu, pad_rows, Q4KMXUWeight
    from ..formats.quants import pack_q4_direct

    from ..ops.pallas_q4k import self_check_async

    # bitcast-layout validation runs on a background thread (its standalone
    # kernel compile costs minutes through the remote compile service);
    # Generator.collect_block surfaces a failure on the decode hot path
    self_check_async()
    sidecar_dir = Path(path + ".int4")
    src_mtime = Path(path).stat().st_mtime

    cached = _sidecar_load(sidecar_dir, src_mtime, _sidecar_expected("int4"))
    if cached is not None:
        flat = cached
    else:
        reader = reader_fn()

        def _mxu_parts(name: str):
            ti = reader.tensors[name]
            if ti.ggml_type == q.GGML_Q4_K and len(ti.shape) == 2:
                return pack_q4k_mxu(reader.packed_q4(name))
            # non-q4_k tensor in a mixed file: requantize from f32
            return pack_q4k_mxu(pack_q4_direct(reader.tensor(name, dtype=np.float32)))

        flat: dict[str, np.ndarray] = {}
        for mine, suffix in _LAYER_MAP.items():
            if mine in _QUANTIZABLE:
                parts = [_mxu_parts(f"blk.{i}.{suffix}") for i in range(cfg.num_layers)]
                for fi, suf in enumerate(("packed", "sub_t", "min_t", "dd_t")):
                    flat[f"layers.{mine}.{suf}"] = np.stack([p[fi] for p in parts])
            else:
                flat[f"layers.{mine}"] = np.stack([
                    reader.tensor(f"blk.{i}.{suffix}", dtype=np.float32)
                    for i in range(cfg.num_layers)
                ])
        _embed_to_flat(reader, flat)  # packed q6_k embed when available
        flat["final_norm"] = reader.tensor("output_norm.weight", dtype=np.float32)
        head_name = "output.weight" if "output.weight" in reader.tensors else "token_embd.weight"
        head = pad_rows(*_mxu_parts(head_name))
        for fi, suf in enumerate(("packed", "sub_t", "min_t", "dd_t")):
            flat[f"lm_head.{suf}"] = head[fi]
        _sidecar_save(sidecar_dir, flat)

    import threading as _threading
    import time as _time

    from .. import logger as _logger

    _t0 = _time.time()

    # the embed plane (623 MB bf16 at 1.7B) uploads on its own thread so its
    # host-RAM copy + transfer overlap the layer staging below — the two
    # together are the whole decoder-load wall
    _embed_box: dict[str, Any] = {}

    def _embed_worker():
        try:
            _t = _time.time()
            _embed_box["embed"] = _embed_device(flat, dense_dtype)
            _logger.info("int4 load: embed dispatched in %.2fs (thread)",
                         _time.time() - _t)
        except Exception as e:  # surfaced at join
            _embed_box["error"] = e

    _embed_thread = _threading.Thread(
        target=_embed_worker, name="embed-upload", daemon=True
    )
    _embed_thread.start()

    def _ram(a: np.ndarray) -> np.ndarray:
        # mmap -> RAM before staging (see _embed_device for the measured why)
        return np.ascontiguousarray(a)

    def _mxu(prefix: str) -> Q4KMXUWeight:
        def _i8(a: np.ndarray) -> np.ndarray:
            # sidecars from the first v4 layout stored the 0..63 sub-scale
            # planes as uint8; same bytes, but the kernel wants int8
            # (Mosaic has no uint8->f32 cast)
            return a.view(np.int8) if a.dtype == np.uint8 else a

        parts = (
            _ram(flat[f"{prefix}.packed"]),
            _i8(_ram(flat[f"{prefix}.sub_t"])),
            _i8(_ram(flat[f"{prefix}.min_t"])),
            _ram(flat[f"{prefix}.dd_t"]),
        )
        if prefix == "lm_head":
            # pad the head to the wide kernel tile (pick_bn) so the 152k-row
            # matvec runs at the bigger BN; zero rows dequantize to exactly 0
            # and lm_logits slices them away
            parts = pad_rows(*(np.asarray(a) for a in parts), multiple=1024)
        return Q4KMXUWeight(*(jnp.asarray(a) for a in parts))

    # stage tensor groups on a small pool: the serial loop was mmap->RAM
    # memcpy + PJRT host staging back to back (~1.5 s at 1.7B); both release
    # the GIL and overlap well across groups (the embed thread above already
    # proves concurrent staging is safe)
    from concurrent.futures import ThreadPoolExecutor as _TPE

    def _stage(mine: str):
        if mine == "lm_head":
            return _mxu("lm_head")
        if mine in _QUANTIZABLE:
            return _mxu(f"layers.{mine}")
        return jnp.asarray(flat[f"layers.{mine}"], dtype=jnp.float32)

    group_names = list(_LAYER_MAP) + ["lm_head"]
    with _TPE(max_workers=4, thread_name_prefix="stage") as _pool:
        staged = dict(zip(group_names, _pool.map(_stage, group_names)))
    layers = {mine: staged[mine] for mine in _LAYER_MAP}
    _logger.info("int4 load: layer upload dispatched at +%.2fs", _time.time() - _t0)
    _embed_thread.join()
    if "error" in _embed_box:
        raise _embed_box["error"]
    embed_dev = _embed_box["embed"]
    out = {
        "embed": embed_dev,
        "layers": layers,
        "final_norm": jnp.asarray(np.ascontiguousarray(flat["final_norm"]), dtype=jnp.float32),
        "lm_head": staged["lm_head"],
    }
    # uploads complete asynchronously — later init work (prefill dequant,
    # generator jit bring-up) overlaps the transfer; XLA orders any consumer
    # after it. QWEN3_INIT_BLOCK_UPLOAD=1 restores the barrier for profiling.
    import os as _os

    if _os.environ.get("QWEN3_INIT_BLOCK_UPLOAD", "0") != "0":
        jax.block_until_ready(out["lm_head"].packed)
        _logger.info("int4 load: device upload done at +%.2fs", _time.time() - _t0)
    else:
        _logger.info("int4 load: upload dispatched (async) at +%.2fs", _time.time() - _t0)
    return out


def dequant_prefill_params(params: dict) -> dict:
    """One-time bf16 dense copy of quantized layer weights for PREFILL
    programs.

    Prefill is MXU-compute-bound; running it through Q4KMXU containers made
    every prefill call re-materialize the dequantized weights (~50-80 ms on
    v5e), and the Int8Weight path's per-matmul activation quant + rescale
    runs the 0.6B aligner prefill at ~12% of the MXU (39 ms vs 12 ms for an
    equivalent dense-bf16 prefill). Dequanting once at init trades HBM
    (2 B/param) for that per-call cost. Embed, norms and the lm_head (a
    matvec at one row — the int4 kernel path) are shared with the decode
    params by reference."""
    from ..ops.pallas_q4k import Q4KMXUWeight, dequant_mxu
    from ..ops.qtensor import Int8Weight, Q4Weight, dequant_q4

    def _leaf(v):
        if isinstance(v, Q4KMXUWeight):
            return dequant_mxu(v, dtype=jnp.bfloat16)
        if isinstance(v, Q4Weight):
            return dequant_q4(v, dtype=jnp.bfloat16)
        if isinstance(v, Int8Weight):
            return (v.q.astype(jnp.float32) * v.scale[..., None]).astype(jnp.bfloat16)
        return v

    @jax.jit
    def _dense(layers):
        return {k: _leaf(v) for k, v in layers.items()}

    return dict(params, layers=_dense(params["layers"]))


def save_decoder_gguf(
    path: str,
    cfg: TextDecoderConfig,
    params: dict,
    tokenizer: BPETokenizer,
    *,
    quant: str = "q4_k",  # "q4_k" | "f16" | "f32" | "q8_0"
    arch: str = "qwen3vl",
) -> None:
    """Write a decoder checkpoint our loader (and llama.cpp) can read.

    Matrix weights get `quant`; norms stay f32; token_embd/output get q6_k
    under q4_k mode (the llama.cpp q4_k_m convention) or `quant` otherwise.

    The file lands atomically (tmp + rename): quantizing a large model takes
    minutes, and an interrupted save must not leave a truncated GGUF that a
    later run would try to parse.
    """
    tmp_path = path + ".tmp"
    w = GGUFWriter(tmp_path, arch=arch)
    w.add_u32(f"{arch}.block_count", cfg.num_layers)
    w.add_u32(f"{arch}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{arch}.attention.head_count", cfg.num_heads)
    w.add_u32(f"{arch}.attention.head_count_kv", cfg.num_kv_heads)
    w.add_u32(f"{arch}.attention.key_length", cfg.head_dim)
    w.add_u32(f"{arch}.attention.value_length", cfg.head_dim)
    w.add_u32(f"{arch}.feed_forward_length", cfg.intermediate_size)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    w.add_f32(f"{arch}.rope.freq_base", cfg.rope_theta)
    w.add_string("tokenizer.ggml.model", "gpt2")
    w.add_string("tokenizer.ggml.pre", "qwen2")
    w.add_str_array("tokenizer.ggml.tokens", tokenizer.tokens)
    w.add_str_array(
        "tokenizer.ggml.merges",
        [f"{a} {b}" for (a, b), _ in sorted(tokenizer.merge_ranks.items(), key=lambda kv: kv[1])],
    )
    types = [3 if t in tokenizer.special_tokens else 1 for t in tokenizer.tokens]
    w.add_i32_array("tokenizer.ggml.token_type", types)
    if tokenizer.eos_token_id is not None:
        w.add_u32("tokenizer.ggml.eos_token_id", tokenizer.eos_token_id)

    mat_type = {"q4_k": q.GGML_Q4_K, "q8_0": q.GGML_Q8_0, "f16": q.GGML_F16, "f32": q.GGML_F32}[quant]
    embd_type = q.GGML_Q6_K if quant == "q4_k" else mat_type

    def np32(x):
        return np.asarray(x, dtype=np.float32)

    def rowsafe(t, arr):
        return t if arr.shape[-1] % q.QUANT_SIZES[t][0] == 0 else q.GGML_F16

    embed = np32(params["embed"])
    w.add_tensor("token_embd.weight", embed, rowsafe(embd_type, embed))
    w.add_tensor("output_norm.weight", np32(params["final_norm"]), q.GGML_F32)
    head = np32(params["lm_head"])
    w.add_tensor("output.weight", head, rowsafe(embd_type, head))
    for mine, suffix in _LAYER_MAP.items():
        stacked = params["layers"][mine]
        if isinstance(stacked, Q4Weight):
            raise ValueError("save_decoder_gguf expects dense params (dequantize first)")
        for i in range(cfg.num_layers):
            arr = np32(stacked[i])
            t = rowsafe(mat_type, arr) if mine in _QUANTIZABLE else q.GGML_F32
            w.add_tensor(f"blk.{i}.{suffix}", arr, t)
    w.write()
    import os as _os

    _os.replace(tmp_path, path)


def fuse_layer_weights(params: dict) -> dict:
    """Fuse per-layer [q|k|v] and [gate|up] projections into single weights.

    Column-parallel concat along the output dim: one HBM stream + one kernel
    launch where there were three/two. Works for dense stacked [L, N, K]
    arrays and stacked Q4Weight (planar packing concatenates row-wise, so
    the packed planes concat the same way).
    """

    def cat(ws):
        from ..ops.pallas_q4k import Q4KMXUWeight

        if isinstance(ws[0], Q4KMXUWeight):
            # channel-pair rows concat along the channel axis (every piece
            # has an even channel count, so nibble pairs never straddle)
            return Q4KMXUWeight(
                packed=jnp.concatenate([w.packed for w in ws], axis=-2),
                sub_t=jnp.concatenate([w.sub_t for w in ws], axis=-1),
                min_t=jnp.concatenate([w.min_t for w in ws], axis=-1),
                dd_t=jnp.concatenate([w.dd_t for w in ws], axis=-1),
            )
        if isinstance(ws[0], Q4Weight):
            return Q4Weight(
                packed=jnp.concatenate([w.packed for w in ws], axis=-2),
                scale=jnp.concatenate([w.scale for w in ws], axis=-2),
                minv=jnp.concatenate([w.minv for w in ws], axis=-2),
            )
        if isinstance(ws[0], Int8Weight):
            return Int8Weight(
                q=jnp.concatenate([w.q for w in ws], axis=-2),
                scale=jnp.concatenate([w.scale for w in ws], axis=-1),
            )
        return jnp.concatenate(ws, axis=-2)

    layers = dict(params["layers"])
    if "q_proj" in layers:
        layers["qkv_proj"] = cat([layers.pop("q_proj"), layers.pop("k_proj"), layers.pop("v_proj")])
    if "gate_proj" in layers:
        layers["gateup_proj"] = cat([layers.pop("gate_proj"), layers.pop("up_proj")])
    return dict(params, layers=layers)


# --------------------------------------------------------------------------
# encoder safetensors
# --------------------------------------------------------------------------


def _flatten(tree: dict, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in tree.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, name + "."))
        else:
            out[name] = np.asarray(v)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    out: dict = {}
    for name, v in flat.items():
        parts = name.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def save_encoder_safetensors(path: str, cfg: AudioEncoderConfig, params: dict) -> None:
    from safetensors.numpy import save_file

    flat = {k: np.asarray(v, dtype=np.float32) for k, v in _flatten(params).items()}
    save_file(flat, path, metadata={"config": json.dumps(asdict(cfg))})


def load_encoder_safetensors(
    path: str, *, dtype=jnp.float32, as_numpy: bool = False
) -> tuple[AudioEncoderConfig, dict]:
    """`as_numpy=True` keeps params on the host — required when they will be
    quantized before upload (downloading device arrays back is the slow
    direction on remote-attached TPUs)."""
    from safetensors import safe_open
    from safetensors.numpy import load_file

    with safe_open(path, framework="numpy") as f:
        meta = f.metadata() or {}
    cfg = AudioEncoderConfig(**json.loads(meta["config"])) if "config" in meta else AudioEncoderConfig()
    flat = load_file(path)
    if as_numpy:
        tree = _unflatten({k: np.asarray(v, dtype=np.float32) for k, v in flat.items()})
    else:
        tree = _unflatten({k: jnp.asarray(v, dtype=dtype) for k, v in flat.items()})
    return cfg, tree


_ENC_Q4_TOP = ("conv_out", "proj1_w", "proj2_w")
_ENC_Q4_LAYER = ("q_w", "k_w", "v_w", "o_w", "fc1_w", "fc2_w")


def load_encoder_quantized(
    path: str, *, group: int = 32, kind: str = "int4"
) -> tuple[AudioEncoderConfig, dict]:
    """Encoder safetensors -> weight-only quantized params, cached in a
    `.int4/` or `.int8/` per-tensor sidecar. Host packing of the 1.3 GB
    fp32 file costs ~14 s on this one-core host (measured: 16 s of a 23 s
    engine init); the sidecar reload mmaps straight into device uploads.

    kinds (the reference's encoder precision ladder,
    04-Quantize-ASR-Encoder.py): "int4" = group-asymmetric 4-bit
    (MatMulNBits block analogue), "int8" = per-channel symmetric int8 (the
    quantize_dynamic per-channel QUInt8 analogue, on the MXU's native int8
    path)."""
    from ..formats.quants import pack_q4_direct
    from ..ops.qtensor import Int8Weight, Q4Weight

    if kind not in ("int4", "int8"):
        raise ValueError(f"unknown encoder quant kind {kind!r}")
    sidecar_dir = Path(path + f".{kind}")
    src_mtime = Path(path).stat().st_mtime
    marker = sidecar_dir / "__config.json"

    if marker.exists() and marker.stat().st_mtime >= src_mtime:
        cfg = AudioEncoderConfig(**json.loads(marker.read_text()))
        flat = {
            f.stem.replace("__", "."): np.load(f, mmap_mode="r")
            for f in _ram_mirror(sidecar_dir).glob("*.npy")
        }
    else:
        cfg, tree = load_encoder_safetensors(path, as_numpy=True)
        flat = dict(_flatten(tree))

        def _int8_parts(w2d: np.ndarray) -> dict:
            amax = np.maximum(np.abs(w2d).max(axis=-1), 1e-10)
            scale = (amax / 127.0).astype(np.float32)
            q8 = np.clip(np.round(w2d / scale[:, None]), -127, 127).astype(np.int8)
            return {"q": q8, "scale": scale}

        def pack_into(name: str) -> None:
            w = flat.pop(name)
            if kind == "int8":
                if w.ndim == 2:
                    parts = _int8_parts(np.asarray(w, np.float32))
                else:  # stacked [L, N, K]
                    ps = [_int8_parts(np.asarray(w[i], np.float32)) for i in range(w.shape[0])]
                    parts = {k: np.stack([p[k] for p in ps]) for k in ps[0]}
            elif w.ndim == 2:
                p = pack_q4_direct(np.asarray(w, np.float32), group=group)
                parts = {"packed": p.packed, "scale": p.scale, "minv": p.minv}
            else:  # stacked [L, N, K]
                ps = [pack_q4_direct(np.asarray(w[i], np.float32), group=group)
                      for i in range(w.shape[0])]
                parts = {
                    "packed": np.stack([p.packed for p in ps]),
                    "scale": np.stack([p.scale for p in ps]),
                    "minv": np.stack([p.minv for p in ps]),
                }
            for k, v in parts.items():
                flat[f"{name}.qw.{k}"] = v

        for name in _ENC_Q4_TOP:
            pack_into(name)
        for name in _ENC_Q4_LAYER:
            pack_into(f"layers.{name}")
        try:
            sidecar_dir.mkdir(exist_ok=True)
            for k, v in flat.items():
                np.save(sidecar_dir / f"{k.replace('.', '__')}.npy", v)
            marker.write_text(json.dumps(asdict(cfg)))
        except OSError:
            pass  # read-only model dir: skip caching

    # rebuild the tree, materializing the quantized containers
    def _q_key(k: str) -> bool:
        return ".qw." in k or ".q4." in k  # .q4. = pre-round-3 sidecar layout

    def _q(name: str, part: str) -> np.ndarray:
        v = flat.get(f"{name}.qw.{part}", flat.get(f"{name}.q4.{part}"))
        return np.ascontiguousarray(v)

    plain = {k: v for k, v in flat.items() if not _q_key(k)}
    tree = _unflatten({k: jnp.asarray(np.ascontiguousarray(v), dtype=jnp.float32)
                       for k, v in plain.items()})
    for name in _ENC_Q4_TOP + tuple(f"layers.{n}" for n in _ENC_Q4_LAYER):
        if kind == "int8":
            w = Int8Weight(
                q=jnp.asarray(_q(name, "q")),
                scale=jnp.asarray(_q(name, "scale"), dtype=jnp.float32),
            )
        else:
            w = Q4Weight(
                packed=jnp.asarray(_q(name, "packed")),
                scale=jnp.asarray(_q(name, "scale"), dtype=jnp.float32),
                minv=jnp.asarray(_q(name, "minv"), dtype=jnp.float32),
            )
        node = tree
        parts = name.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = w
    return cfg, tree


def quantize_encoder_params(params: dict, *, group: int = 32, kind: str = "int4") -> dict:
    """Weight-only quantization of the encoder's matmul weights.

    kind="int4": the reference's MatMulNBits int4 ONNX stage
    (04-Quantize-ASR-Encoder.py:53-60); kind="int8": its per-channel
    dynamic-int8 stage (:36-43), as symmetric per-channel Int8Weight."""
    from ..ops.qtensor import Int8Weight, quantize_dense

    def quant(w2d: np.ndarray):
        if kind == "int8":
            amax = np.maximum(np.abs(w2d).max(axis=-1), 1e-10)
            scale = (amax / 127.0).astype(np.float32)
            q8 = np.clip(np.round(w2d / scale[:, None]), -127, 127).astype(np.int8)
            return Int8Weight(q=jnp.asarray(q8), scale=jnp.asarray(scale))
        return quantize_dense(w2d, group=group)

    out = dict(params)
    out["conv_out"] = quant(np.asarray(params["conv_out"], dtype=np.float32))
    out["proj1_w"] = quant(np.asarray(params["proj1_w"], dtype=np.float32))
    out["proj2_w"] = quant(np.asarray(params["proj2_w"], dtype=np.float32))
    layers = dict(params["layers"])
    for name in ("q_w", "k_w", "v_w", "o_w", "fc1_w", "fc2_w"):
        stacked = np.asarray(params["layers"][name], dtype=np.float32)
        layers[name] = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[quant(stacked[i]) for i in range(stacked.shape[0])],
        )
    out["layers"] = layers
    return out


# --------------------------------------------------------------------------
# checkpoint directories (the reference's model_dir convention)
# --------------------------------------------------------------------------


def save_thinker_config(model_dir: str, thinker: ThinkerConfig) -> None:
    cfg = {
        "audio_config": asdict(thinker.audio),
        "text_config": asdict(thinker.text),
        "audio_token_id": thinker.audio_token_id,
        "audio_start_token_id": thinker.audio_start_token_id,
        "im_start_token_id": thinker.im_start_token_id,
        "im_end_token_id": thinker.im_end_token_id,
        "asr_text_token_id": thinker.asr_text_token_id,
        "audio_end_token_id": thinker.audio_end_token_id,
        "eos_token_ids": list(thinker.eos_token_ids),
        "timestamp_token_id": thinker.timestamp_token_id,
        "timestamp_segment_ms": thinker.timestamp_segment_ms,
    }
    Path(model_dir, "config.json").write_text(json.dumps(cfg, indent=2))


def load_thinker_config(model_dir: str) -> ThinkerConfig:
    p = Path(model_dir, "config.json")
    if not p.exists():
        return ThinkerConfig()
    raw = json.loads(p.read_text())
    return ThinkerConfig(
        audio=AudioEncoderConfig(**raw.get("audio_config", {})),
        text=TextDecoderConfig(**raw.get("text_config", {})),
        audio_token_id=raw.get("audio_token_id", 151646),
        audio_start_token_id=raw.get("audio_start_token_id", 151647),
        im_start_token_id=raw.get("im_start_token_id", 151644),
        im_end_token_id=raw.get("im_end_token_id", 151645),
        asr_text_token_id=raw.get("asr_text_token_id", 151704),
        audio_end_token_id=raw.get("audio_end_token_id", 151648),
        eos_token_ids=tuple(raw.get("eos_token_ids", (151645, 151643))),
        timestamp_token_id=raw.get("timestamp_token_id", 151705),
        timestamp_segment_ms=raw.get("timestamp_segment_ms", 80.0),
    )
