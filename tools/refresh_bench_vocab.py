"""Refresh the tokenizer metadata of cached synthetic bench checkpoints.

The synthetic tokenizer gained real BPE merges for its CJK filler pieces
(text/tokenizer.py build_synthetic_tokenizer) so that single-CJK-char
tokens round-trip through encode() — the property the speculative-align
word table keys on (runtime/aligner.build_word_cls_table), matching real
Qwen3 vocab behavior. Token ids and their decoded text are UNCHANGED, so
cached tensor data stays valid; only tokenizer.ggml.{tokens,merges} need
rewriting. This tool rewrites them in place (atomic replace), preserves
the file mtime (the tensor sidecars key their freshness on it; tensors
did not change), and drops the pickled meta sidecars + word-class tables
so they rebuild from the new vocab.

Usage: python tools/refresh_bench_vocab.py [.bench_cache/<preset> ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qwen3_asr_gguf_tpu.formats import GGUFReader, GGUFWriter  # noqa: E402
from qwen3_asr_gguf_tpu.formats.__main__ import _copy_kv  # noqa: E402
from qwen3_asr_gguf_tpu.text.tokenizer import build_synthetic_tokenizer  # noqa: E402


def refresh(path: Path) -> bool:
    r = GGUFReader(str(path))
    old_tokens = list(r.kv.get("tokenizer.ggml.tokens", []))
    if not old_tokens:
        print(f"{path}: no vocab, skipped")
        return False
    tok = build_synthetic_tokenizer(len(old_tokens))
    if list(tok.tokens) == old_tokens:
        print(f"{path}: vocab already current")
        return False
    # ids must keep decoding to the same text (tensor rows are per-id)
    assert len(tok.tokens) == len(old_tokens)
    st = os.stat(path)
    tmp = path.with_suffix(path.suffix + ".vocabtmp")
    w = GGUFWriter(str(tmp), arch=r.kv.get("general.architecture", "qwen3vl"))
    _copy_kv(
        w, r.kv,
        override={
            "tokenizer.ggml.tokens": list(tok.tokens),
            "tokenizer.ggml.merges": [
                f"{a} {b}" for (a, b), _ in sorted(
                    tok.merge_ranks.items(), key=lambda kv: kv[1]
                )
            ],
        },
    )
    for name, ti in r.tensors.items():
        w.add_raw_tensor(name, r.tensor_bytes(name), ti.shape, ti.ggml_type)
    w.write()
    del r
    tmp.replace(path)
    os.utime(path, (st.st_atime, st.st_mtime))  # sidecar tensors still fresh
    # meta pickles cache the OLD tokenizer at an mtime we just preserved;
    # word-class tables were built from it too — both rebuild on next load
    base = path.parent
    for p in list(base.glob("*/__meta.pkl")) + list(base.glob("*/__meta*")) + \
             list(base.glob("align_word_cls_*.npy")):
        try:
            p.unlink()
            print(f"  dropped {p.name}")
        except OSError:
            pass
    print(f"{path}: vocab refreshed ({len(tok.merge_ranks)} merges)")
    return True


def main(argv: list[str]) -> int:
    dirs = [Path(a) for a in argv] or [
        Path(__file__).resolve().parent.parent / ".bench_cache" / "qwen3-asr-1.7b"
    ]
    n = 0
    for d in dirs:
        for gguf in sorted(d.glob("*.gguf")):
            n += refresh(gguf)
    print(f"{n} file(s) rewritten")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
