"""Apply the CJK lm_head bias to an already-built synthetic bench checkpoint.

make_synthetic_checkpoint now shrinks non-single-CJK lm_head rows so a
random-weight decoder samples a plausible per-character Chinese transcript
(export/convert._bias_lm_head_cjk) — the workload the reference's own
benchmark measures. This tool retrofits the cached .bench_cache checkpoint
without the ~16 min full rebuild: dequant output.weight, scale rows,
requant, rewrite the GGUF. The file mtime bumps, so tensor sidecars and
meta pickles rebuild themselves on the next engine load.

Usage: python tools/bias_bench_lm_head.py [path/to/qwen3_asr_llm.q4_k.gguf]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qwen3_asr_gguf_tpu.formats import GGUFReader, GGUFWriter  # noqa: E402
from qwen3_asr_gguf_tpu.formats import quants as q  # noqa: E402
from qwen3_asr_gguf_tpu.formats.__main__ import _copy_kv  # noqa: E402
from qwen3_asr_gguf_tpu.text.tokenizer import BPETokenizer  # noqa: E402
from qwen3_asr_gguf_tpu.export.convert import cjk_word_token_ids  # noqa: E402


def main(argv: list[str]) -> int:
    path = Path(argv[0]) if argv else (
        Path(__file__).resolve().parent.parent
        / ".bench_cache" / "qwen3-asr-1.7b" / "qwen3_asr_llm.q4_k.gguf"
    )
    r = GGUFReader(str(path))
    tok = BPETokenizer(
        list(r.kv["tokenizer.ggml.tokens"]),
        list(r.kv["tokenizer.ggml.merges"]),
        list(r.kv["tokenizer.ggml.token_type"]),
        eos_token_id=int(r.kv.get("tokenizer.ggml.eos_token_id", 0)),
    )
    word_ids = cjk_word_token_ids(tok)
    print(f"{len(word_ids)} single-CJK word ids of {tok.n_vocab}")

    ti = r.tensors["output.weight"]
    head = q.dequantize(r.tensor_bytes(name := "output.weight"), ti.ggml_type, ti.shape)
    head = np.asarray(head, dtype=np.float32)
    assert head.shape[0] == tok.n_vocab, head.shape
    scale = np.full(head.shape[0], 0.3, dtype=np.float32)
    scale[word_ids] = 1.0
    head *= scale[:, None]
    new_bytes = q.quantize(head, ti.ggml_type)

    tmp = path.with_suffix(path.suffix + ".biastmp")
    w = GGUFWriter(str(tmp), arch=r.kv.get("general.architecture", "qwen3vl"))
    _copy_kv(w, r.kv)
    for tname, t in r.tensors.items():
        data = new_bytes if tname == name else r.tensor_bytes(tname)
        w.add_raw_tensor(tname, data, t.shape, t.ggml_type)
    w.write()
    del r
    tmp.replace(path)  # mtime bumps -> sidecars/meta rebuild on next load
    print(f"rewrote {path} with CJK-biased lm_head")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
