"""GGUF inspection / requantization CLI (reference gguf/scripts + script 07).

  python -m qwen3_asr_gguf_tpu.formats dump model.gguf [--tensors] [--kv]
  python -m qwen3_asr_gguf_tpu.formats requant in.f16.gguf out.q4_k.gguf --quant q4_k
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from . import quants
from .gguf import GGUFReader, GGUFWriter


def cmd_dump(args) -> int:
    r = GGUFReader(args.path)
    if args.kv or not args.tensors:
        print("# metadata")
        for k, v in r.kv.items():
            if isinstance(v, (list, np.ndarray)) and len(v) > 8:
                print(f"  {k}: [{len(v)} items] {list(v[:4])}...")
            else:
                print(f"  {k}: {v}")
    if args.tensors or not args.kv:
        print(f"# tensors ({len(r.tensors)})")
        total = 0
        for name, ti in r.tensors.items():
            total += ti.nbytes
            print(f"  {name:40s} {str(ti.shape):>20s} {ti.type_name:>6s} {ti.nbytes/1e6:9.2f} MB")
        print(f"# total payload {total/1e9:.3f} GB")
    return 0


def cmd_requant(args) -> int:
    """f16/f32 GGUF -> block-quantized GGUF (reference 07-Quantize-*.py via
    llama-quantize). 2-D matmul weights get --quant; norms stay f32;
    token_embd/output get q6_k under q4_k (q4_k_m convention)."""
    r = GGUFReader(args.path)
    w = GGUFWriter(args.out, arch=r.kv.get("general.architecture", "qwen3vl"))
    w._kv = []  # rebuild all KV from source
    for k, v in r.kv.items():
        if k == "general.alignment":
            continue
        if isinstance(v, bool):
            w.add_bool(k, v)
        elif isinstance(v, int):
            w.add_u32(k, v) if 0 <= v < 2**32 else w.add_kv(k, 11, v)
        elif isinstance(v, float):
            w.add_f32(k, v)
        elif isinstance(v, str):
            w.add_string(k, v)
        elif isinstance(v, np.ndarray):
            w.add_i32_array(k, v.astype(np.int64).tolist())
        elif isinstance(v, list) and v and isinstance(v[0], str):
            w.add_str_array(k, v)
    w.add_kv("general.alignment", 4, 32)

    mat_type = quants.NAME_TO_TYPE[args.quant]
    embd_type = quants.GGML_Q6_K if args.quant == "q4_k" else mat_type
    n_q = 0
    for name, ti in r.tensors.items():
        data = r.tensor(name, dtype=np.float32)
        if len(ti.shape) == 2 and ti.shape[-1] % quants.QUANT_SIZES[mat_type][0] == 0:
            t = embd_type if name in ("token_embd.weight", "output.weight") else mat_type
            n_q += 1
        else:
            t = quants.GGML_F32
        w.add_tensor(name, data, t)
    w.write()
    print(f"wrote {args.out}: {n_q} tensors quantized to {args.quant}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="qwen3_asr_gguf_tpu.formats")
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump")
    d.add_argument("path")
    d.add_argument("--tensors", action="store_true")
    d.add_argument("--kv", action="store_true")
    q = sub.add_parser("requant")
    q.add_argument("path")
    q.add_argument("out")
    q.add_argument("--quant", default="q4_k", choices=["q4_k", "q8_0", "q6_k", "f16"])
    args = p.parse_args(argv)
    return cmd_dump(args) if args.cmd == "dump" else cmd_requant(args)


if __name__ == "__main__":
    sys.exit(main())
