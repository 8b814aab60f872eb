"""GGUF container roundtrip tests (+ optional cross-check vs reference gguf-py)."""

import sys
from pathlib import Path

import numpy as np
import pytest

from qwen3_asr_gguf_tpu.formats import GGUFReader, GGUFWriter, get_token_embeddings_gguf
from qwen3_asr_gguf_tpu.formats import quants as q

REF_GGUF = Path("/root/reference/qwen_asr_gguf/export")


def _write_sample(path, rng):
    w = GGUFWriter(str(path), arch="qwen3vl")
    w.add_string("general.name", "test-model")
    w.add_u32("qwen3vl.block_count", 2)
    w.add_f32("qwen3vl.rope.freq_base", 5e6)
    w.add_bool("tokenizer.ggml.add_bos_token", False)
    w.add_str_array("tokenizer.ggml.tokens", ["<a>", "<b>", "hello"])
    w.add_i32_array("tokenizer.ggml.token_type", [3, 3, 1])

    embd = rng.standard_normal((32, 256)).astype(np.float32)
    mat = rng.standard_normal((64, 256)).astype(np.float32)
    norm = rng.standard_normal(256).astype(np.float32)
    w.add_tensor("token_embd.weight", embd, q.GGML_Q4_K)
    w.add_tensor("blk.0.attn_q.weight", mat, q.GGML_Q4_K)
    w.add_tensor("blk.0.attn_norm.weight", norm, q.GGML_F32)
    w.add_tensor("blk.0.ffn_up.weight", mat.astype(np.float16), q.GGML_F16)
    w.write()
    return embd, mat, norm


def test_roundtrip(tmp_path, rng):
    path = tmp_path / "m.gguf"
    embd, mat, norm = _write_sample(path, rng)
    r = GGUFReader(str(path))

    assert r.kv["general.architecture"] == "qwen3vl"
    assert r.kv["qwen3vl.block_count"] == 2
    assert abs(r.kv["qwen3vl.rope.freq_base"] - 5e6) < 1
    assert r.kv["tokenizer.ggml.add_bos_token"] is False
    assert r.kv["tokenizer.ggml.tokens"] == ["<a>", "<b>", "hello"]
    assert list(r.kv["tokenizer.ggml.token_type"]) == [3, 3, 1]

    assert r.tensors["token_embd.weight"].shape == (32, 256)
    assert r.tensors["token_embd.weight"].type_name == "q4_k"
    np.testing.assert_array_equal(r.tensor("blk.0.attn_norm.weight"), norm)
    np.testing.assert_allclose(r.tensor("blk.0.ffn_up.weight"), mat, atol=1e-2)

    # quantized roundtrip == direct quant/dequant
    expect = q.dequantize_q4_k(q.quantize_q4_k(mat), mat.shape)
    np.testing.assert_array_equal(r.tensor("blk.0.attn_q.weight"), expect)

    # packed view
    p = r.packed_q4("blk.0.attn_q.weight")
    np.testing.assert_array_equal(q.unpack_q4(p), expect)


def test_embedding_table_gather(tmp_path, rng):
    path = tmp_path / "m.gguf"
    embd, _, _ = _write_sample(path, rng)
    table = get_token_embeddings_gguf(str(path))
    assert (table.n_vocab, table.n_embd) == (32, 256)
    full = q.dequantize_q4_k(q.quantize_q4_k(embd), embd.shape)
    ids = [0, 5, 31, 5]
    np.testing.assert_array_equal(table[ids], full[ids])
    np.testing.assert_array_equal(table[7], full[7])


@pytest.mark.skipif(not REF_GGUF.exists(), reason="reference gguf-py not mounted")
def test_reference_reader_can_parse_our_file(tmp_path, rng):
    """Interop gate: a file written by our GGUFWriter parses with gguf-py."""
    sys.path.insert(0, str(REF_GGUF))
    try:
        import gguf as refgguf

        path = tmp_path / "m.gguf"
        embd, mat, norm = _write_sample(path, rng)
        rr = refgguf.GGUFReader(str(path))
        fields = {f.name for f in rr.fields.values()}
        assert "general.architecture" in fields
        names = {t.name for t in rr.tensors}
        assert {"token_embd.weight", "blk.0.attn_q.weight", "blk.0.attn_norm.weight"} <= names
        t = next(t for t in rr.tensors if t.name == "blk.0.attn_norm.weight")
        np.testing.assert_array_equal(np.asarray(t.data), norm)
    finally:
        sys.path.remove(str(REF_GGUF))


# -- tooling CLI (reference gguf/scripts analogues) --------------------------


def test_cli_set_metadata_preserves_tensors(tmp_path, rng):
    from qwen3_asr_gguf_tpu.formats.__main__ import main

    src = tmp_path / "m.gguf"
    out = tmp_path / "m2.gguf"
    _write_sample(src, rng)
    rc = main(["set-metadata", str(src), str(out),
               "--set", "general.name=renamed",
               "--set", "qwen3vl.block_count=7"])
    assert rc == 0
    r1, r2 = GGUFReader(str(src)), GGUFReader(str(out))
    assert r2.kv["general.name"] == "renamed"
    assert r2.kv["qwen3vl.block_count"] == 7
    # tensor payloads are passed through bit-identically
    for name in r1.tensors:
        assert bytes(r1.tensor_bytes(name)) == bytes(r2.tensor_bytes(name))
        assert r1.tensors[name].shape == r2.tensors[name].shape
        assert r1.tensors[name].ggml_type == r2.tensors[name].ggml_type


def test_cli_new_metadata_add_remove(tmp_path, rng):
    from qwen3_asr_gguf_tpu.formats.__main__ import main

    src = tmp_path / "m.gguf"
    out = tmp_path / "m2.gguf"
    _write_sample(src, rng)
    rc = main(["new-metadata", str(src), str(out),
               "--set", "custom.flag=true", "--remove", "qwen3vl.rope.freq_base"])
    assert rc == 0
    r2 = GGUFReader(str(out))
    assert r2.kv["custom.flag"] is True
    assert "qwen3vl.rope.freq_base" not in r2.kv


def test_cli_hash_stable(tmp_path, rng, capsys):
    from qwen3_asr_gguf_tpu.formats.__main__ import main

    src = tmp_path / "m.gguf"
    _write_sample(src, rng)
    assert main(["hash", str(src), "--no-tensors"]) == 0
    h1 = capsys.readouterr().out.strip().split()[1]
    assert main(["hash", str(src), "--no-tensors"]) == 0
    h2 = capsys.readouterr().out.strip().split()[1]
    assert h1 == h2 and len(h1) == 64


def test_cli_endian_report(tmp_path, rng, capsys):
    from qwen3_asr_gguf_tpu.formats.__main__ import main

    src = tmp_path / "m.gguf"
    _write_sample(src, rng)
    assert main(["endian", str(src)]) == 0
    assert "little-endian" in capsys.readouterr().out
