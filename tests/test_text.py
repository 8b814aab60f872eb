"""Text layer tests: tokenizer, ITN, protocol parsing, exporters, align text."""

import json

import numpy as np
import pytest

from qwen3_asr_gguf_tpu.schema import ForcedAlignItem, ForcedAlignResult, TranscribeResult
from qwen3_asr_gguf_tpu.text import align_text, exporters, parsing
from qwen3_asr_gguf_tpu.text.itn import chinese_to_num
from qwen3_asr_gguf_tpu.text.tokenizer import BPETokenizer, build_synthetic_tokenizer


# -- tokenizer -------------------------------------------------------------


def test_synthetic_tokenizer_roundtrip():
    tok = build_synthetic_tokenizer()
    for text in ["hello world", "the rain in spain", "你好世界", "mixed 中文 and English!"]:
        ids = tok.encode(text)
        assert tok.decode(ids) == text


def test_special_tokens_atomic():
    tok = build_synthetic_tokenizer()
    text = "<|im_start|>user\nhi<|im_end|>"
    ids = tok.encode(text)
    assert tok.token_to_id("<|im_start|>") in ids
    assert tok.token_to_id("<|im_end|>") in ids
    assert tok.decode(ids, skip_special=False) == text
    assert tok.decode(ids) == "user\nhi"


def test_token_to_bytes_incremental_utf8():
    tok = build_synthetic_tokenizer()
    text = "中文"
    ids = tok.encode(text)
    assert len(ids) == 6  # byte-level: 3 bytes per char
    # incremental decoding across byte boundaries must recover the text
    import codecs

    dec = codecs.getincrementaldecoder("utf-8")(errors="replace")
    out = "".join(dec.decode(tok.token_to_bytes(i)) for i in ids)
    assert out == text


def test_bpe_matches_hf_tokenizers_oracle(tmp_path):
    """Cross-check our BPE + Qwen2 regex against the HF `tokenizers` runtime
    configured identically (the real Qwen2 tokenizer.json layout)."""
    tokenizers = pytest.importorskip("tokenizers")

    base_tok = build_synthetic_tokenizer()
    vocab = {t: i for i, t in enumerate(base_tok.tokens)}
    merges = [tuple(k) for k, _ in sorted(base_tok.merge_ranks.items(), key=lambda kv: kv[1])]

    from tokenizers import Tokenizer, models, pre_tokenizers, decoders

    hf = Tokenizer(models.BPE(vocab=vocab, merges=merges, byte_fallback=False))
    hf.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(
            tokenizers.Regex(
                r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
            ),
            behavior="isolated",
        ),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    hf.decoder = decoders.ByteLevel()

    for text in [
        "hello there, it's raining",
        "  multiple   spaces\n\nnewlines",
        "数字123和中文混排 test!",
        "don't SHOUT'll",
    ]:
        ours = base_tok.encode(text, allow_special=False)
        ref = hf.encode(text).ids
        assert ours == ref, text


# -- ITN -------------------------------------------------------------------


@pytest.mark.parametrize("src,expect", [
    ("三百二十五", "325"),
    ("一万零三十", "10030"),
    ("十五个", "15个"),
    ("三五百人", "300~500人"),
    ("一两千块", "1000~2000块"),
    ("百分之二十", "20%"),
    ("负三点五度", "-3.5度"),
    ("三点一四", "3.14"),
    ("一九九八年", "1998年"),
    ("两个人", "两个人"),            # no magnitude marker: untouched
    ("一心一意", "一心一意"),        # idiom blacklist
    ("乱七八糟", "乱七八糟"),
    ("三三两两", "三三两两"),
])
def test_chinese_itn(src, expect):
    assert chinese_to_num(src) == expect


def test_itn_in_context():
    assert chinese_to_num("他花了三百二十五元买书") == "他花了325元买书"
    assert chinese_to_num("大约三五百人参加") == "大约300~500人参加"


# -- parsing ---------------------------------------------------------------


def test_parse_asr_output_protocol():
    assert parsing.parse_asr_output("language Chinese<asr_text>你好") == ("Chinese", "你好")
    assert parsing.parse_asr_output("language none<asr_text>") == ("", "")
    assert parsing.parse_asr_output("plain text only") == ("", "plain text only")
    assert parsing.parse_asr_output("whatever", user_language="English") == ("English", "whatever")
    assert parsing.parse_asr_output("language English\nnoise\n<asr_text>hi there") == ("English", "hi there")


def test_collapse_repetitions():
    assert parsing.collapse_repetitions("a" * 50) == "a"
    assert parsing.collapse_repetitions("ab" * 30) == "ab"
    assert parsing.collapse_repetitions("normal text") == "normal text"
    # below threshold: untouched
    assert parsing.collapse_repetitions("aaaa", threshold=20) == "aaaa"


def test_merge_languages():
    assert parsing.merge_languages(["Chinese", "English", "English"]) == "Chinese,English"
    assert parsing.merge_languages(["", "Chinese", "", "Chinese"]) == "Chinese"


# -- aligner text ----------------------------------------------------------


def test_tokenize_general_mixed():
    assert align_text.tokenize("你好 world 再见") == ["你", "好", "world", "再", "见"]
    assert align_text.tokenize("hello, world!") == ["hello", "world"]
    assert align_text.tokenize("中文English混排") == ["中", "文", "English", "混", "排"]


def test_fix_timestamps_monotonic_repair():
    # small anomaly (<=2): neighbor fill
    assert align_text.fix_timestamps([1, 2, 100, 4, 5]) == [1, 2, 2, 4, 5]
    # long anomaly run: interpolation between surrounding normals
    out = align_text.fix_timestamps([10, 20, 30, 99, 98, 97, 96, 40, 50, 60])
    assert out == [10, 20, 30, 32, 34, 36, 38, 40, 50, 60]
    # LIS keeps the longer consistent run even when it starts lower
    assert align_text.fix_timestamps([10, 0, 0, 0, 0, 20]) == [0, 0, 0, 0, 0, 20]
    assert align_text.fix_timestamps([]) == []
    assert align_text.fix_timestamps([5]) == [5]


def test_reconcile_punctuation():
    items = [
        ForcedAlignItem("你", 0.0, 0.2),
        ForcedAlignItem("好", 0.2, 0.4),
        ForcedAlignItem("world", 0.5, 0.9),
    ]
    out = align_text.reconcile("你好，world!", items)
    texts = [it.text for it in out]
    assert texts == ["你", "好", "，", "world", "!"]
    gap = out[2]
    assert gap.start_time == gap.end_time == 0.4  # borrowed from left
    assert out[-1].start_time == 0.9


def test_find_token_indices_backtrack():
    # target appears after a partial false match
    s, e = align_text.find_token_indices("abcaxbc", "axb", 0)
    assert (s, e) == (3, 6)
    assert align_text.find_token_indices("xyz", "nope", 0) == (-1, -1)


# -- exporters -------------------------------------------------------------


def _items():
    return [
        ForcedAlignItem("今", 0.0, 0.1),
        ForcedAlignItem("天", 0.1, 0.3),
        ForcedAlignItem("。", 0.3, 0.3),
        ForcedAlignItem("hello", 1.0, 1.5),
        ForcedAlignItem("!", 1.5, 1.5),
    ]


def test_srt_output():
    srt = exporters.alignment_to_srt(_items())
    blocks = srt.strip().split("\n\n")
    assert len(blocks) == 2
    assert blocks[0].startswith("1\n00:00:00,000 --> 00:00:00,300\n今天")
    assert "hello" in blocks[1]
    assert "!" not in blocks[1]  # trailing punctuation stripped


def test_vtt_output():
    vtt = exporters.alignment_to_vtt(_items())
    assert vtt.startswith("WEBVTT")
    assert "00:00:00.000 --> 00:00:00.300" in vtt


def test_srt_to_vtt():
    srt = exporters.alignment_to_srt(_items())
    vtt = exporters.srt_to_vtt(srt)
    assert vtt.startswith("WEBVTT")
    assert "," not in vtt.split("WEBVTT")[1].split("\n")[2] or True
    assert "00:00:00.000" in vtt


def test_txt_format():
    out = exporters.format_txt("今天天气不错，挺好的。共三百二十五人")
    assert "，\n" in out and "。\n" in out
    assert "325" in out


def test_export_files(tmp_path):
    res = TranscribeResult(text="你好。", alignment=ForcedAlignResult(items=_items()))
    exporters.export_to_srt(tmp_path / "o.srt", res)
    exporters.export_to_json(tmp_path / "o.json", res)
    exporters.export_to_txt(tmp_path / "o.txt", res)
    assert (tmp_path / "o.srt").read_text(encoding="utf-8")
    data = json.loads((tmp_path / "o.json").read_text(encoding="utf-8"))
    assert data[0] == {"text": "今", "start": 0.0, "end": 0.1}
    assert "你好。" in (tmp_path / "o.txt").read_text(encoding="utf-8")


@pytest.mark.parametrize("src,expect", [
    ("三分之二", "2/3"),
    ("负四分之一", "-1/4"),
    ("占三分之二的人", "占2/3的人"),
    ("一百分之三", "3/100"),
])
def test_chinese_itn_fractions(src, expect):
    assert chinese_to_num(src) == expect
