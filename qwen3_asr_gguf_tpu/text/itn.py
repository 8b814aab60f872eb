"""Chinese inverse text normalization (spoken numerals -> Arabic digits).

Same capability class as the reference's chinese_itn
(qwen_asr_gguf/inference/chinese_itn.py: regex-driven conversion with an
idiom blacklist, range expressions like 三五百人 -> 300~500人, percent and
decimal handling), implemented independently.

Conversion policy: a span is rewritten only when it clearly denotes a
number — it contains a magnitude/decimal marker (十百千万亿点 / 百分之) or
is a digit-string of length >= 3 (years, phone numbers). Idioms and
ordinary prose stay untouched.
"""

from __future__ import annotations

import re

DIGITS = {"零": 0, "〇": 0, "一": 1, "二": 2, "两": 2, "三": 3, "四": 4,
          "五": 5, "六": 6, "七": 7, "八": 8, "九": 9}
SMALL_UNITS = {"十": 10, "百": 100, "千": 1000}
BIG_UNITS = {"万": 10_000, "亿": 100_000_000}

# common idioms / fixed expressions that contain numeral characters
IDIOM_BLACKLIST = {
    "一心一意", "一模一样", "一毛一样", "三心二意", "四分五裂", "乱七八糟",
    "五湖四海", "七上八下", "九牛一毛", "十全十美", "一五一十", "五花八门",
    "千方百计", "千军万马", "万无一失", "一塌糊涂", "不三不四", "说三道四",
    "丢三落四", "朝三暮四", "三言两语", "七嘴八舌", "千山万水", "万水千山",
    "五颜六色", "一帆风顺", "一举两得", "独一无二", "数一数二", "百发百中",
    "半斤八两", "三三两两", "一清二楚", "一干二净", "七零八落", "横七竖八",
}

_NUM_CHARS = "零〇一二两三四五六七八九十百千万亿"
_SPAN_RE = re.compile(
    rf"(负?[{_NUM_CHARS}]+分之[{_NUM_CHARS}点]+"  # fractions 三分之二
    rf"|负?百分之[{_NUM_CHARS}点]+"
    rf"|负?[{_NUM_CHARS}]+(?:点[零〇一二两三四五六七八九]+)?)"
)


def _parse_cardinal(s: str) -> int | None:
    """Positional parse of 三百二十五 / 十五 / 一万零三 style numerals."""
    if not s:
        return None
    total = 0
    section = 0  # value below the current big unit
    current = 0  # value below the current small unit
    seen_any = False
    for ch in s:
        if ch in ("零", "〇"):
            seen_any = True  # zeros only separate positions
        elif ch in DIGITS:
            current = current * 10 + DIGITS[ch]
            seen_any = True
        elif ch in SMALL_UNITS:
            mult = SMALL_UNITS[ch]
            section += (current if current else 1) * mult
            current = 0
            seen_any = True
        elif ch in BIG_UNITS:
            mult = BIG_UNITS[ch]
            section += current
            if section == 0:
                section = 1
            total = (total + section) * mult
            section = 0
            current = 0
            seen_any = True
        else:
            return None
    if not seen_any:
        return None
    return total + section + current


def _pure_digit_string(s: str) -> str | None:
    """一九九八 -> '1998' (every char a digit incl. 零)."""
    out = []
    for ch in s:
        if ch in ("零", "〇"):
            out.append("0")
        elif ch in DIGITS and ch != "两":
            out.append(str(DIGITS[ch]))
        else:
            return None
    return "".join(out)


def _convert_span(s: str) -> str | None:
    neg = s.startswith("负")
    if neg:
        s = s[1:]
    percent = s.startswith("百分之")
    if percent:
        s = s[len("百分之"):]
    elif "分之" in s:
        # fraction: X分之Y -> Y/X
        denom_s, _, numer_s = s.partition("分之")
        denom = _parse_cardinal(denom_s)
        numer = _parse_cardinal(numer_s)
        if denom is None or numer is None:
            return None
        return f"{'-' if neg else ''}{numer}/{denom}"

    # decimal part
    frac = ""
    if "点" in s:
        s, _, frac_part = s.partition("点")
        digits = _pure_digit_string(frac_part)
        if digits is None:
            return None
        frac = "." + digits

    has_unit = any(c in s for c in "十百千万亿")

    # range expression: exactly two adjacent digit chars before a unit
    # (三五百 -> 300~500, 一两千 -> 1000~2000)
    if has_unit and len(s) >= 3 and s[0] in DIGITS and s[1] in DIGITS and s[2] in "十百千万亿":
        lo = _parse_cardinal(s[0] + s[2:])
        hi = _parse_cardinal(s[1] + s[2:])
        if lo is not None and hi is not None and lo < hi and not frac:
            return f"-{lo}~{hi}" if neg else f"{lo}~{hi}"

    if has_unit or frac or percent:
        val = _parse_cardinal(s) if s else 0
        if val is None:
            return None
        out = f"{val}{frac}"
    else:
        digits = _pure_digit_string(s)
        if digits is None or len(digits) < 3:
            return None
        out = digits

    if neg:
        out = "-" + out
    if percent:
        out += "%"
    return out


def chinese_to_num(text: str) -> str:
    """Rewrite spoken Chinese numerals in `text` to Arabic digits."""
    if not text:
        return text

    def repl(m: re.Match) -> str:
        span = m.group(0)
        # idiom guard: if the span sits inside a blacklisted idiom, skip
        start = max(0, m.start() - 3)
        context = text[start : m.end() + 3]
        for idiom in IDIOM_BLACKLIST:
            if idiom in context:
                return span
        out = _convert_span(span)
        return out if out is not None else span

    return _SPAN_RE.sub(repl, text)
