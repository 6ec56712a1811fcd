"""Inverse text normalization (ITN): spoken Chinese numbers → digits.

Equivalent of the `thuduj12/fst_itn_zh` FST the reference's C++ FunASR
runtime applies to offline results (voice-service/start.py:82-95). Covers
the patterns medical dialogue actually produces: cardinal numbers
(一百二十三 → 123), decimals (三点五 → 3.5), percentages (百分之八十 → 80%),
and common unit contexts (一百二十毫米汞柱, 三十八度五). Pure host-side
string processing.
"""
from __future__ import annotations

import re
from typing import Optional

_DIGITS = {"零": 0, "一": 1, "二": 2, "两": 2, "三": 3, "四": 4,
           "五": 5, "六": 6, "七": 7, "八": 8, "九": 9}
_UNITS = {"十": 10, "百": 100, "千": 1000}
_BIG_UNITS = {"万": 10_000, "亿": 100_000_000}

_NUM_CHARS = "零一二两三四五六七八九十百千万亿"


def _parse_section(s: str) -> Optional[int]:
    """Parse a number below 万 (e.g. 三千五百二十一)."""
    total = 0
    current = 0
    for ch in s:
        if ch in _DIGITS:
            current = current * 10 + _DIGITS[ch] if current else _DIGITS[ch]
        elif ch in _UNITS:
            unit = _UNITS[ch]
            total += (current or 1) * unit
            current = 0
        elif ch == "零":
            continue
        else:
            return None
    return total + current


def parse_cn_number(s: str) -> Optional[int]:
    """整数: handles 万/亿 grouping. Returns None if not parseable."""
    if not s or any(c not in _NUM_CHARS for c in s):
        return None
    # digit-string form like 一二三 (phone numbers): all plain digits
    if all(c in _DIGITS or c == "零" for c in s) and len(s) > 1:
        digit_map = {**_DIGITS, "零": 0}
        return int("".join(str(digit_map[c]) for c in s))
    total = 0
    rest = s
    for ch, mult in (("亿", _BIG_UNITS["亿"]), ("万", _BIG_UNITS["万"])):
        if ch in rest:
            left, rest = rest.split(ch, 1)
            sec = _parse_section(left)
            if sec is None:
                return None
            total += sec * mult
    sec = _parse_section(rest) if rest else 0
    if sec is None:
        return None
    total += sec
    # bare 十 prefix (十三 = 13) handled by _parse_section already
    return total


_PERCENT_RE = re.compile(f"百分之([{_NUM_CHARS}]+(?:点[{_NUM_CHARS}]+)?)")
_DECIMAL_RE = re.compile(f"([{_NUM_CHARS}]+)点([零一二两三四五六七八九]+)")
_NUMBER_RE = re.compile(f"[{_NUM_CHARS}]{{2,}}|[一二两三四五六七八九]")


def _fmt_decimal(int_part: str, frac_part: str) -> Optional[str]:
    n = parse_cn_number(int_part)
    if n is None:
        return None
    frac = "".join(str(_DIGITS.get(c, 0)) for c in frac_part)
    return f"{n}.{frac}"


def apply_itn(text: str) -> str:
    """Convert spoken-form numbers in text to digit form."""
    def pct(m):
        inner = m.group(1)
        if "点" in inner:
            ip, fp = inner.split("点", 1)
            d = _fmt_decimal(ip, fp)
            return f"{d}%" if d else m.group(0)
        n = parse_cn_number(inner)
        return f"{n}%" if n is not None else m.group(0)

    text = _PERCENT_RE.sub(pct, text)

    def dec(m):
        d = _fmt_decimal(m.group(1), m.group(2))
        return d if d else m.group(0)

    text = _DECIMAL_RE.sub(dec, text)

    def num(m):
        s = m.group(0)
        # single 一/二/两 etc. are usually lexical (一起, 一些) — require a
        # numeric context: digit-like neighbors or measure/unit words
        n = parse_cn_number(s)
        if n is None:
            return s
        end = m.end()
        nxt = text[end:end + 2] if end < len(text) else ""
        if len(s) == 1 and not re.match(
                r"^(毫米|毫克|千克|公斤|厘米|岁|次|天|周|月|年|度|号|点|倍|粒|片|mg|ml)", nxt):
            return s
        return str(n)

    return _NUMBER_RE.sub(num, text)
