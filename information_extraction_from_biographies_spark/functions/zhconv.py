"""X5 — deterministic Traditional↔Simplified conversion.

The reference shells out to OpenCC around every CoreNLP call
(``NER.py:16-18,144,154``; ``Relationship.py:6-8,83-85``;
``Get_Timeline.py:9-11,65,69``) because its NLP models are
simplified-Chinese. The engine's extractors are dialect-native, so
conversion is only needed at ingestion boundaries.

Two layers, mirroring OpenCC's architecture:

1. **Phrase rules** (multi-char, longest-first) disambiguate the
   one-to-many characters (发→發/髮, 后→後/后, 干→幹/乾/干, 钟→鐘/鍾,
   复→復/複, 里→裡/里, 面→麵/面, 只→隻/只) — applied as ordered literal
   replaces (JVM ``F.replace`` chain, codegen-friendly).
2. **Char map** (1:1) covers the unambiguous biography-domain vocabulary
   via ``F.translate``.

The rule tables are curated for the biography domain, not a full OpenCC
dump — the deterministic subset the engine's fixtures and gazetteers
exercise; extending them is data, not code.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F  # noqa: N812

# traditional → simplified, 1:1 chars (biography-domain vocabulary)
_T2S = {
    "臺": "台", "灣": "湾", "陳": "陈", "劉": "刘", "張": "张", "楊": "杨",
    "黃": "黄", "吳": "吴", "鄭": "郑", "謝": "谢", "賴": "赖", "羅": "罗",
    "蕭": "萧", "鍾": "钟", "葉": "叶", "蘇": "苏", "莊": "庄", "呂": "吕",
    "盧": "卢", "馬": "马", "龍": "龙", "馮": "冯", "鄧": "邓", "許": "许",
    "學": "学", "師": "师", "醫": "医", "會": "会", "長": "长", "員": "员",
    "國": "国", "區": "区", "縣": "县", "鄉": "乡", "鎮": "镇", "廳": "厅",
    "歷": "历", "畢": "毕", "業": "业", "發": "发", "論": "论",
    "薦": "荐", "擔": "担", "當": "当", "選": "选", "創": "创", "辦": "办",
    "職": "职", "報": "报", "書": "书", "館": "馆", "藝": "艺", "術": "术",
    "與": "与", "為": "为", "於": "于", "後": "后", "並": "并", "來": "来",
    "時": "时", "間": "间", "歲": "岁", "壽": "寿", "親": "亲", "屬": "属",
    "關": "关", "係": "系", "婦": "妇", "兒": "儿", "孫": "孙", "婚": "婚",
    "嶽": "岳", "澤": "泽", "煥": "焕", "銘": "铭", "鳳": "凤", "鴻": "鸿",
    "燦": "灿", "號": "号", "筆": "笔", "門": "门",
    # many→one merges (safe t2s, ambiguous s2t — see _S2T overrides)
    "髮": "发", "鐘": "钟", "復": "复", "複": "复", "裡": "里",
    "麵": "面", "隻": "只", "乾": "干", "幹": "干",
    "頭": "头", "說": "说", "條": "条", "這": "这", "餅": "饼",
    "淨": "净", "雜": "杂", "數": "数", "錶": "表",
}

# simplified → traditional 1:1 defaults. Built from the inverse of _T2S;
# where several traditional chars merged into one simplified char, the
# biography-domain default is pinned explicitly and the minority readings
# are handled by the phrase rules below.
_S2T = {
    s: t
    for t, s in _T2S.items()
    if s not in ("发", "钟", "复", "里", "面", "只", "干", "后", "表")
}
_S2T.update({
    "发": "發",  # verbs/abstract (發展/出發); 髮 via phrases
    "钟": "鍾",  # surname default; 鐘 (clock) via phrases
    "复": "復",  # 恢復/復興; 複 (duplicate) via phrases
    "后": "後",  # temporal; royal 后 via phrases
    # 里/面/只/干 default to identity (common as-is in traditional text:
    # 村里/面會/只身/干支); their traditional-only readings via phrases
})

# s2t phrase rules (longest first at apply time)
_S2T_PHRASES = {
    "头发": "頭髮", "理发": "理髮", "毛发": "毛髮",
    "皇后": "皇后", "太后": "太后", "王后": "王后",
    "时钟": "時鐘", "分钟": "分鐘", "钟表": "鐘錶",
    "重复": "重複", "复杂": "複雜", "复数": "複數",
    "这里": "這裡", "那里": "那裡", "哪里": "哪裡", "里面": "裡面",
    "面包": "麵包", "面条": "麵條", "面粉": "麵粉",
    "一只": "一隻", "船只": "船隻",
    "饼干": "餅乾", "干燥": "乾燥", "干净": "乾淨",
    "干部": "幹部", "干事": "幹事", "能干": "能幹",
}
# t2s needs no phrase layer: every traditional reading above maps to its
# simplified form unambiguously at the character level (many→one).
_T2S_PHRASES: dict[str, str] = {}


def _char_tables(mapping: dict[str, str]) -> tuple[str, str]:
    pairs = [(a, b) for a, b in mapping.items() if a != b]
    return "".join(a for a, _ in pairs), "".join(b for _, b in pairs)


_T_CHARS, _S_FOR_T = _char_tables(_T2S)
_S_CHARS, _T_FOR_S = _char_tables(_S2T)

_S2T_ORDER = sorted(_S2T_PHRASES, key=len, reverse=True)
_T2S_ORDER = sorted(_T2S_PHRASES, key=len, reverse=True)

# Phrase outputs must be invisible to the char layer (皇后 must not become
# 皇後): phrases go through private-use placeholder chars — the same
# placeholder technique the reference's preprocessor uses for its
# space/newline normalization (Preprocess.py:115-131, Ä/Å).
_S2T_PLACEHOLDER = {p: chr(0xE000 + i) for i, p in enumerate(_S2T_ORDER)}
_T2S_PLACEHOLDER = {p: chr(0xE400 + i) for i, p in enumerate(_T2S_ORDER)}


def _convert_col(
    col: Column | str, phrases: dict, order: list[str], holders: dict, chars: str, out: str
) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if order:
        # input that already contains our private-use placeholder
        # codepoints would be rewritten into phrase targets by the
        # restore pass — strip them first (they are PUA chars with no
        # legitimate reading in biography text; round-2 ADVICE)
        c = F.translate(c, "".join(holders[p] for p in order), "")
    for p in order:  # phrase layer first, longest-first, into placeholders
        c = F.replace(c, F.lit(p), F.lit(holders[p]))
    c = F.translate(c, chars, out)
    for p in order:  # restore placeholders to the phrase targets
        c = F.replace(c, F.lit(holders[p]), F.lit(phrases[p]))
    return c


def to_simplified(col: Column | str) -> Column:
    """t2s as a column expression (reference: OpenCC('t2s'), NER.py:17)."""
    return _convert_col(col, _T2S_PHRASES, _T2S_ORDER, _T2S_PLACEHOLDER, _T_CHARS, _S_FOR_T)


def to_traditional(col: Column | str) -> Column:
    """s2t as a column expression (reference: OpenCC('s2t'), NER.py:16)."""
    return _convert_col(col, _S2T_PHRASES, _S2T_ORDER, _S2T_PLACEHOLDER, _S_CHARS, _T_FOR_S)


def _convert_str(
    text: str, phrases: dict, order: list[str], holders: dict, mapping: dict[str, str]
) -> str:
    if order:
        # strip pre-existing placeholder codepoints (see _convert_col)
        drop = {holders[p] for p in order}
        if any(h in text for h in drop):
            text = "".join(ch for ch in text if ch not in drop)
    for p in order:
        if p in text:
            text = text.replace(p, holders[p])
    text = "".join(mapping.get(ch, ch) for ch in text)
    for p in order:
        if holders[p] in text:
            text = text.replace(holders[p], phrases[p])
    return text


def t2s(text: str) -> str:
    """Driver/kernel-side scalar variant."""
    return _convert_str(text, _T2S_PHRASES, _T2S_ORDER, _T2S_PLACEHOLDER, _T2S)


def s2t(text: str) -> str:
    return _convert_str(text, _S2T_PHRASES, _S2T_ORDER, _S2T_PLACEHOLDER, _S2T)
