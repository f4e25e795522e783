"""X5 — deterministic Traditional↔Simplified conversion.

The reference shells out to OpenCC around every CoreNLP call
(``NER.py:16-18,144,154``; ``Relationship.py:6-8,83-85``;
``Get_Timeline.py:9-11,65,69``) because its NLP models are
simplified-Chinese. The engine's extractors are dialect-native, so
conversion is only needed at ingestion boundaries; it is exposed as a pure
column expression (``F.translate`` — JVM-side, codegen-friendly) over a
1:1 character mapping covering the vocabulary that appears in biography
text. Multi-char OpenCC phrase rules are out of scope by design (the
reference round-trips s2t(t2s(x)) which is identity on this vocabulary).
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
}
_S2T = {s: t for t, s in _T2S.items()}

_T_CHARS = "".join(_T2S.keys())
_S_FOR_T = "".join(_T2S.values())
_S_CHARS = "".join(_S2T.keys())
_T_FOR_S = "".join(_S2T.values())


def to_simplified(col: Column | str) -> Column:
    """t2s as a column expression (reference: OpenCC('t2s'), NER.py:17)."""
    return F.translate(F.col(col) if isinstance(col, str) else col, _T_CHARS, _S_FOR_T)


def to_traditional(col: Column | str) -> Column:
    """s2t as a column expression (reference: OpenCC('s2t'), NER.py:16)."""
    return F.translate(F.col(col) if isinstance(col, str) else col, _S_CHARS, _T_FOR_S)


def t2s(text: str) -> str:
    """Driver/kernel-side scalar variant."""
    return "".join(_T2S.get(ch, ch) for ch in text)


def s2t(text: str) -> str:
    return "".join(_S2T.get(ch, ch) for ch in text)
