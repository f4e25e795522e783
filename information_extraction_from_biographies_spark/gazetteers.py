"""Gazetteer / lexicon dimension tables.

The reference loads surname + place-name gazetteers and kinship keyword
lists at import time (``NER.py:26-60``) as in-process Python sets. Here
they are small dimension DataFrames (broadcast for joins) plus plain
frozensets shipped inside pandas-UDF closures.

The *keyword lists* are behavioural constants of the reference (alternation
order is match priority — ``NER.py:38`` comment), reproduced exactly. The
*gazetteers* are representative subsets of the public-domain Hundred Family
Surnames / Taiwan place-name lists the reference samples from; the engine
takes them as input dims, so coverage is a data concern, not a code one.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

# --- Surnames (reference: NER.py:26-30, 507 Chinese + 7000 Japanese) -----
CHINESE_SURNAMES: tuple[str, ...] = (
    "陳", "林", "黃", "張", "李", "王", "吳", "劉", "蔡", "楊",
    "許", "鄭", "謝", "郭", "洪", "邱", "曾", "廖", "賴", "徐",
    "周", "葉", "蘇", "莊", "呂", "江", "何", "蕭", "羅", "高",
    "潘", "簡", "朱", "鍾", "游", "彭", "詹", "胡", "施", "沈",
    "余", "盧", "梁", "趙", "顏", "柯", "翁", "魏", "孫", "戴",
    "范", "宋", "方", "鄧", "杜", "傅", "侯", "曹", "溫", "薛",
    "歐陽", "司馬", "諸葛",
)
JAPANESE_SURNAMES: tuple[str, ...] = (
    "中川", "田中", "佐藤", "鈴木", "高橋", "渡邊", "伊藤", "山本",
    "小林", "加藤", "松本", "井上", "木村", "齋藤",
)
SURNAMES: frozenset[str] = frozenset(CHINESE_SURNAMES + JAPANESE_SURNAMES)

# --- Place names (reference: NER.py:31-34, 366 TW + 2371 mainland) -------
TAIWAN_PLACES: tuple[str, ...] = (
    "臺北", "台北", "新竹", "彰化", "臺南", "台南", "高雄", "基隆",
    "宜蘭", "花蓮", "臺中", "台中", "嘉義", "屏東", "桃園", "苗栗",
    "南投", "雲林", "臺東", "澎湖", "淡水", "艋舺", "大稻埕", "士林",
)
MAINLAND_PLACES: tuple[str, ...] = (
    "福建", "廣東", "泉州", "漳州", "廈門", "上海", "北京", "南京",
    "杭州", "蘇州", "湖南", "湘鄉", "浙江", "安溪", "同安", "潮州",
)
PLACE_NAMES: frozenset[str] = frozenset(TAIWAN_PLACES + MAINLAND_PLACES)

# --- Kinship keyword lists (reference: NER.py:39-60, order = priority) ----
GIRL_ORDER_CHILD = ["長女", "次女", "三女", "四女", "五女", "六女", "七女", "八女", "九女", "十女", "么女", "幼女", "獨女"]
BOY_ORDER_CHILD = ["長子", "次子", "三子", "四子", "伍子", "五子", "六子", "七子", "八子", "九子", "十子", "么子", "么兒", "幼子", "獨子", "長男", "次男", "三男", "四男", "伍男", "五男", "六男", "七男", "八男", "九男", "十男", "么男"]
GIRL_CHILD_CHARS = ["女兒", "女"]
BOY_CHILD_CHARS = ["兒子", "子", "兒"]
MAN_PARENT_CHARS = ["父親", "父", "爹", "爸"]
WOMAN_PARENT_CHARS = ["母親", "母", "娘", "媽"]
OTHER_PARENT_CHARS = ["乾爸", "乾媽", "乾爹", "乾娘", "繼父", "繼母", "祖父", "祖母"]
SMALL_BROTHER_ORDER = ["大弟", "二弟", "三弟", "四弟", "五弟", "六弟", "七弟"]
SMALL_BROTHER_CHARS = ["弟弟", "弟"]
BIG_BROTHER_ORDER = ["大哥", "二哥", "三哥", "四哥", "五哥", "六哥", "七哥"]
BIG_BROTHER_CHARS = ["兄長", "哥哥", "兄"]
BIG_SISTER_ORDER = ["大姐", "二姐", "三姐", "四姐", "五姐", "六姐", "七姐"]
BIG_SISTER_CHARS = ["姐姐", "姐"]
SMALL_SISTER_ORDER = ["大妹", "二妹", "三妹", "四妹", "五妹", "六妹", "七妹"]
SMALL_SISTER_CHARS = ["妹妹", "妹"]
WOMAN_SPOUSE_CHARS = ["妻為", "妻過", "妻子", "娶", "妻"]
MAN_SPOUSE_CHARS = ["丈夫為", "丈夫", "夫為", "夫"]
OTHER_CHILD_CHARS = ["乾女兒", "乾兒子", "乾孫子"]
GRAND_CHILD_ORDER = ["長孫", "次孫"]
GRAND_CHILD_CHARS = ["孫子", "孫"]

# Union in the reference's order (NER.py:60) — used by the relation filter
# F7 (Relationship.py:179-185) and surname-set subtraction U3 (NER.py:463).
KINSHIP_CHARS: list[str] = (
    GIRL_ORDER_CHILD + BOY_ORDER_CHILD + GRAND_CHILD_ORDER + GIRL_CHILD_CHARS
    + BOY_CHILD_CHARS + GRAND_CHILD_CHARS + MAN_PARENT_CHARS + WOMAN_PARENT_CHARS
    + OTHER_PARENT_CHARS + MAN_SPOUSE_CHARS + WOMAN_SPOUSE_CHARS
    + BIG_SISTER_CHARS + BIG_SISTER_ORDER + BIG_BROTHER_CHARS + BIG_BROTHER_ORDER
    + SMALL_SISTER_CHARS + SMALL_SISTER_ORDER + SMALL_BROTHER_CHARS + SMALL_BROTHER_ORDER
)

# Surnames legal as name prefixes = SURNAMES − kinship chars (NER.py:463).
NAME_SURNAMES: frozenset[str] = SURNAMES - set(KINSHIP_CHARS)

# Alias types searched in the first paragraph (NER.py:504).
ALIAS_TYPES: tuple[str, ...] = (
    "字", "號", "別名", "筆名", "本名", "原名", "俗名", "受洗名", "又名", "藝名", "小名",
)

# Monk-title suffixes accepted without a surname (NER.py:468).
MONK_SUFFIXES: tuple[str, ...] = ("導師", "法師", "和尚")

# Name blocklist (NER.py:457).
NAME_BLOCKLIST: frozenset[str] = frozenset(["田野", "伯父", "伯母", "元配", "高中生", "於民國"])

# Era names recognised by the timeline extractor (Get_Timeline.py:20).
ERA_NAMES: tuple[str, ...] = ("民國", "大正", "昭和", "光緒", "明治", "咸豐", "乾隆", "宣統")

# Verb lexicon for the deterministic dependency annotator backing the N5
# rule cascade (replaces the CoreNLP depparse service the reference calls
# at Relationship.py:149; the cascade itself mirrors Relationship.py:89-145).
VERB_LEXICON: tuple[str, ...] = (
    "合作", "發表", "創立", "創辦", "擔任", "推薦", "殺害", "指導", "師事",
    "結識", "共事", "提攜", "協助", "邀請", "聘任", "支持", "反對", "接任",
    "繼承", "培養", "教導", "資助", "合著", "主持", "領導", "追隨",
)
NOUN_LEXICON: tuple[str, ...] = (
    "論文", "公司", "學校", "醫院", "報社", "書局", "商行", "工廠",
    "協會", "基金會", "教授", "學者", "醫師", "校長", "先生",
    "恩師", "會長", "商人", "老師",
)

# Clause delimiters and their position increments (Cooccurrence.py:13-14).
DELIMITERS: tuple[str, ...] = ("，", "。", "。\n\n")
INCREMENTS: tuple[int, ...] = (1, 2, 3)

# Co-occurrence scoring constants (Cooccurrence.py:15-17; Graph.py:6).
DISTANCE2SCORE_FACTOR = 4.0
DEPRECIATE_FACTOR = 0.65
DISTANCE_TO_BIOGRAPHEE = 2
COOCCURRENCE_ZOOM_FACTOR = 0.6


def surnames_df(spark: SparkSession) -> DataFrame:
    rows = [(s, "zh") for s in CHINESE_SURNAMES] + [(s, "ja") for s in JAPANESE_SURNAMES]
    return spark.createDataFrame(rows, "surname string, origin string")


def places_df(spark: SparkSession) -> DataFrame:
    rows = [(p, "tw") for p in TAIWAN_PLACES] + [(p, "cn") for p in MAINLAND_PLACES]
    return spark.createDataFrame(rows, "place string, region string")


def kinship_keywords_df(spark: SparkSession) -> DataFrame:
    rows = [(kw, _KINSHIP_OF.get(kw, kw), i) for i, kw in enumerate(KINSHIP_CHARS)]
    return spark.createDataFrame(rows, "keyword string, kinship string, priority int")


# keyword → normalized kinship predicate (the `kinship` argument the
# reference passes to get_kin_name at NER.py:185-207,277-320).
_KINSHIP_OF: dict[str, str] = {}
for _kw in MAN_PARENT_CHARS:
    _KINSHIP_OF[_kw] = "父"
for _kw in WOMAN_PARENT_CHARS:
    _KINSHIP_OF[_kw] = "母"
for _kw in BIG_BROTHER_CHARS + BIG_BROTHER_ORDER:
    _KINSHIP_OF[_kw] = "兄"
for _kw in SMALL_BROTHER_CHARS + SMALL_BROTHER_ORDER:
    _KINSHIP_OF[_kw] = "弟"
for _kw in BIG_SISTER_CHARS + BIG_SISTER_ORDER:
    _KINSHIP_OF[_kw] = "姐"
for _kw in SMALL_SISTER_CHARS + SMALL_SISTER_ORDER:
    _KINSHIP_OF[_kw] = "妹"
for _kw in WOMAN_SPOUSE_CHARS:
    _KINSHIP_OF[_kw] = "妻"
for _kw in MAN_SPOUSE_CHARS:
    _KINSHIP_OF[_kw] = "夫"
for _kw in GIRL_ORDER_CHILD + GIRL_CHILD_CHARS:
    _KINSHIP_OF[_kw] = "女兒"
for _kw in BOY_ORDER_CHILD + BOY_CHILD_CHARS:
    _KINSHIP_OF[_kw] = "兒子"


# ------------------------------------------------------- custom lexicons --
def _by_len_sets(words) -> tuple[tuple[int, frozenset], ...]:
    """Length-bucketed probe sets, longest first: probing a 7,507-surname
    list per candidate is O(|surnames|); this makes it O(max word length)
    set lookups (the stage-1/2 hot path; see functions/extraction.py)."""
    buckets: dict[int, set] = {}
    for w in words:
        if w:
            buckets.setdefault(len(w), set()).add(w)
    return tuple((ln, frozenset(ws)) for ln, ws in sorted(buckets.items(), reverse=True))


@dataclass(frozen=True)
class Lexicons:
    """Picklable bundle of the surname/place gazetteers plus the derived
    probe structures the extraction kernels need (longest-first length
    buckets, NAME_SURNAMES = surnames − kinship chars per NER.py:463).

    Build with :meth:`Lexicons.build`. Instances travel INSIDE pandas-UDF
    closures (the same shipping model as the jieba user dicts the
    reference loads at NER.py:8-10): workers get the custom dictionaries
    by value, never via mutated module globals — module-level defaults
    would silently reset on worker re-import in a real cluster. Full
    public scale (7,507 surnames + 2,737 places) pickles to well under a
    megabyte, far below any broadcast concern."""

    surnames: frozenset
    places: frozenset
    surname_sets: tuple
    name_surname_sets: tuple
    place_maxlen: int

    @staticmethod
    def build(surnames, places) -> "Lexicons":
        s, p = frozenset(surnames), frozenset(places)
        return Lexicons(
            surnames=s,
            places=p,
            surname_sets=_by_len_sets(s),
            name_surname_sets=_by_len_sets(s - set(KINSHIP_CHARS)),
            place_maxlen=max((len(x) for x in p), default=0),
        )


DEFAULT_LEXICONS = Lexicons.build(SURNAMES, PLACE_NAMES)


# ------------------------------------------------ gazetteer file loaders --
# The reference loads its public dictionaries from JSON string arrays
# (NER.py:26-34: Hundred-Family-Surnames.json, Japanese-Surnames-in-zhTW
# .json, Taiwanese/Mainland-Place-Names.json) and jieba user-dict text
# files of `word [freq] [tag]` lines (NER.py:8-10; written by
# Convert_And_Extract.py:100-102 as `name nr`). These loaders accept those
# exact formats. Reads go through spark.read.text (the Hadoop FS API), so
# hdfs:// / s3a:// paths work on a real cluster; the files are
# dimension-scale (<1 MB), so a driver-side collect is the right plan.


def _read_whole_text(spark: SparkSession, path: str) -> str:
    rows = spark.read.text(path, wholetext=True).collect()
    return "\n".join(r[0] for r in rows)


def load_json_list(spark: SparkSession, path: str) -> list[str]:
    """One reference-format gazetteer file: a JSON array of strings."""
    data = json.loads(_read_whole_text(spark, path))
    if not isinstance(data, list) or not all(isinstance(x, str) for x in data):
        raise ValueError(f"{path}: expected a JSON array of strings")
    return data


def surnames_from_json(spark: SparkSession, *paths: str) -> tuple[str, ...]:
    """Union of surname gazetteer files (NER.py:26-30 loads two and
    unions them into one set). Order-preserving dedup."""
    out: list[str] = []
    for p in paths:
        out.extend(load_json_list(spark, p))
    return tuple(dict.fromkeys(out))


def places_from_json(spark: SparkSession, *paths: str) -> tuple[str, ...]:
    """Union of place-name gazetteer files (NER.py:31-34 concatenates the
    Taiwanese and mainland lists)."""
    out: list[str] = []
    for p in paths:
        out.extend(load_json_list(spark, p))
    return tuple(dict.fromkeys(out))


def user_dict_from_jieba_txt(
    spark: SparkSession, path: str, tags: tuple[str, ...] | None = ("nr",)
) -> tuple[str, ...]:
    """jieba user-dict loader: `word [freq] [tag]` per line
    (jieba.load_userdict format; the reference's dicts are `word nr`,
    Convert_And_Extract.py:101). Keeps words whose tag is in ``tags``
    (default: person names only, matching the reference's nr filter at
    NER.py:132-139); ``tags=None`` keeps every word. Returns words in
    file order, deduped — feed to ``Pipeline(user_dict=...)``."""
    out: list[str] = []
    for row in spark.read.text(path).collect():
        parts = str(row[0]).strip().split()
        if not parts:
            continue
        word, freq, tag = parts[0], None, None
        for tok in parts[1:]:
            if tok.isdigit() and freq is None:
                freq = int(tok)
            else:
                tag = tok
        if tags is None or tag in tags:
            out.append(word)
    return tuple(dict.fromkeys(out))


def lexicons_from_tools(spark: SparkSession, tools_dir: str) -> Lexicons:
    """Convenience: build Lexicons from a directory laid out like the
    reference's ./Tools/ (NER.py:26-34 file names)."""
    surnames = surnames_from_json(
        spark,
        f"{tools_dir}/Hundred-Family-Surnames.json",
        f"{tools_dir}/Japanese-Surnames-in-zhTW.json",
    )
    places = places_from_json(
        spark,
        f"{tools_dir}/Taiwanese-Place-Names.json",
        f"{tools_dir}/Mainland-Place-Names.json",
    )
    return Lexicons.build(surnames, places)
