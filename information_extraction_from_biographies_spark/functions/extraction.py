"""Per-document extraction kernels (N2-N4, N7, N8, F3-F5).

Each function is a deterministic reimplementation of the corresponding
reference behaviour (file:line cited per function), written to run inside
Arrow-batched pandas UDFs. The statistical channels the reference delegates
to jieba / CoreNLP (``NER.py:132-158``) are replaced by a deterministic
trigger-window rule NER over the surname gazetteer — same *what* (find
person-name mentions), hermetic *how*.
"""

from __future__ import annotations

import functools
import re
from dataclasses import dataclass, field

from ..gazetteers import (
    DEFAULT_LEXICONS,
    Lexicons,
    ALIAS_TYPES,
    BIG_BROTHER_CHARS,
    BIG_BROTHER_ORDER,
    BIG_SISTER_CHARS,
    BIG_SISTER_ORDER,
    BOY_ORDER_CHILD,
    GIRL_ORDER_CHILD,
    MAN_PARENT_CHARS,
    MAN_SPOUSE_CHARS,
    MONK_SUFFIXES,
    NAME_BLOCKLIST,
    OTHER_PARENT_CHARS,
    SMALL_BROTHER_CHARS,
    SMALL_BROTHER_ORDER,
    SMALL_SISTER_CHARS,
    SMALL_SISTER_ORDER,
    WOMAN_PARENT_CHARS,
    WOMAN_SPOUSE_CHARS,
)

HEART = "💗"  # no-family-name-prepend marker (NER.py:247-250)
KIN_TEMP_TYPE = "親屬關係暫存"  # packed (biographee, kinship) alias type (NER.py:172)

# Every kernel takes ``lex: Lexicons`` (length-bucketed longest-first
# surname/place probe structures, gazetteers.Lexicons) so custom
# dictionaries loaded from the reference's public file formats
# (gazetteers.surnames_from_json et al.) travel by value inside the
# pandas-UDF closures — the reference's jieba-user-dict shipping model
# (NER.py:8-10), never mutated module globals.

# Dynamic patterns (name/identifier-interpolated) flood the re module's
# 512-entry global cache, which CLEARS ENTIRELY when full — measured 3.5s
# of 4.6s per 1000 conversations going to recompiles. Route every
# dynamically-built pattern through a per-entry-evicting LRU instead.
_compile_cached = functools.lru_cache(maxsize=4096)(re.compile)

_AUTHOR_RE = re.compile(r"（([\w、]+)撰寫?）")
_TITLE_HEAD_RE = re.compile(r"^([^（]{1,8})（")
_ENGLISH_HEAD_RE = re.compile(r"[a-zA-Z ]+")
_KIN_STOP = r"[是。為，（在、務\(\<\:]"


def surname_of(name: str, lex: Lexicons = DEFAULT_LEXICONS) -> str | None:
    """Longest surname prefix, else None (NER.py:261-265)."""
    for ln, ws in lex.surname_sets:
        if name[:ln] in ws:
            return name[:ln]
    return None


# ---------------------------------------------------------------- N8 -----
@dataclass
class TitleInfo:
    biographee: str | None = None
    english_name: str | None = None  # keeps the trailing ，(dead-branch quirk)
    birth: str | None = None
    death: str | None = None
    authors: list[str] = field(default_factory=list)
    norm_text: str = ""


def extract_title(text: str) -> TitleInfo:
    """Author + title extraction and removal (Preprocess.py:151-174).

    The reference's title regex has 3 groups so its ``len(groups)==2``
    branch is dead: group 1 (incl. trailing ，) always lands in
    EnglishName. Reproduced. The biographee name comes from the leading
    run before （ (the reference takes it from its TOC registry)."""
    info = TitleInfo(norm_text=text)
    m = _AUTHOR_RE.search(text)
    if m is not None:
        info.authors = m.group(1).split("、")
        text = text.replace(m.group(0), "")
    head = _TITLE_HEAD_RE.match(text)
    if head is None:
        info.norm_text = text
        return info
    name = head.group(1)
    title_re = re.escape(name) + r"（(.+，)?([\d?.？]*)-([\d?.？]*)）"
    tm = _compile_cached(title_re).search(text)
    if tm is None:
        info.norm_text = text
        return info
    info.biographee = name
    info.english_name = tm.group(1)  # may be None; keeps trailing ，
    info.birth = tm.group(2)
    info.death = tm.group(3)
    info.norm_text = text.replace(tm.group(0), "")
    return info


# ---------------------------------------------------------------- N3 -----
def get_kin_name(
    identifier: str, text: str, kinship: str, lex: Lexicons = DEFAULT_LEXICONS
) -> tuple[set, set]:
    """Kin-template name extraction (NER.py:215-258).

    Returns (names, alias_tuples); alias tuples with alias=None are the
    kinship placeholders later packed as 親屬關係暫存."""
    m = _compile_cached(r"[。，:]({})(\w+?){}".format(identifier, _KIN_STOP)).search(text)
    if m is None:
        return set(), set()
    candidate = m.group(2)
    surname = surname_of(candidate, lex)
    if kinship not in ("女兒", "兒子") and surname is None:
        return set(), set()
    if len(candidate) > 4:
        # reference re-segments with jieba and keeps the first n-tagged
        # token (NER.py:232-237); deterministic stand-in: longest surname
        # prefix + two chars.
        if surname is not None:
            name = candidate[: len(surname) + 2]
        else:
            return set(), set()
    else:
        name = candidate

    alias_tuples: set = set()
    m2 = _compile_cached(r"{}{}（([a-zA-Z].+?)）".format(re.escape(m.group(1)), re.escape(m.group(2)))).search(text)
    if m2 is not None:
        m3 = re.search(_ENGLISH_HEAD_RE, m2.group(1))
        if kinship in ("女兒", "兒子"):
            name = HEART + name  # NER.py:249-250
        alias_tuples.add((name, "英文名", m3.group(0)))
    alias_tuples.add((name, kinship, None))
    return {name}, alias_tuples


def get_other_kinship_names(
    text: str, lex: Lexicons = DEFAULT_LEXICONS
) -> tuple[set, set]:
    """Parents/siblings in ¶1; other-parents over the whole text
    (NER.py:178-212)."""
    first_para = text.split("\n\n")[0]
    names: set = set()
    tuples: set = set()
    for chars, kin in ((MAN_PARENT_CHARS, "父"), (WOMAN_PARENT_CHARS, "母")):
        n, t = get_kin_name("|".join(chars), first_para, kin, lex)
        names |= n
        tuples |= t
    for other in OTHER_PARENT_CHARS:
        n, t = get_kin_name(other, text, other, lex)
        names |= n
        tuples |= t
    for chars, kin in (
        (BIG_BROTHER_CHARS, "兄"),
        (SMALL_BROTHER_CHARS, "弟"),
        (BIG_SISTER_CHARS, "姐"),
        (SMALL_SISTER_CHARS, "妹"),
    ):
        n, t = get_kin_name("|".join(chars), first_para, kin, lex)
        names |= n
        tuples |= t
    for orders, kin in (
        (BIG_BROTHER_ORDER, "兄"),
        (SMALL_BROTHER_ORDER, "弟"),
        (BIG_SISTER_ORDER, "姐"),
        (SMALL_SISTER_ORDER, "妹"),
    ):
        for order in orders:
            n, t = get_kin_name(order, first_para, kin, lex)
            names |= n
            tuples |= t
    return names, tuples


def get_continuous_child_names(text: str, kinship: str) -> tuple[set, set]:
    """Enumerated-children form 育有N子N女，a、b、c (NER.py:363-413)."""
    m = re.search(r"育有?(\d子)?(\d女)?(.*?)(。|，)", text)
    if m is None:
        return set(), set()
    if m.group(3) != "":
        unchecked = m.group(3).split("、")
    else:
        m2 = re.search(r"(.+?)(。|，)", text[m.end() :])
        if m2 is None:
            return set(), set()
        m3 = re.search(r"(為|是)(：|:)?(.+)", m2.group(1))
        if m3 is not None:
            unchecked = m3.group(3).split("、")
        else:
            unchecked = m2.group(1).split("、")

    names: set = set()
    tuples: set = set()
    for raw in unchecked:
        kin = kinship
        if raw.startswith("子"):
            kin, raw = "兒子", raw[1:]
        elif raw.startswith("女"):
            kin, raw = "女兒", raw[1:]
        pm = re.search(r"(.+)（(.+?)）", raw)
        if pm is not None:
            em = re.match(r"[a-zA-Z ]+", pm.group(2))
            if em is not None:
                raw = HEART + pm.group(1)
                tuples.add((raw, "英文名", em.group(0)))
            else:
                raw = pm.group(1)
        names.add(raw)
        tuples.add((raw, kin, None))
    return names, tuples


def prepend_family_name(items: set, family_name: str | None) -> set:
    """Family-name prepend with 💗 / 原形 quirks (NER.py:415-447)."""
    if family_name is None:
        # unchanged INCLUDING any 💗 sentinel — the reference's early
        # return (NER.py:416-418) keeps the heart too, so such names are
        # later dropped by the surname filters on both sides; stripping
        # it here would diverge from the reference's emitted name set
        return items
    result: set = set()
    for el in items:
        name = el if isinstance(el, str) else el[0]
        prepended = False
        if name.startswith(HEART):
            new = name[1:]
        elif name.startswith(family_name):
            new = name
        else:
            new = family_name + name
            prepended = True
        if isinstance(el, str):
            result.add(new)
        else:
            result.add((new, el[1], el[2]))
            if prepended:
                result.add((new, "原形", name))
    return result


def get_names_child_and_spouse(
    text: str, biographee: str, lex: Lexicons = DEFAULT_LEXICONS
) -> tuple[set, set]:
    """Spouse + children in the last two paragraphs (NER.py:267-360)."""
    splits = text.split("\n\n")
    paragraph = "\n\n".join(splits[-2:]) if len(splits) >= 3 else splits[-1]

    man_sp_names, man_sp_tuples = get_kin_name("|".join(MAN_SPOUSE_CHARS), paragraph, "夫", lex)
    woman_sp_names, woman_sp_tuples = get_kin_name("|".join(WOMAN_SPOUSE_CHARS), paragraph, "妻", lex)

    if len(woman_sp_names) == 1:
        is_man = True
    elif len(man_sp_names) == 1:
        is_man = False
    else:
        is_man = True
    if is_man:
        family_name = surname_of(biographee, lex)
    else:
        family_name = surname_of(next(iter(man_sp_names)), lex)

    girl_names: set = set()
    girl_tuples: set = set()
    for order in GIRL_ORDER_CHILD:
        n, t = get_kin_name(order, paragraph, "女兒", lex)
        girl_names |= n
        girl_tuples |= t
    boy_names: set = set()
    boy_tuples: set = set()
    for order in BOY_ORDER_CHILD:
        n, t = get_kin_name(order, paragraph, "兒子", lex)
        boy_names |= n
        boy_tuples |= t

    # 育有-driven enumerated form (NER.py:327-351). The two outer elif
    # arms are unreachable (the first `or` test subsumes them) — in the
    # REFERENCE too (NER.py:340-343); the dead shape is mirrored
    # deliberately rather than "fixed" into a different decision table.
    m = re.search(r"育有\w+?[，。：（]", paragraph)
    not_found = None
    if m is not None:
        if len(boy_names) == 0 or len(girl_names) == 0:
            if "女" in m.group(0) and "子" in m.group(0):
                not_found = "兒女"
            elif "女" in m.group(0):
                not_found = "女兒"
            elif "子" in m.group(0) and len(boy_names) == 0:
                not_found = "兒子"
        elif len(boy_names) == 0 and "子" in m.group(0):
            not_found = "兒子"
        elif len(girl_names) == 0 and "女" in m.group(0):
            not_found = "女兒"
    cont_names: set = set()
    cont_tuples: set = set()
    if not_found is not None:
        cont_names, cont_tuples = get_continuous_child_names(paragraph, not_found)

    child_names = prepend_family_name(girl_names | boy_names | cont_names, family_name)
    child_tuples = prepend_family_name(girl_tuples | boy_tuples | cont_tuples, family_name)
    return (
        child_names | man_sp_names | woman_sp_names,
        child_tuples | man_sp_tuples | woman_sp_tuples,
    )


def get_names_kinship(
    text: str, biographee: str, lex: Lexicons = DEFAULT_LEXICONS
) -> tuple[set, set]:
    """All kinship names; placeholder tuples packed as
    (name, 親屬關係暫存, "biographee:kinship") (NER.py:161-176)."""
    cs_names, cs_tuples = get_names_child_and_spouse(text, biographee, lex)
    ok_names, ok_tuples = get_other_kinship_names(text, lex)
    packed: set = set()
    for name, alias_type, alias in ok_tuples | cs_tuples:
        if alias is None:
            packed.add((name, KIN_TEMP_TYPE, f"{biographee}:{alias_type}"))
        else:
            packed.add((name, alias_type, alias))
    return ok_names | cs_names, packed


# ---------------------------------------------------------------- N2 -----
# Deterministic rule NER: a surname immediately after a trigger char,
# taking surname + 2 chars. Replaces the jieba-nr / CoreNLP-PERSON
# statistical channels (NER.py:132-158) hermetically.
_NER_TRIGGERS = "與和被因為娶偕同跟向稱請邀及暨"
_TRIGGER_RE = re.compile("[{}]".format(_NER_TRIGGERS))


def rule_ner_names(text: str, lex: Lexicons = DEFAULT_LEXICONS) -> set:
    names: set = set()
    for m in _TRIGGER_RE.finditer(text):
        start = m.end()
        rest = text[start : start + 6]
        for ln, ws in lex.surname_sets:
            if rest[:ln] in ws:
                cand = rest[: ln + 2]
                if len(cand) == ln + 2 and re.fullmatch(r"\w+", cand):
                    names.add(cand)
                break
    return names


# ---------------------------------------------------------------- N1 -----
# Dictionary-segmentation name channel: the reference augments jieba with
# user dictionaries whose entries are tagged nr (Biographee-Names /
# Appendix-Names, NER.py:8-10) and keeps every nr token from segmentation
# (NER.py:132-139) — names are recalled from the dictionary even with no
# trigger-window context around them. The hermetic equivalent: greedy
# longest-match segmentation over the user dictionary; a matched word
# consumes its span (segmentation, not substring search).


def build_name_dict_index(words) -> dict[str, list[str]]:
    """First-char-bucketed, longest-first index over user-dict names —
    build once per run, share across conversations."""
    index: dict[str, list[str]] = {}
    for w in words or ():
        if w:
            index.setdefault(w[0], []).append(w)
    for bucket in index.values():
        bucket.sort(key=len, reverse=True)
    return index


def segment_names(text: str, dict_index: dict[str, list[str]]) -> set:
    """N1: nr tokens from dictionary segmentation (longest match wins,
    match consumes its span)."""
    names: set = set()
    i, n = 0, len(text)
    while i < n:
        hit = None
        for w in dict_index.get(text[i], ()):
            if text.startswith(w, i):
                hit = w
                break
        if hit is not None:
            names.add(hit)
            i += len(hit)
        else:
            i += 1
    return names


# ------------------------------------------------------------- F3-F5 -----
def process_and_filter_names(names: set, lex: Lexicons = DEFAULT_LEXICONS) -> set:
    """Name sanity filter + surname acceptance + substring-dominance dedup
    (NER.py:450-485)."""
    first: set = set()
    for name in names:
        if (
            1 < len(name) <= 4
            and name[-1] != "寺"
            and name not in NAME_BLOCKLIST
            and re.match("[a-zA-Z]", name) is None
            and name not in lex.places
            and not (name[-1] == "人" and name[:-1] in lex.places)
        ):
            for ln, ws in lex.name_surname_sets:
                if name[:ln] in ws:
                    first.add(name)
                    break
            for monk in MONK_SUFFIXES:
                if name.endswith(monk):
                    first.add(name)
    # substring dominance: drop names contained in another extracted name.
    # O(N²) stays inside one conversation's small name set (SURVEY F5).
    out: set = set()
    lst = list(first)
    for n1 in lst:
        if not any(n1 != n2 and n1 in n2 for n2 in lst):
            out.add(n1)
    return out


# ---------------------------------------------------------------- N4 -----
def get_english_names(text: str, names: set) -> set:
    """name（English…）→ 英文名 alias (NER.py:487-494)."""
    out: set = set()
    for name in names:
        m = _compile_cached(r"{}（([a-zA-Z].*?)）".format(re.escape(name))).search(text)
        if m is not None:
            m2 = re.search(_ENGLISH_HEAD_RE, m.group(1))
            out.add((name, "英文名", m2.group(0)))
    return out


def get_other_names(text: str, biographee: str) -> set:
    """字/號/… alias extraction from ¶1 (NER.py:496-512)."""
    out: set = set()
    sent = text.split("\n\n")[0]
    for alias_type in ALIAS_TYPES:
        m = _compile_cached("{}(.*?)[，。]".format(alias_type)).search(sent)
        if m is not None:
            for alias in m.group(1).split("、"):
                out.add((biographee, alias_type, alias))
    return out


# ---------------------------------------------------------------- N7 -----
# The reference compiles one ({place1|place2|...})人[，。] alternation over
# 2,737 places (Biographee_Info.py:14,24) — O(|places|) per text position in
# Python's re. Equivalent and O(max place length): scan 人[，。] anchors in
# order and set-probe the preceding substring longest-first (= the regex's
# earliest-start preference among places ending at the same 人).
_HOMETOWN_ANCHOR_RE = re.compile(r"人[，。]")


def extract_hometown(text: str, lex: Lexicons = DEFAULT_LEXICONS) -> str | None:
    """First ({place})人[，。] match (Biographee_Info.py:22-28)."""
    for m in _HOMETOWN_ANCHOR_RE.finditer(text):
        end = m.start()
        for ln in range(min(lex.place_maxlen, end), 0, -1):
            if text[end - ln : end] in lex.places:
                return text[end - ln : end]
    return None


# --------------------------------------------------------------- glue ----
def extract_names_from_conv(
    text: str,
    biographee: str | None,
    user_dict_index: dict | None = None,
    lex: Lexicons = DEFAULT_LEXICONS,
) -> tuple[set, set]:
    """Stage-1 per-conversation extraction (NER.py:98-129): union the
    channels (N1 dictionary segmentation ∪ N2 rule NER ∪ N3 kinship),
    filter, keep alias tuples whose name survived. ``user_dict_index``:
    a ``build_name_dict_index`` result (the N1 user dictionary,
    NER.py:8-10); None disables the channel. ``lex``: the surname/place
    gazetteers (gazetteers.Lexicons; load custom ones with
    ``gazetteers.lexicons_from_tools`` et al.)."""
    names: set = set()
    if biographee:
        names.add(biographee)
    if user_dict_index:
        names |= segment_names(text, user_dict_index)
    names |= rule_ner_names(text, lex)
    kin_names: set = set()
    kin_tuples: set = set()
    if biographee:
        kin_names, kin_tuples = get_names_kinship(text, biographee, lex)
    names |= kin_names
    names = process_and_filter_names(names, lex)

    eng_tuples = get_english_names(text, names)
    other_tuples = get_other_names(text, biographee) if biographee else set()
    alias_tuples = {
        (name, alias_type, alias)
        for (name, alias_type, alias) in (eng_tuples | other_tuples | kin_tuples)
        if name in names
    }
    return names, alias_tuples
