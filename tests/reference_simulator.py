"""Independent oracle for order/position-sensitive reference semantics.

Implements — from the reference's *specification*, with deliberately
different code structure from the engine (engine: rank-based SQL /
Aho-Corasick; here: literal scan loops / str containment) — the pieces
whose goldens cannot be derived from templates alone:

- mature-text normalization (authors/title removal, Preprocess.py:151-174)
- clause positions (Cooccurrence.py:35-65, incl. dropped trailing clause)
- mention occurrences (Utilities.py:49-67 containment semantics)
- co-occurrence pair distances + depreciating fold (Cooccurrence.py:68-111)
- N5 verb-relation cascade: line split, per-name probe, rule cascade,
  sentinel extend quirk, 3-token/self/kinship filter
  (Relationship.py:35-189, transcribed literally below)
- N6 timeline: era-year anchored spans, western-year gate, dict-overwrite
  last-wins, concise condensation (Get_Timeline.py:17-83)

The N5 cascade and N6 concise mode need token-level annotation the
reference gets from CoreNLP; the engine replaced that service with a
deterministic lexicon/pattern annotator whose SPEC (token classes,
longest-match priority, the four idiom patterns) is fixed in
functions/relations.py's docstrings. The simulator re-implements that
spec with its own scanning loops (dict-vocab longest-prefix probe here
vs the engine's first-char-bucketed index) and imports only the
behavioral constant lists (lexicons/kinship chars — copying them would
be verbatim duplication, not independence).

The biographee comes from conv_id (the reference's registry key), NOT from
the text — cross-checking the engine's title-derived biographee.
"""

from __future__ import annotations

import re

DELIMS = ["，", "。", "。\n\n"]
INCR = [1, 2, 3]


def biographee_from_conv_id(conv_id: str) -> str:
    return conv_id.split("-", 2)[2]


def mature_text(turn_texts: list[str], biographee: str) -> str:
    """Normalize turn 0 (strip author + title) and join paragraphs."""
    t0 = turn_texts[0]
    am = re.search(r"（([\w、]+)撰寫?）", t0)
    if am:
        t0 = t0.replace(am.group(0), "")
    tm = re.search(re.escape(biographee) + r"（(.+，)?([\d?.？]*)-([\d?.？]*)）", t0)
    if tm:
        t0 = t0.replace(tm.group(0), "")
    return "\n\n".join([t0] + list(turn_texts[1:]))


def clause_positions(text: str) -> list[tuple[str, int]]:
    """Literal re-scan loop as in one_split_by_any_delimiter."""
    regex = re.compile(r"({})\w".format("|".join(DELIMS)))
    out = []
    pos = 1
    rest = text
    while True:
        m = regex.search(rest)
        if m is None:
            return out  # trailing remainder dropped (Cooccurrence.py:51-53 quirk)
        out.append((rest[: m.start(1)], pos))
        pos += INCR[DELIMS.index(m.group(1))]
        rest = rest[m.end(1) :]


def people_in_text(text: str, registry: dict[str, list[str]]) -> list[str]:
    """repeatOK=False: each person at most once."""
    return [p for p in sorted(registry) if any(s in text for s in registry[p])]


def occurrences_in_text(text: str, registry: dict[str, list[str]]) -> list[tuple[int, str, str]]:
    """repeatOK=True per clause: one entry per (clause, person, surface)."""
    out = []
    for clause, pos in clause_positions(text):
        for person in sorted(registry):
            for surface in registry[person]:
                if surface and surface in clause:
                    out.append((pos, person, surface))
    return out


def cooccurrence_scores(
    text: str, registry: dict[str, list[str]], biographee: str
) -> dict[tuple[str, str], float]:
    """Pair distances + biographee priors + sorted depreciating fold."""
    indexed = [(pos, person) for pos, person, _s in occurrences_in_text(text, registry)]
    dists: list[tuple[str, str, float]] = []
    for a in range(len(indexed)):
        for b in range(a + 1, len(indexed)):
            if indexed[a][1] != indexed[b][1]:
                n1, n2 = sorted([indexed[a][1], indexed[b][1]])
                dists.append((n1, n2, float(indexed[b][0] - indexed[a][0] + 1)))
    for person in people_in_text(text, registry):
        n1, n2 = sorted([biographee, person])
        dists.append((n1, n2, 2.0))
    dists.sort()
    scores: dict[tuple[str, str], float] = {}
    current = None
    depre = 0.65
    for n1, n2, d in dists:
        if (n1, n2) != current:
            current = (n1, n2)
            depre = 0.65
            scores[(n1, n2)] = 4.0 / d
        else:
            scores[(n1, n2)] += 4.0 / d * depre
            depre **= 2
    return {k: v for k, v in scores.items() if k[0] != k[1]}


# ===================================================================== N5 ==
# Verb-relation cascade, transcribed literally from Relationship.py:35-189
# (zh conversion omitted: the stand-in annotator is hermetic, fixtures are
# traditional-script throughout).

from information_extraction_from_biographies_spark.gazetteers import (  # noqa: E402
    KINSHIP_CHARS,
    NOUN_LEXICON,
    VERB_LEXICON,
)

_PARTICLE_CHARS = "與和被因的為其是於而了之在到至及暨並亦也皆均曾遂乃即後時年月日"
SENTINEL = "there has no relationships"


def build_vocab(surfaces) -> dict[str, tuple[int, str]]:
    """word → (class_rank, pos). Rank ties resolve NR > VV > NN, matching
    jieba-style user-dict priority (the annotator spec)."""
    vocab: dict[str, tuple[int, str]] = {}
    for rank, (words, pos) in enumerate(
        [(list(surfaces), "NR"), (list(VERB_LEXICON), "VV"), (list(NOUN_LEXICON), "NN")]
    ):
        for w in words:
            if w and (w not in vocab or rank < vocab[w][0]):
                vocab[w] = (rank, pos)
    return vocab


def segment(clause: str, vocab: dict) -> list[tuple[str, str]]:
    """Longest-prefix probe against the dict vocab (the engine scans a
    first-char-bucketed length-sorted index instead)."""
    toks: list[tuple[str, str]] = []
    maxlen = max((len(w) for w in vocab), default=0)
    i = 0
    while i < len(clause):
        hit = None
        for L in range(min(maxlen, len(clause) - i), 0, -1):
            cand = clause[i : i + L]
            if cand in vocab:
                hit = (cand, vocab[cand][1])
                break
        if hit is not None:
            toks.append(hit)
            i += len(hit[0])
        elif clause[i].isdigit():
            j = i + 1
            while j < len(clause) and clause[j].isdigit():
                j += 1
            toks.append((clause[i:j], "CD"))
            i = j
        elif clause[i] in _PARTICLE_CHARS:
            toks.append((clause[i], "P"))
            i += 1
        else:
            toks.append((clause[i], "X"))
            i += 1
    return toks


def dep_annotation(clause: str, vocab: dict) -> dict:
    """Surface-keyed token dict (last-wins collisions, Relationship.py:
    153-156 shape) + the four biographical-idiom dependency patterns that
    stand in for CoreNLP's depparse."""
    toks = segment(clause, vocab)
    ann: dict[str, dict] = {}
    for w, pos in toks:
        ann[w] = {"pos": pos, "dependency": {}}
    n = len(toks)
    for i, (w, pos) in enumerate(toks):
        if w == "被" and i + 1 < n and toks[i + 1][1] == "NR":  # 被-agent
            agent = toks[i + 1][0]
            for w2, p2 in toks[i + 2 :]:
                if p2 == "VV":
                    ann[w2]["dependency"]["nsubj"] = agent
                    break
        if (  # copula: NOUN 為 NAME
            w == "為"
            and 0 < i < n - 1
            and toks[i + 1][1] == "NR"
            and toks[i - 1][1] in ("NN", "X")
        ):
            ann[toks[i + 1][0]]["dependency"]["nsubj"] = toks[i - 1][0]
        if (  # 因 NAME 的 W attribution
            w == "因"
            and i + 3 < n
            and toks[i + 1][1] == "NR"
            and toks[i + 2][0] == "的"
        ):
            tgt = toks[i + 3][0]
            ann[tgt]["pos"] = "NN"
            ann[tgt]["dependency"]["nmod:assmod"] = toks[i + 1][0]
        if pos == "VV" and i + 1 < n and toks[i + 1][1] == "NN":  # verb-object
            ann[w]["dependency"].setdefault("dobj", toks[i + 1][0])
    return ann


def extract_line(corpus: str, name: str) -> list[str]:
    """Relationship.py:61-71, literal (containment probed pre-paren-strip)."""
    corpus = corpus.replace("\n\n", "")
    parts = list(filter(None, re.split("，|。", corpus)))
    result = []
    for line in parts:
        if name in line:
            if "（" in line:
                line = re.sub("（(.*?)）", "", line)
            result.append(line)
    return result


def relationship(line: str, main_char: str, obj: str, vocab: dict):
    """Relationship.py:73-145, literal (incl. the immediate-return rules,
    verb-over-noun priority, and the sentinel STRING on no match)."""
    dep_dict = dep_annotation(line, vocab)
    verb_output = []
    nn_output = []
    if obj in dep_dict.keys():
        if "nsubj" in dep_dict[obj]["dependency"].keys():
            return ["{} {} {}".format(main_char, dep_dict[obj]["dependency"]["nsubj"], obj)]
    for word in dep_dict:
        if dep_dict[word]["pos"] == "VV":
            if (word not in obj) and (word not in main_char):
                word_deps = dep_dict[word]["dependency"].keys()
                if "nsubj" in word_deps:
                    nsubj = dep_dict[word]["dependency"]["nsubj"]
                    if "dobj" in word_deps:
                        dobj = dep_dict[word]["dependency"]["dobj"]
                        if nsubj == main_char:
                            if dobj == obj:
                                verb_output.append("{} {} {}".format(main_char, word, obj))
                            else:
                                verb_output.append("{} {}{} {}".format(main_char, word, dobj, obj))
                        else:
                            if dobj == obj:
                                verb_output.append("{} {}{} {}".format(main_char, nsubj, word, obj))
                            else:
                                verb_output.append(
                                    "{} {}{}{} {}".format(main_char, nsubj, word, dobj, obj)
                                )
                    else:
                        if (nsubj == obj) or (nsubj == main_char):
                            verb_output.append("{} {} {}".format(obj, word, main_char))
                        else:
                            verb_output.append("{} {}{} {}".format(obj, nsubj, word, main_char))
                else:
                    if "dobj" in word_deps:
                        dobj = dep_dict[word]["dependency"]["dobj"]
                        if dobj == obj:
                            verb_output.append("{} {} {}".format(main_char, word, obj))
                        else:
                            verb_output.append("{} {}{} {}".format(main_char, word, dobj, obj))
                    else:
                        verb_output.append("{} {} {}".format(main_char, word, obj))
        else:
            word_dep = dep_dict[word]["dependency"]
            if "nmod:assmod" in word_dep.keys() and word_dep["nmod:assmod"] == obj:
                return ["{} {} {}".format(obj, word, main_char)]
            else:
                for dp in word_dep:
                    if dp == "case" and dep_dict[word]["pos"] == "NN":
                        nn_output.append("{} {} {}".format(obj, word, main_char))
                    elif dep_dict[word]["dependency"][dp] == obj:
                        nn_output.append("{} {} {}".format(main_char, word, obj))
    if verb_output:
        return verb_output
    elif nn_output:
        return nn_output
    else:
        return SENTINEL  # extended char-wise by the caller, as the reference does


def verb_relations_for_conv(
    text: str, biographee: str, registry: dict[str, list[str]]
) -> set[tuple[str, str, str]]:
    """main_process + filter_relations, literal (Relationship.py:35-51,
    53-59, 166-189): every surface of every person present probes every
    line containing it; sentinel strings extend char-wise and die in the
    3-token filter."""
    people = people_in_text(text, registry)
    names: list[str] = []
    for p in people:
        for s in registry[p]:
            names.append(s)
    vocab = build_vocab(names)
    relations: list[str] = []
    for name in names:
        for line in extract_line(text, name):
            relations.extend(relationship(line, biographee, name, vocab))
    filtered: set[tuple[str, str, str]] = set()
    for relation in relations:
        splits = relation.split()
        if len(splits) != 3:
            continue
        name1, rel, name2 = splits
        if name1 == name2:
            continue
        if any(k in rel for k in KINSHIP_CHARS):
            continue
        filtered.add((name1, rel, name2))
    return filtered


# ===================================================================== N6 ==
# Timeline — literal transcription of Get_Timeline.py:17-83.

_ERA = "((民國)|(大正)|(昭和)|(光緒)|(明治)|咸豐|(乾隆)|(宣統))"
_START_PAT = _ERA + r"\d+年"
_END_PAT = r"。|([^到至]" + _ERA + r")\d+年"


def timeline(text: str, concise: bool = False, vocab: dict | None = None) -> dict[int, str]:
    """get_timeline: {year: event}, dict overwrite = last anchor wins."""
    positions_of_year = [m.start() for m in re.finditer(_START_PAT, text)]
    timeline_dict: dict[int, str] = {}
    for starting_pos in positions_of_year:
        m = re.search(_END_PAT, text[starting_pos + 1 :])
        ending_pos = (m.span()[0] + starting_pos + 1) if m is not None else len(text)
        raw = text[starting_pos:ending_pos]
        ym = re.search(r"19\d{2}|20\d{2}", raw)
        if ym is None:
            continue
        year = raw[ym.span()[0] : ym.span()[1]]
        raw_event = raw[ym.span()[1] + 1 :]  # +1 skips the closing bracket
        if not concise:
            event = raw_event[1:] if raw_event[:1] == "，" else raw_event
        else:
            event = concise_event(raw_event, vocab or {})
        timeline_dict[int(year)] = event
    return timeline_dict


def concise_event(raw_event: str, vocab: dict) -> str:
    """complex_process_raw_event_of_the_year (Get_Timeline.py:63-83):
    gov+dep per dobj/iobj, dep+gov per nsubj/csubj, ，-joined; the
    stripped raw event when no such dependency exists."""
    stripped = raw_event[1:] if raw_event[:1] == "，" else raw_event
    parts: list[str] = []
    for word, info in dep_annotation(stripped, vocab).items():
        for label, child in info["dependency"].items():
            if label in ("dobj", "iobj"):
                parts.append(word + child)
            elif label in ("nsubj", "csubj"):
                parts.append(child + word)
    return "，".join(parts) if parts else stripped
