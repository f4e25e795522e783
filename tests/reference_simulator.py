"""Independent oracle for order/position-sensitive reference semantics.

Implements — from the reference's *specification*, with deliberately
different code structure from the engine (engine: rank-based SQL /
Aho-Corasick; here: literal scan loops / str containment) — the pieces
whose goldens cannot be derived from templates alone:

- mature-text normalization (authors/title removal, Preprocess.py:151-174)
- clause positions (Cooccurrence.py:35-65, incl. dropped trailing clause)
- mention occurrences (Utilities.py:49-67 containment semantics)
- co-occurrence pair distances + depreciating fold (Cooccurrence.py:68-111)

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
