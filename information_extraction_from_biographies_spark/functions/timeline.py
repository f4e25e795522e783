"""Timeline extraction (N6) — era-year anchored event spans.

Faithful to ``Get_Timeline.py:17-61`` (non-concise mode):

- anchors: (民國|大正|昭和|光緒|明治|咸豐|乾隆|宣統)\\d+年
- span ends at 。 or at the next era-year not preceded by 到/至
  (the ``[^到至]`` consumes the char before the era, so the span ends at
  that char — reproduced); unterminated spans run to end of text
- only spans containing a western year 19\\d{2}|20\\d{2} survive
- event = span text after the western year + 1 char (the reference skips
  the char after the year, assuming a closing bracket), leading ，stripped
- last occurrence per year wins (dict overwrite, ``Get_Timeline.py:54``) —
  emitted here with start_pos so the engine resolves last-wins with a
  window (A6), not a driver loop.

Concise mode (``Get_Timeline.py:63-83``): the event span is re-parsed
through the dependency annotator; each dobj/iobj dependency contributes
gov+dep, each nsubj/csubj contributes dep+gov, all joined by ，; if no
such dependency exists the stripped raw event is kept. The reference
uses its CoreNLP parse here — the engine reuses N5's deterministic
lexicon/pattern annotator (functions/relations.py), so concise output is
hermetic like the rest of stage 2.
"""

from __future__ import annotations

import re

from ..gazetteers import ERA_NAMES

_START_RE = re.compile(r"({})\d+年".format("|".join(ERA_NAMES)))
_END_RE = re.compile(r"。|([^到至]({}))\d+年".format("|".join(ERA_NAMES)))
_WESTERN_YEAR_RE = re.compile(r"19\d{2}|20\d{2}")


def extract_timeline(
    text: str, concise: bool = False, lex_index: dict | None = None
) -> list[tuple[int, str, int]]:
    """Return [(year, event, start_pos)] — one row per surviving span.

    ``concise=True`` condenses each event via the dependency annotator
    (Get_Timeline.py:63-83); ``lex_index`` optionally supplies the
    conversation's ``build_lex_index`` result so known person surfaces
    segment as NR (an empty lexicon still finds verb/noun pairs)."""
    out: list[tuple[int, str, int]] = []
    for anchor in _START_RE.finditer(text):
        start = anchor.start()
        em = _END_RE.search(text[start + 1 :])
        end = (em.start() + start + 1) if em is not None else len(text)
        raw = text[start:end]
        ym = _WESTERN_YEAR_RE.search(raw)
        if ym is None:
            continue
        year = int(raw[ym.start() : ym.end()])
        raw_event = raw[ym.end() + 1 :]
        event = raw_event[1:] if raw_event.startswith("，") else raw_event
        if concise:
            event = _concise_event(event, lex_index)
        out.append((year, event, start))
    return out


def _concise_event(event: str, lex_index: dict | None) -> str:
    """Condense an (already comma-stripped) event span: gov+dep for each
    dobj/iobj, dep+gov for each nsubj/csubj, ，-joined; falls back to the
    stripped raw event when no such dependency is found
    (Get_Timeline.py:75-83: complex_process_raw_event_of_the_year)."""
    from .relations import build_dep_dict, build_lex_index

    if lex_index is None:
        lex_index = build_lex_index([])
    dep = build_dep_dict(event, lex_index)
    parts: list[str] = []
    for word, info in dep.items():  # token order = the annotator's parse order
        for label, child in info["dependency"].items():
            if label in ("dobj", "iobj"):
                parts.append(word + child)
            elif label in ("nsubj", "csubj"):
                parts.append(child + word)
    return "，".join(parts) if parts else event
