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
"""

from __future__ import annotations

import re

from ..gazetteers import ERA_NAMES

_ERA_ALT = "|".join("({})".format(e) for e in ERA_NAMES)
_START_RE = re.compile(r"({})\d+年".format("|".join(ERA_NAMES)))
_END_RE = re.compile(r"。|([^到至]({}))\d+年".format("|".join(ERA_NAMES)))
_WESTERN_YEAR_RE = re.compile(r"19\d{2}|20\d{2}")


def extract_timeline(text: str) -> list[tuple[int, str, int]]:
    """Return [(year, event, start_pos)] — one row per surviving span."""
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
        out.append((year, event, start))
    return out
