"""Clause splitting with delimiter identity (X4/W1) and relation lines.

Two distinct splitters exist in the reference and both are reproduced:

1. The co-occurrence splitter (``Cooccurrence.py:35-65``): iteratively cut
   at the leftmost delimiter of ，/。/。\\n\\n *followed by a word char*;
   position advances by 1/2/3 per delimiter kind. The alternation is
   ordered, but 。 before \\n fails the trailing ``\\w`` and backtracks into
   。\\n\\n, so all three increments are reachable. The trailing remainder
   (after the last matched delimiter) is NEVER emitted — the reference's
   while-loop exits on no-match, so people in the final clause are not
   position-indexed. Faithfully reproduced.

2. The relation line splitter (``Relationship.py:61-71``): remove \\n\\n,
   split on ，|。, drop empties, and strip （…） content from lines that
   contain the probe name.
"""

from __future__ import annotations

import re

from ..gazetteers import DELIMITERS, INCREMENTS

# finditer is equivalent to the reference's re-scan loop: the consumed \w
# char can never begin a delimiter (delimiters start with punctuation).
_CLAUSE_RE = re.compile("({})\\w".format("|".join(DELIMITERS)))
_LINE_SPLIT_RE = re.compile("，|。")
_PAREN_RE = re.compile("（(.*?)）")


def split_clauses_with_offsets(text: str) -> list[tuple[str, int, int]]:
    """[(clause, position, char_start)] — ``split_clauses_with_positions``
    plus each clause's char offset into ``text`` (clauses are verbatim
    non-overlapping substrings: ``text[char_start:char_start+len(clause)]
    == clause``). The offset lets one full-text automaton pass serve the
    per-clause scan exactly (matcher.scan_text_clauses)."""
    out = []
    pos = 1
    last_end = 0
    for m in _CLAUSE_RE.finditer(text):
        delim = m.group(1)
        out.append((text[last_end : m.start(1)], pos, last_end))
        pos += INCREMENTS[DELIMITERS.index(delim)]
        last_end = m.end(1)
    return out


def split_clauses_with_positions(text: str) -> list[tuple[str, int]]:
    """[(clause, position)] per Cooccurrence.py:35-53; position starts at 1
    and advances by the increment of the delimiter that *closed* the clause.
    The trailing remainder is dropped (see module docstring)."""
    return [(c, p) for c, p, _ in split_clauses_with_offsets(text)]


def relation_lines(text: str, name: str) -> list[str]:
    """Lines containing ``name``, parens stripped (Relationship.py:61-71)."""
    corpus = text.replace("\n\n", "")
    result = []
    for line in _LINE_SPLIT_RE.split(corpus):
        if line and name in line:
            if "（" in line:
                line = _PAREN_RE.sub("", line)
            result.append(line)
    return result


def all_relation_lines(text: str) -> list[str]:
    """All non-empty ，/。-split lines with parens kept (callers probe
    containment themselves when matching many names in one pass)."""
    corpus = text.replace("\n\n", "")
    return [line for line in _LINE_SPLIT_RE.split(corpus) if line]


def strip_parens(line: str) -> str:
    return _PAREN_RE.sub("", line) if "（" in line else line
