"""Aho-Corasick multi-pattern matcher (J1 — the mention-scan join).

The reference's mention scan is a nested-loop theta join: for every person
and every alias, ``text.find(surface)`` (``Utilities.py:49-67``) — O(|texts|
× |dictionary|). Expressed in SQL that plans as a BroadcastNestedLoopJoin.
This matcher makes it one pass per text over a broadcast automaton:
O(|text| + matches), the physical strategy SURVEY.md §4 calls for.

Built once on the driver from the people registry, pickled into the pandas
UDF closure, so each executor pays construction once per task set.
"""

from __future__ import annotations

import uuid
from collections import OrderedDict, deque


class AhoCorasick:
    """Multi-pattern string matcher over unicode code points."""

    def __init__(self, patterns: list[str]) -> None:
        # goto: list of dicts char -> state; output: pattern indices ending here
        self._goto: list[dict[str, int]] = [{}]
        self._out: list[list[int]] = [[]]
        self._fail: list[int] = [0]
        self.patterns: list[str] = []
        for pat in patterns:
            self._insert(pat)
        self._build_links()
        self._pat_len = [len(p) for p in self.patterns]

    def _insert(self, pat: str) -> None:
        if not pat:
            return
        idx = len(self.patterns)
        self.patterns.append(pat)
        state = 0
        for ch in pat:
            nxt = self._goto[state].get(ch)
            if nxt is None:
                nxt = len(self._goto)
                self._goto.append({})
                self._out.append([])
                self._fail.append(0)
                self._goto[state][ch] = nxt
            state = nxt
        self._out[state].append(idx)

    def _build_links(self) -> None:
        queue: deque[int] = deque()
        for state in self._goto[0].values():
            self._fail[state] = 0
            queue.append(state)
        while queue:
            cur = queue.popleft()
            for ch, nxt in self._goto[cur].items():
                queue.append(nxt)
                fail = self._fail[cur]
                while fail and ch not in self._goto[fail]:
                    fail = self._fail[fail]
                self._fail[nxt] = self._goto[fail].get(ch, 0)
                if self._fail[nxt] == nxt:
                    self._fail[nxt] = 0
                self._out[nxt] = self._out[nxt] + self._out[self._fail[nxt]]

    def finditer(self, text: str):
        """Yield (start, pattern_index) for every occurrence.

        Hot loop: locals-bound tables and a state-0 fast path (most chars
        of a conversation match no surface prefix, so the walk spends
        nearly all its time at the root — one bound ``dict.get`` per char
        instead of a list index + membership probe + attribute lookups)."""
        goto, fail, out = self._goto, self._fail, self._out
        root_get = goto[0].get
        pat_len = self._pat_len
        state = 0
        for i, ch in enumerate(text):
            if state:
                while state and ch not in goto[state]:
                    state = fail[state]
                state = goto[state].get(ch, 0) if state else root_get(ch, 0)
            else:
                state = root_get(ch, 0)
            if out[state]:
                for pat_idx in out[state]:
                    yield i - pat_len[pat_idx] + 1, pat_idx

    def contained(self, text: str) -> set[int]:
        """Distinct pattern indices occurring in ``text`` — the containment
        semantics of the reference's ``text.find(x) != -1`` probe.
        Loop inlined (no generator frame per hit): same tables as
        ``finditer``, accumulating into the set directly."""
        goto, fail, out = self._goto, self._fail, self._out
        root_get = goto[0].get
        found: set[int] = set()
        state = 0
        for ch in text:
            if state:
                while state and ch not in goto[state]:
                    state = fail[state]
                state = goto[state].get(ch, 0) if state else root_get(ch, 0)
            else:
                state = root_get(ch, 0)
            if out[state]:
                found.update(out[state])
        return found

    def contains_any(self, text: str) -> bool:
        """True iff ANY pattern occurs — short-circuits on the first hit
        (``contained`` walks the whole text; the rescan probe only needs
        a boolean per conversation)."""
        goto, fail, out = self._goto, self._fail, self._out
        root_get = goto[0].get
        state = 0
        for ch in text:
            if state:
                while state and ch not in goto[state]:
                    state = fail[state]
                state = goto[state].get(ch, 0) if state else root_get(ch, 0)
            else:
                state = root_get(ch, 0)
            if out[state]:
                return True
        return False


class SurfaceIndex:
    """Surface → persons mapping backed by one Aho-Corasick automaton.

    A surface form (name or alias) may belong to several persons (shared
    號 etc.); the reference's scan likewise appends every person whose
    surface is found (``Utilities.py:49-67``).
    """

    def __init__(self, surface_persons: list[tuple[str, str, str]]) -> None:
        """``surface_persons``: (surface, person_name, surface_kind) where
        surface_kind is 'name' or the alias type."""
        self._surfaces: list[str] = []
        self._payloads: list[list[tuple[str, str]]] = []
        seen: dict[str, int] = {}
        for surface, person, kind in surface_persons:
            if not surface:
                continue
            pos = seen.get(surface)
            if pos is None:
                pos = len(self._surfaces)
                seen[surface] = pos
                self._surfaces.append(surface)
                self._payloads.append([])
            self._payloads[pos].append((person, kind))
        self._ac = AhoCorasick(self._surfaces)
        # persons_in_clauses joins clauses on NUL; a surface containing it
        # (never true for extracted text) forces the per-clause fallback
        self._has_nul = any("\x00" in s for s in self._surfaces)
        # payload order is fixed after build — sort once IN PLACE, not per
        # probe (a parallel sorted copy would double payload memory in
        # every worker-cached index; the only other reader,
        # person_surfaces, is order-insensitive)
        for p in self._payloads:
            p.sort()

    def _rows_for(self, ids) -> list[tuple[str, str, str]]:
        """(person, surface, kind) rows for a pattern-index set, in the
        parity-pinned order: ascending pattern index (= surface first-seen
        order), then sorted payloads. THE one copy of the ordering
        contract — persons_in / persons_in_clauses / scan_text_clauses all
        assemble through it, so the fused and unfused paths cannot
        drift."""
        rows = []
        for idx in sorted(ids):
            surface = self._surfaces[idx]
            for person, kind in self._payloads[idx]:
                rows.append((person, surface, kind))
        return rows

    def persons_in(self, text: str) -> list[tuple[str, str, str]]:
        """All (person, surface, kind) with surface contained in text,
        deterministic order (by surface then person)."""
        return self._rows_for(self._ac.contained(text))

    def scan_text_clauses(
        self, text: str, spans: list[tuple[int, int]]
    ) -> tuple[list[str], list[list[tuple[str, str, str]]]]:
        """``(distinct_persons_in(text), [persons_in(text[s:e]) for s, e
        in spans])`` in ONE automaton pass over ``text``.

        The stage-2 kernel needs both the full-conversation detection set
        and the per-clause occurrence sets; run separately that is two
        full automaton walks (detection over ``text``, then
        persons_in_clauses over a NUL-joined copy of nearly the same
        characters). Because clauses are verbatim non-overlapping ordered
        substrings of ``text`` (clauses.split_clauses_with_offsets), one
        full-text walk serves both exactly:

        - a match is contained in clause ``j`` iff its full-text start
          falls at/after the clause start and it ends within the clause
          — bucketing every hit by ``bisect(starts)`` + an end-bound
          check reproduces the isolated per-clause scan bijectively
          (matches that straddle a delimiter or land in the dropped
          trailing remainder fail the bound check, exactly as they are
          invisible to the isolated scan);
        - the distinct hit set of the same walk IS ``contained(text)``.

        Result order parity: detection replays distinct_persons_in's
        first-seen-person order over sorted pattern indices; per-clause
        rows replay persons_in's (surface-insertion, then payload) order.
        ``spans`` must be sorted, non-overlapping (start, end) offsets."""
        full: set[int] = set()
        per: list[set[int]] = [set() for _ in spans]
        if spans:
            from bisect import bisect_right

            starts = [s for s, _ in spans]
            pat_len = self._ac._pat_len
            for start, pat_idx in self._ac.finditer(text):
                full.add(pat_idx)
                j = bisect_right(starts, start) - 1
                if j >= 0 and start + pat_len[pat_idx] <= spans[j][1]:
                    per[j].add(pat_idx)
        else:
            full = self._ac.contained(text)
        return self._distinct_from(full), [self._rows_for(ids) for ids in per]

    def _distinct_from(self, pattern_ids) -> list[str]:
        """distinct_persons_in's first-seen-person order replayed from a
        pattern-index set — the one copy of the repeatOK=False dedup
        (Utilities.py:60-65), shared by the fused and unfused paths."""
        seen: set[str] = set()
        out: list[str] = []
        for person, _, _ in self._rows_for(pattern_ids):
            if person not in seen:
                seen.add(person)
                out.append(person)
        return out

    def persons_in_clauses(self, clauses: list[str]) -> list[list[tuple[str, str, str]]]:
        """``[persons_in(c) for c in clauses]`` in ONE automaton pass over
        ``'\\x00'.join(clauses)`` — the per-clause scan of a conversation
        profiled at ~1/3 of fused-pass kernel time, dominated by the
        per-call automaton restart + Python call overhead (one conversation
        splits into ~100 clauses). No surface contains the NUL separator
        (guarded at build; fallback loops per clause if one ever does), so
        a match can never span two clauses — per-clause isolation semantics
        and result order are preserved exactly (parity-pinned)."""
        if not clauses:
            return []
        if self._has_nul:
            return [self.persons_in(c) for c in clauses]
        from bisect import bisect_right

        starts = []
        off = 0
        for c in clauses:
            starts.append(off)
            off += len(c) + 1
        hits: list[set[int]] = [set() for _ in clauses]
        for start, pat_idx in self._ac.finditer("\x00".join(clauses)):
            hits[bisect_right(starts, start) - 1].add(pat_idx)
        return [self._rows_for(ids) for ids in hits]

    def distinct_persons_in(self, text: str) -> list[str]:
        """repeatOK=False semantics: each person at most once
        (Utilities.py:60-65 first-hit short circuit)."""
        return self._distinct_from(self._ac.contained(text))

    def any_in(self, text: str) -> bool:
        """True iff any surface is contained in ``text`` (first-hit
        short-circuit) — the incremental rescan's affected-history probe."""
        return self._ac.contains_any(text)

    def person_surfaces(self) -> dict[str, list[str]]:
        """person → sorted distinct surfaces (the reference's
        get_all_names_of_people, Relationship.py:53-59). Memoized — called
        once per applyInPandas group."""
        cached = getattr(self, "_person_surfaces", None)
        if cached is not None:
            return cached
        out: dict[str, set] = {}
        for surface, payloads in zip(self._surfaces, self._payloads):
            for person, _kind in payloads:
                out.setdefault(person, set()).add(surface)
        result = {p: sorted(s) for p, s in out.items()}
        self._person_surfaces = result
        return result


class SurfaceIndexHandle:
    """Driver-side handle that ships the RAW surface rows via a Spark
    broadcast; each executor python worker builds the Aho-Corasick automaton
    ONCE (module-level cache keyed by version) instead of unpickling a
    multi-MB automaton object per task from the UDF closure — the scalable
    distribution of J1's probe dictionary."""

    def __init__(self, spark, rows: list[tuple[str, str, str]]) -> None:
        self.version = uuid.uuid4().hex
        self.rows = rows
        self.broadcast = spark.sparkContext.broadcast((self.version, rows))
        self._local: SurfaceIndex | None = None

    def local(self) -> SurfaceIndex:
        """Driver-side index (built lazily on first driver use)."""
        if self._local is None:
            self._local = SurfaceIndex(self.rows)
        return self._local

    def worker_getter(self):
        """Picklable worker-side index accessor (see _BroadcastGetter)."""
        return _BroadcastGetter(self.broadcast)


class _BroadcastGetter:
    """Closure-safe accessor: broadcast handle in, cached automaton out."""

    def __init__(self, broadcast) -> None:
        self._broadcast = broadcast

    def __call__(self) -> "SurfaceIndex":
        return cached_index(self._broadcast)


class FileSurfaceIndexHandle:
    """Registry-on-parquet handle for HUGE registries (≥10^7 surfaces):
    the driver never collects the rows — executors read the parquet
    themselves (pyarrow, local read per worker) and build the automaton
    once per worker (same version-keyed cache). The driver ships only the
    path + version string in the UDF closure.

    Interface-compatible with SurfaceIndexHandle (.local(), .rows,
    .worker_getter()); ``scan.build_surface_index(via_file=...)`` writes
    the parquet and returns this handle."""

    def __init__(self, path: str, version: str | None = None) -> None:
        self.path = path
        self.version = version or ("file:" + path + ":" + uuid.uuid4().hex)
        self._rows: list[tuple[str, str, str]] | None = None
        self._local: SurfaceIndex | None = None

    def _read_rows(self) -> list[tuple[str, str, str]]:
        return _read_surface_rows(self.path)

    @property
    def rows(self) -> list[tuple[str, str, str]]:
        if self._rows is None:
            self._rows = self._read_rows()
        return self._rows

    def local(self) -> SurfaceIndex:
        if self._local is None:
            self._local = SurfaceIndex(self.rows)
        return self._local

    def worker_getter(self):
        return _FileGetter(self.path, self.version)


class _FileGetter:
    """Worker-side: build-or-fetch the automaton from the registry parquet
    (no broadcast, no driver collect)."""

    def __init__(self, path: str, version: str) -> None:
        self._path = path
        self._version = version

    def __call__(self) -> "SurfaceIndex":
        return _cache_get_or_build(
            self._version, lambda: SurfaceIndex(_read_surface_rows(self._path))
        )


def _read_surface_rows(path: str) -> list[tuple[str, str, str]]:
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["surface", "person", "kind"])
    return [
        (s, p, k)
        for s, p, k in zip(
            t.column("surface").to_pylist(),
            t.column("person").to_pylist(),
            t.column("kind").to_pylist(),
        )
        if s is not None
    ]


_WORKER_INDEX_CACHE: "OrderedDict[str, SurfaceIndex]" = OrderedDict()
_WORKER_INDEX_CACHE_MAX = 4


def _cache_get_or_build(version: str, builder) -> SurfaceIndex:
    """One LRU protocol for BOTH index-distribution paths (broadcast and
    registry-file): get-or-build keyed by version, evict oldest first,
    never the version being requested — a policy change can't silently
    apply to only one path."""
    idx = _WORKER_INDEX_CACHE.get(version)
    if idx is None:
        while len(_WORKER_INDEX_CACHE) >= _WORKER_INDEX_CACHE_MAX:
            _WORKER_INDEX_CACHE.popitem(last=False)  # least recently used
        idx = builder()
        _WORKER_INDEX_CACHE[version] = idx
    else:
        _WORKER_INDEX_CACHE.move_to_end(version)
    return idx


def cached_index(broadcast) -> SurfaceIndex:
    """Worker-side: build-or-fetch the automaton for a broadcast handle.
    Survives across tasks via python worker reuse. LRU eviction so >4
    live broadcast handles sharing a worker pool don't thrash full
    rebuilds."""
    version, rows = broadcast.value
    return _cache_get_or_build(version, lambda: SurfaceIndex(rows))
