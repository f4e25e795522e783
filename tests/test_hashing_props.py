"""Property tests (Hypothesis) for the SQL-mirrorable hash kernels —
the invariants the DuckDB-oracle parity rests on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from information_extraction_from_biographies_spark.functions import hashing as H  # noqa: N812

TEXT = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFFF, blacklist_categories=("Cs",)),
    max_size=400,
)


def fold_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * H.B + ord(ch)) % H.P
    return h


@settings(max_examples=200, deadline=None)
@given(TEXT, st.integers(min_value=2, max_value=12))
def test_window_hashes_equal_char_fold_everywhere(text, n):
    coeffs = np.asarray(H.poly_coeffs(n), dtype=np.int64)
    got = H.window_hashes(H.codepoints(text), n, coeffs)
    expect = [fold_hash(text[i : i + n]) for i in range(max(len(text) - n + 1, 0))]
    assert got.tolist() == expect


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_prefix_hash_equals_fold(text):
    assert H.prefix_hash(H.codepoints(text)) == fold_hash(text)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=H.P - 1), min_size=1, max_size=50))
def test_minhash_transform_stays_in_field_and_orders_consistently(hs):
    """Affine minwise values stay in [0, P); the signature is permutation-
    invariant in the shingle set (min over a set)."""
    a, b = H.minhash_params(8)
    arr = np.asarray(hs, dtype=np.int64)
    sig = [int(((a[i] * arr + b[i]) % H.P).min()) for i in range(8)]
    assert all(0 <= v < H.P for v in sig)
    rng = np.random.RandomState(0)
    perm = arr[rng.permutation(len(arr))]
    sig2 = [int(((a[i] * perm + b[i]) % H.P).min()) for i in range(8)]
    assert sig == sig2


@settings(max_examples=50, deadline=None)
@given(TEXT, TEXT)
def test_identical_texts_collide_distinct_rarely(t1, t2):
    """Equal texts hash equal (determinism); the fold is a function."""
    assert fold_hash(t1) == fold_hash(t1)
    if t1 == t2:
        assert fold_hash(t1) == fold_hash(t2)


# ---------------------------------------------------------------- CC props
def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=40), st.integers(min_value=0, max_value=40)),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_match_union_find(spark, edges):
    """Iterative min-label propagation ≡ union-find on random graphs
    (incl. self-loops and duplicate edges)."""
    from information_extraction_from_biographies_spark.operators.canonicalize import (
        connected_components,
    )

    df = spark.createDataFrame(edges, "src int, dst int")
    got = {int(r["vertex"]): int(r["component"]) for r in connected_components(df).collect()}
    # union-find reference uses min-id component representative, like the operator
    expect = _union_find_components(edges)
    # normalize: map each vertex to the min vertex of its component
    comp_min = {}
    for v, root in expect.items():
        comp_min.setdefault(root, v)
        comp_min[root] = min(comp_min[root], v)
    expect_min = {v: comp_min[root] for v, root in expect.items()}
    assert got == expect_min


def test_connected_components_long_chain(spark):
    """Pointer doubling: a 200-hop path (diameter >> max_iter) must fully
    converge — plain one-hop propagation silently mislabeled it."""
    from information_extraction_from_biographies_spark.operators.canonicalize import (
        connected_components,
    )

    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {int(r["vertex"]): int(r["component"]) for r in connected_components(df).collect()}
    assert got == {v: 0 for v in range(201)}


@given(
    st.integers(min_value=4, max_value=10),
    st.integers(min_value=0, max_value=(1 << 60) - 1),
    st.lists(st.integers(min_value=0, max_value=59), min_size=0, max_size=9, unique=True),
)
@settings(max_examples=200, deadline=None)
def test_band_bounds_pigeonhole_exact(bands, base, flip_bits):
    """band_bounds layout: widths partition the 60 bits exactly, and any
    pair within hamming <= bands-1 shares at least one equal band (the
    exactness property the blocking relies on)."""
    from information_extraction_from_biographies_spark.operators.dedup import band_bounds

    bounds = band_bounds(bands)
    assert sum(w for _o, w in bounds) == 60
    assert len(bounds) == bands
    offs = [o for o, _w in bounds]
    assert offs == sorted(set(offs))  # disjoint, increasing

    if len(flip_bits) <= bands - 1:
        other = base
        for b in flip_bits:
            other ^= 1 << b
        shares = any(
            (base >> off) & ((1 << w) - 1) == (other >> off) & ((1 << w) - 1)
            for off, w in bounds
        )
        assert shares


@settings(max_examples=200, deadline=None)
@given(TEXT, st.integers(min_value=2, max_value=8))
def test_ngram_kernel_equals_prefix_hash64_on_arbitrary_text(text, n):
    """The decontamination kernel's prefix-sum substring algebra must
    equal hashing.prefix_hash64 of each gram's text for ANY unicode
    input — the invariant its SQL-mirrorability rests on."""
    import re

    from information_extraction_from_biographies_spark.operators.curation import (
        PowTable,
        _ngram_poly_hashes,
    )

    got = set(_ngram_poly_hashes(text, n, PowTable()).tolist())
    toks = [t for t in re.sub(r"[\W_]+", " ", text.lower()).split() if t]
    if not toks:
        expected = set()
    elif len(toks) < n:
        expected = {H.prefix_hash64(H.codepoints(" ".join(toks)))}
    else:
        expected = {
            H.prefix_hash64(H.codepoints(" ".join(toks[i : i + n])))
            for i in range(len(toks) - n + 1)
        }
    assert got == expected
