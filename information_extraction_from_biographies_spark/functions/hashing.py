"""Deterministic, SQL-mirrorable hash primitives shared by the dedup /
fingerprint operators and their DuckDB oracles.

Two families, chosen so the SAME value is computable three ways — as a
Spark column expression (JVM, codegen), as vectorized numpy (Arrow batch
UDFs), and as ANSI-ish SQL (DuckDB oracle):

- ``tok_hash60``      — first 15 hex chars of md5 → 60-bit non-negative
                        int. Spark: conv(substr(md5(x),1,15),16,10);
                        DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT.
                        Used where per-token quality matters (SimHash).
- polynomial hash     — Σ codepoint·B^j mod P with P = 2^31−1,
                        B = 1000003: every intermediate product fits in
                        int64 (cp < 2^21, B^j mod P < 2^31), so numpy
                        int64 vectorizes it and DuckDB BIGINT evaluates
                        it without overflow. Used for char n-gram
                        shingles (MinHash) and the winnowing fingerprint,
                        where a doc has |text| hashes and md5-per-shingle
                        would be the bottleneck.

MinHash uses k affine minwise transforms g_i(h) = (a_i·h + b_i) mod P
with (a_i, b_i) drawn once from a seeded RandomState — emitted as SQL
literals for the oracle.
"""

from __future__ import annotations

import numpy as np

P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
B = 1_000_003
# second independent base for 62-bit combined hashes (decontamination:
# a single 31-bit hash false-positives at ~n_corpus·n_block/2^31 gram
# pairs — measured 1,265 false drops on a 500k-doc soak; the pair
# (h_B, h_B2) packed as h_B·2^31 + h_B2 stays int64 and pushes the
# birthday bound to 2^62)
B2 = 1_000_033


def tok_hash60_col(col):
    """Spark Column: 60-bit md5-derived token hash (non-negative long)."""
    from pyspark.sql import functions as F  # noqa: N812

    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tok_hash60_sql(expr: str) -> str:
    """DuckDB SQL mirroring :func:`tok_hash60_col`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def poly_coeffs(n: int) -> list[int]:
    """[B^(n-1), B^(n-2), .., B^0] mod P — weights for an n-char window so
    hash(window) = Σ_t cp[t]·coeff[t] mod P (matches the classic rolling
    update h = (h·B + cp) mod P)."""
    return [pow(B, n - 1 - t, P) for t in range(n)]


def minhash_params(num_hashes: int, seed: int = 29) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) int64 arrays for k affine minwise transforms; a ∈ [1, P-1],
    b ∈ [0, P-1], fixed by seed (same literals go into the oracle SQL)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, P, size=num_hashes).astype(np.int64)
    b = rng.randint(0, P, size=num_hashes).astype(np.int64)
    return a, b


def codepoints(text: str) -> np.ndarray:
    """Unicode code points as int64 (matches SQL unicode(substr(s,i,1)))."""
    if not text:
        return np.zeros(0, dtype=np.int64)
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)


def window_hashes(cps: np.ndarray, n: int, coeffs: np.ndarray) -> np.ndarray:
    """Polynomial hash of every length-n window (vectorized; empty if the
    text is shorter than n). Products cp·coeff < 2^21·2^31 = 2^52 and the
    n-term sum < 2^52·n stay well inside int64 for n ≤ 1024."""
    if len(cps) < n:
        return np.zeros(0, dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(cps, n)
    return (win @ coeffs) % P


def prefix_hash(cps: np.ndarray, base: int = B) -> int:
    """Whole-string polynomial hash (the len<window fingerprint case):
    fold h = (h·base + cp) mod P."""
    h = 0
    for cp in cps.tolist():
        h = (h * base + cp) % P
    return h


def prefix_hash64(cps: np.ndarray) -> int:
    """62-bit combined polynomial hash: h_B·2^31 + h_B2 (see B2). Fits
    int64; mirrorable in SQL as two prefix_hash_sql-style sums."""
    return (prefix_hash(cps, B) << 31) + prefix_hash(cps, B2)


def window_hash_sql(text_expr: str, pos_expr: str, n: int) -> str:
    """DuckDB SQL: polynomial hash of the n-char window of ``text_expr``
    starting at 1-based position ``pos_expr`` — mirrors window_hashes()."""
    coeffs = poly_coeffs(n)
    terms = " + ".join(
        f"unicode(substr({text_expr}, CAST({pos_expr} + {t} AS INT), 1)) * {coeffs[t]}::BIGINT"
        for t in range(n)
    )
    return f"(({terms}) % {P})"


def prefix_hash_sql(text_expr: str, max_len: int) -> str:
    """DuckDB SQL: whole-string polynomial hash for strings shorter than
    ``max_len`` chars (list-literal power lookup) — mirrors prefix_hash()."""
    pows = [pow(B, j, P) for j in range(max_len)]
    pow_list = "[" + ", ".join(f"{v}::BIGINT" for v in pows) + "]"
    # Σ_j cp_j · B^(len-j) with 1-based j; list index len-j+1 picks B^(len-j)
    return f"""(
      SELECT COALESCE(sum(unicode(substr({text_expr}, CAST(jj AS INT), 1))
                          * ({pow_list})[CAST(length({text_expr}) - jj + 1 AS INT)]) % {P}, 0)
      FROM unnest(generate_series(1, CAST(length({text_expr}) AS BIGINT))) t(jj)
    )"""
