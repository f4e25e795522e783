"""Text analysis operators for a documents table — language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All but the rolling-hash fingerprint are pure column expressions (JVM-side,
whole-stage-codegen friendly); the fingerprint is an Arrow-batched pandas
UDF (order-sensitive polynomial hash has no built-in equivalent).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "des", "une", "dans"],
    "es": ["el", "los", "las", "una", "por", "con", "para"],
}


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (len/4 heuristic à la
    byte-pair budget) — pure expressions."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("ws_tokens"),
        F.ceil(F.length(text_col) / 4).cast("long").alias("bpe_tokens_est"),
    )


def _count_words(text_col: str, words: list[str]):
    """Occurrences of any of `words` as whole words — size(split)-1 trick
    (expressible identically in ANSI SQL for the oracle)."""
    total = F.lit(0)
    for w in words:
        total = total + F.size(F.split(F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" ")), f"\\s{w}\\s")) - F.lit(1)
    return total


def language_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-count score per language — the n-gram/funcword heuristic."""
    cols = [_count_words(text_col, ws).alias(f"score_{lang}") for lang, ws in _STOPWORDS.items()]
    return docs.select("doc_id", *cols)


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / uppercase ratios + composite."""
    length = F.length(text_col)
    punct = length - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    upper = length - F.length(F.regexp_replace(F.col(text_col), r"[A-Z]", ""))
    ws_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    stop = _count_words(text_col, _STOPWORDS["en"])
    return docs.select(
        "doc_id",
        length.alias("n_chars"),
        ws_tokens.alias("n_tokens"),
        F.round(punct / F.greatest(length, F.lit(1)), 6).alias("punct_ratio"),
        F.round(upper / F.greatest(length, F.lit(1)), 6).alias("upper_ratio"),
        F.round(stop / F.greatest(ws_tokens, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(length / F.greatest(ws_tokens, F.lit(1)), 6).alias("mean_token_len"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", window: int = 16) -> DataFrame:
    """Winnowing-style document fingerprint: min of rolling polynomial
    hashes over char windows — pandas UDF (order-sensitive)."""
    MOD = (1 << 61) - 1
    BASE = 257

    def _fp(batches):
        for pdf in batches:
            ids, fps = [], []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                s = str(text)
                if len(s) < window:
                    h = 0
                    for ch in s:
                        h = (h * BASE + ord(ch)) % MOD
                    ids.append(did)
                    fps.append(h)
                    continue
                h = 0
                power = pow(BASE, window, MOD)  # weight of the char leaving the window
                best = None
                for i, ch in enumerate(s):
                    h = (h * BASE + ord(ch)) % MOD
                    if i >= window:
                        h = (h - ord(s[i - window]) * power) % MOD
                    if i >= window - 1:
                        best = h if best is None or h < best else best
                ids.append(did)
                fps.append(best)
            yield pd.DataFrame({"doc_id": ids, "fingerprint": fps})

    return docs.select("doc_id", text_col).mapInPandas(_fp, schema="doc_id long, fingerprint long")
