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


# GPT-2-style pre-tokenizer shape: word runs, number runs, or single
# punctuation marks — the regex budget most BPE vocabularies start from
_BPE_SPLIT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# CJK codepoints tokenize one-per-character (BPE vocabularies carry zh/ja
# chars as single tokens far more often than multi-char merges): CJK
# Unified + Ext A + Compatibility, Hiragana/Katakana, Hangul syllables.
# BMP-only (Java regex is UTF-16-unit based; Ext-B rarity doesn't justify
# surrogate-pair handling in the hot path).
_CJK_CLASS = "\\u3040-\\u30FF\\u3400-\\u4DBF\\u4E00-\\u9FFF\\uF900-\\uFAFF\\uAC00-\\uD7AF"
_CJK_SPLIT = rf"[{_CJK_CLASS}]|[A-Za-z]+|[0-9]+|[^{_CJK_CLASS}A-Za-z0-9\s]"


def token_count(docs: DataFrame, text_col: str = "text", mode: str = "ws") -> DataFrame:
    """Token-budget estimators, pure column expressions (JVM regex, no UDF).

    ``mode="ws"`` (default): whitespace tokens, the BPE-ish regex
    pre-token count, and the len/4 byte-budget estimate — the
    space-delimited-corpus surface the driver oracles.

    ``mode="cjk"`` → (doc_id, n_tokens): every CJK codepoint is its own
    token, interleaved Latin/digit runs and punctuation count as in the
    BPE split. On the reference's actual domain (Chinese biographies, no
    spaces) whitespace tokens are ~1 per document, which silently breaks
    ``pack_sequences`` budgets — this is the unit those budgets need.

    ``mode="chars"`` → (doc_id, n_tokens): non-whitespace codepoints, the
    blunt upper bound."""
    if mode == "ws":
        return docs.select(
            "doc_id",
            F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("ws_tokens"),
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(_BPE_SPLIT), F.lit(0))
            ).alias("re_tokens"),
            F.ceil(F.length(text_col) / 4).cast("long").alias("bpe_tokens_est"),
        )
    if mode == "cjk":
        counter = F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(_CJK_SPLIT), F.lit(0))
        )
    elif mode == "chars":
        counter = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    else:
        raise ValueError(f"mode must be 'ws', 'cjk' or 'chars', got {mode!r}")
    return docs.select("doc_id", counter.cast("long").alias("n_tokens"))


def _argmax_lang_col():
    """Argmax of the score_<lang> columns, deterministic alphabetical
    tie-break (first max wins)."""
    langs = sorted(_STOPWORDS)
    best = None
    for lang in langs:
        cond = F.lit(True)
        for other in langs:
            if other < lang:
                cond = cond & (F.col(f"score_{lang}") > F.col(f"score_{other}"))
            elif other > lang:
                cond = cond & (F.col(f"score_{lang}") >= F.col(f"score_{other}"))
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    return F.coalesce(best, F.lit(langs[0])).alias("lang")


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang): argmax of the stopword scores, deterministic
    alphabetical tie-break — the doc-level language assignment over
    language_scores."""
    return language_profile(docs, text_col).select("doc_id", "lang")


def language_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, score_<lang>..., lang): per-language stopword scores AND
    the argmax assignment in one pass — the counts are computed once and
    both outputs ride the same projection (no second scan)."""
    scored = language_scores(docs, text_col)
    return scored.select("doc_id", *[f"score_{lang}" for lang in _STOPWORDS], _argmax_lang_col())


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
    """Length / punctuation / stopword / uppercase ratios + a composite
    quality score in [0,1] for threshold filtering:

        0.5·min(1, 4·stopword_ratio)   natural running text has stopwords
      + 0.3·(1 − min(1, 5·punct_ratio)) symbol soup scores low
      + 0.2·min(1, n_tokens/100)        enough text to be trainable

    Deterministic, mirrored exactly in the DuckDB oracle."""
    length = F.length(text_col)
    punct = length - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    upper = length - F.length(F.regexp_replace(F.col(text_col), r"[A-Z]", ""))
    ws_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    stop = _count_words(text_col, _STOPWORDS["en"])
    stop_ratio = stop / F.greatest(ws_tokens, F.lit(1))
    punct_ratio = punct / F.greatest(length, F.lit(1))
    composite = (
        F.least(F.lit(1.0), stop_ratio * 4) * 0.5
        + (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * 5)) * 0.3
        + F.least(F.lit(1.0), ws_tokens / F.lit(100.0)) * 0.2
    )
    return docs.select(
        "doc_id",
        length.alias("n_chars"),
        ws_tokens.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(upper / F.greatest(length, F.lit(1)), 6).alias("upper_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(length / F.greatest(ws_tokens, F.lit(1)), 6).alias("mean_token_len"),
        F.round(composite, 6).alias("quality"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", window: int = 16) -> DataFrame:
    """Winnowing-style document fingerprint: min of polynomial hashes over
    all char windows (mod 2^31−1 — every product fits int64, so the whole
    kernel is one numpy sliding-window matmul per document instead of the
    round-1 per-character Python loop; same hash family as
    functions/hashing.py, so the DuckDB oracle reproduces it exactly).
    Texts shorter than the window hash as one whole-string fold."""
    import numpy as np

    from ..functions import hashing as H  # noqa: N812

    coeffs = np.asarray(H.poly_coeffs(window), dtype=np.int64)

    def _fp(batches):
        for pdf in batches:
            ids, fps = [], []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                cps = H.codepoints(str(text))
                if len(cps) < window:
                    fp = H.prefix_hash(cps)
                else:
                    fp = int(H.window_hashes(cps, window, coeffs).min())
                ids.append(did)
                fps.append(fp)
            yield pd.DataFrame({"doc_id": ids, "fingerprint": fps})

    return docs.select("doc_id", text_col).mapInPandas(_fp, schema="doc_id long, fingerprint long")


def repetition_stats(
    docs: DataFrame, text_col: str = "text", top_ngrams: tuple[int, ...] = (2, 3, 4)
) -> DataFrame:
    """Gopher-style within-document repetition metrics (Rae et al. 2021,
    "Scaling Language Models", Table A1 — the repetition-removal half of
    its quality rules; the ratio half is :func:`quality_score`):

    - ``dup_line_frac``       — duplicate lines / lines
    - ``dup_line_char_frac``  — chars inside duplicate lines / chars
    - ``top{n}gram_char_frac`` — chars covered by the single most
      frequent word n-gram, per n in ``top_ngrams``

    One Arrow-batched kernel pass per document (line/word splitting and
    n-gram counting are per-doc, order-sensitive work with no built-in
    vectorized equivalent — same judgement as :func:`fingerprint`; the
    counting is pandas ``value_counts``, not per-char loops).
    Downstream filtering composes as plain predicates, e.g. Gopher drops
    ``dup_line_frac > 0.30`` or ``top2gram_char_frac > 0.20``."""
    gram_cols = [f"top{n}gram_char_frac" for n in top_ngrams]

    def _stats(batches):
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "dup_line_frac": [],
                "dup_line_char_frac": [],
                **{c: [] for c in gram_cols},
            }
            for text in pdf[text_col]:
                text = "" if text is None else str(text)
                lines = [ln for ln in (s.strip() for s in text.split("\n")) if ln]
                if lines:
                    s = pd.Series(lines)
                    counts = s.value_counts()
                    dup_mask = s.map(counts) > 1
                    n_chars = sum(len(ln) for ln in lines)
                    out["dup_line_frac"].append(float(dup_mask.sum()) / len(lines))
                    out["dup_line_char_frac"].append(
                        float(sum(len(ln) for ln, d in zip(lines, dup_mask) if d))
                        / max(n_chars, 1)
                    )
                else:
                    out["dup_line_frac"].append(0.0)
                    out["dup_line_char_frac"].append(0.0)
                words = text.split()
                total_wchars = sum(len(w) for w in words)
                for n, col in zip(top_ngrams, gram_cols):
                    if len(words) < n or total_wchars == 0:
                        out[col].append(0.0)
                        continue
                    grams = pd.Series(
                        [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
                    )
                    counts = grams.value_counts()
                    cmax = int(counts.iloc[0])
                    # chars covered = occurrences x word-chars of the gram;
                    # ties on count resolve to the LONGEST gram, so the
                    # metric is deterministic (value_counts tie order isn't)
                    gchars = max(
                        len(g) for g in counts.index[counts.values == cmax]
                    ) - (n - 1)  # strip joining spaces
                    out[col].append(
                        min(float(cmax * gchars) / total_wchars, 1.0)
                    )
            yield pd.DataFrame(out)

    schema = "doc_id long, dup_line_frac double, dup_line_char_frac double, " + ", ".join(
        f"{c} double" for c in gram_cols
    )
    return docs.select("doc_id", text_col).mapInPandas(_stats, schema=schema)
