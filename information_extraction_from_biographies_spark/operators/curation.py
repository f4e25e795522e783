"""Training-data curation operators — the steps between "deduped corpus"
and "training mixture" that a large-scale pipeline runs over the
documents table: PII scrubbing, deterministic global shuffle, stratified
quota sampling, and token-budget sequence packing.

Scale posture per operator:

- ``scrub_pii`` — pure ``regexp_replace`` column expressions (JVM-side,
  whole-stage codegen); zero shuffles, scales as a map.
- ``deterministic_shuffle`` — ``xxhash64(key, seed)`` sort key. A global
  ``orderBy`` is a range-partitioned sort (one shuffle with sampled range
  bounds — Spark's TeraSort shape); because the key is a uniform hash the
  range bounds are balanced by construction, so no skew handling is
  needed. Same (key, seed) → same order on any cluster size.
- ``stratified_quota`` — per-stratum deterministic top-``quota`` by
  hashed rank: one shuffle on the stratum key; hot strata are bounded by
  the quota itself (the window emits at most ``quota`` rows per stratum,
  and the rank-filter prunes eagerly map-side under partial windows? no —
  rank needs the stratum together, which IS the one shuffle; quota caps
  the OUTPUT, the input pass is linear).
- ``pack_sequences`` — bin packing is inherently sequential; the
  scalable variant is partition-local first-fit-decreasing inside
  ``mapInPandas`` after a hash repartition: each partition packs its own
  documents into bins of ``budget`` tokens, bin ids are made globally
  unique with the partition id. Packing quality loss vs a global packer
  is bounded (each partition wastes < 1 bin's worth of slack on average
  at realistic budgets) while the work distributes linearly — the same
  trade every large training-data pipeline makes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

# Deliberately conservative patterns (precision over recall: a scrub
# that eats ordinary prose is worse than one that misses an exotic
# format; corpus-specific formats extend the dict). Replacement runs in
# dict order, so MORE specific digit shapes come first — a card number
# scrubbed as <PII:card> no longer contains the digit runs the phone
# pattern would otherwise claim.
PII_PATTERNS: dict[str, str] = {
    # local-part@domain.tld
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    # 16-digit runs in groups of 4 (payment-card shaped); before phone
    "card": r"(?<![0-9])[0-9]{4}(?:[ \-][0-9]{4}){3}(?![0-9])",
    # IPv4; before phone (whose separator class includes '.', so an IP
    # left for later would have its leading octets claimed as a phone)
    "ip": r"(?<![0-9.])(?:[0-9]{1,3}\.){3}[0-9]{1,3}(?![0-9.])",
    # international/US-ish phone runs: +1 555-123-4567, (555) 123 4567 …
    "phone": r"(?<![0-9])(?:\+?[0-9]{1,3}[ \-.])?(?:\([0-9]{2,4}\)[ \-.]?)?[0-9]{3,4}[ \-.][0-9]{3,4}(?:[ \-.][0-9]{2,4})?(?![0-9])",
}


def scrub_pii(
    docs: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Replace each PII match with a typed placeholder ``<PII:kind>``.

    One chained ``regexp_replace`` expression — no UDF, no shuffle; the
    per-kind match counts come along as columns so a curation run can
    report scrub rates without a second pass. Counts are raw per-pattern
    matches against the INPUT text, so a span claimable by two kinds
    (a card number also phone-shaped) counts under both even though the
    replacement chain scrubs it once, under the earlier kind."""
    patterns = PII_PATTERNS if patterns is None else patterns
    scrubbed = F.col(text_col)
    counts = []
    for kind, pat in patterns.items():
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(
                f"n_{kind}"
            )
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<PII:{kind}>")
    out = out_col or text_col
    cols = [c for c in docs.columns if c != out]
    return docs.select(*cols, scrubbed.alias(out), *counts)


def deterministic_shuffle(
    docs: DataFrame, key: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Global pseudo-random but REPRODUCIBLE ordering for training-data
    export: sort by ``xxhash64(key, seed)``. Changing the seed reshuffles;
    rerunning with the same seed — on any partitioning or cluster size —
    gives the identical order (ties on the 64-bit hash broken by key)."""
    h = F.xxhash64(F.col(key).cast("string"), F.lit(seed))
    return docs.orderBy(h, F.col(key))


def stratified_quota(
    docs: DataFrame,
    stratum_col: str,
    quotas: dict[str, int] | int,
    key: str = "doc_id",
    seed: int = 0,
    salt: int = 0,
) -> DataFrame:
    """At most ``quota`` documents per stratum (a dict per stratum value,
    or one int for all), chosen by deterministic hash rank — the mixture-
    weighting step of a training-data pipeline, reproducible across runs
    and cluster sizes. One shuffle (the rank window on the stratum key);
    a uniform int quota caps every stratum's output identically.

    ``salt > 1``: two-phase rank for hot strata. A web corpus routinely
    has one stratum holding most of the rows (e.g. source='common_crawl'),
    and a plain window makes that stratum ONE task. The salted phase
    ranks within (stratum, hash-salt) partitions — ``salt`` parallel
    tasks per stratum — and keeps only each salt's first ``quota`` rows;
    the final window then ranks at most ``salt × quota`` survivors per
    stratum. Both phases order by the same (hash, key), so the selected
    set is IDENTICAL to the unsalted path (pinned by a test)."""
    from pyspark.sql import Window

    h = F.xxhash64(F.col(key).cast("string"), F.lit(seed))
    if isinstance(quotas, int):
        quota_col = F.lit(quotas)
        max_quota = quotas
    else:
        qmap = F.create_map(
            *[x for k, v in quotas.items() for x in (F.lit(k), F.lit(v))]
        )
        quota_col = F.coalesce(qmap[F.col(stratum_col)], F.lit(0))
        max_quota = max(quotas.values(), default=0)

    if salt > 1 and max_quota > 0:
        ws = Window.partitionBy(stratum_col, F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(salt))).orderBy(
            h, F.col(key)
        )
        docs = (
            docs.withColumn("_srk", F.row_number().over(ws))
            .filter(F.col("_srk") <= quota_col)
            .drop("_srk")
        )
    w = Window.partitionBy(stratum_col).orderBy(h, F.col(key))
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota_col)
        .drop("_rk")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    partitions: int | None = None,
) -> DataFrame:
    """→ (id_col, n_tokens, pack_id, pack_tokens): greedy first-fit-
    decreasing packing of documents into training sequences of at most
    ``budget`` tokens, partition-local (see module docstring for the
    scale trade). Documents longer than ``budget`` get a singleton pack
    (the downstream tokenizer truncates; dropping them silently would
    bias the corpus). ``pack_tokens`` is the pack's total, repeated per
    member row so the output joins back to the docs table directly."""
    if partitions is None:
        partitions = int(
            docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "64")
        )

    def _pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        frames = list(batches)
        if not frames:
            return
        rows = pd.concat(frames, ignore_index=True)
        if not len(rows):
            return
        rows = rows.sort_values(
            [tokens_col, id_col], ascending=[False, True], ignore_index=True
        )
        # First-fit-decreasing over OPEN bins. Because the sort is
        # decreasing, the smallest pending doc is always the partition's
        # last row; a bin whose remaining capacity drops below it can
        # never accept another doc, so it is closed (marked rem=-1 and
        # compacted away once closed slots reach half the list — amortized
        # O(1) per close, and scans never walk a majority-dead list).
        # Skipping closed bins cannot change any assignment, so this is
        # exactly first-fit; without it a partition of docs > budget/2
        # keeps every singleton bin open and the loop goes O(n²).
        min_tok = int(rows[tokens_col].iloc[-1])
        bins: list[list[int]] = []  # [bin_idx, remaining]; rem=-1 ⇒ closed
        n_closed = 0
        assign: list[int] = []
        totals: dict[int, int] = {}
        for tok in rows[tokens_col].astype("int64"):
            tok = int(tok)
            placed = None
            for slot in bins:
                if tok <= slot[1]:
                    placed = slot[0]
                    slot[1] -= tok
                    if slot[1] < min_tok:
                        slot[1] = -1
                        n_closed += 1
                    break
            if placed is None:
                placed = len(totals)
                rem = max(budget - tok, 0)
                if rem >= min_tok:
                    bins.append([placed, rem])
            assign.append(placed)
            totals[placed] = totals.get(placed, 0) + tok
            if n_closed * 2 >= len(bins) and n_closed:
                bins = [s for s in bins if s[1] >= 0]
                n_closed = 0
        out = pd.DataFrame(
            {
                id_col: rows[id_col],
                tokens_col: rows[tokens_col].astype("int64"),
                "pack_id": [f"{pid}-{a}" for a in assign],
                "pack_tokens": [totals[a] for a in assign],
            }
        )
        yield out

    sel = docs.select(
        F.col(id_col).cast("string").alias(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
    )
    return sel.repartition(partitions, id_col).mapInPandas(
        _pack,
        schema=f"{id_col} string, {tokens_col} long, pack_id string, pack_tokens long",
    )


def _ngram_poly_hashes(text: str | None, n: int, pows: "PowTable") -> "object":
    """Distinct polynomial hashes of every word ``n``-gram of the
    normalized text (lowercase; any non-letter/digit run is one space —
    the usual "loose match" normalization, so punctuation/casing edits
    don't defeat the overlap test). Texts shorter than ``n`` words hash
    their FULL word sequence as one gram — an eval item of 5 words must
    still be matchable, and the same rule on the corpus side keeps the
    semantics symmetric.

    Gram hash = ``hashing.prefix_hash64(codepoints(gram_text))`` — the
    fingerprint family's polynomial hash under TWO independent bases
    packed as h_B·2^31 + h_B2 (62-bit; a single 31-bit hash measured
    1,265 false drops on a 500k-doc soak — n_corpus·n_block/2^31 grows
    unusable at scale, 2^62 doesn't) — computed for ALL positions at
    once from one modular prefix-sum per base: with
    Q[i] = Σ_{t<i} cp[t]·B^{-t} mod P, the substring [a,b) hashes to
    B^{b-1}·(Q[b] − Q[a]) mod P — two table lookups and one multiply per
    gram, no per-gram string building (the naive per-gram slice/concat
    column expression measured 46 µs/gram interpreted; this kernel is
    one vectorized pass per document)."""
    import re as _re

    import numpy as np

    from ..functions import hashing as H  # noqa: N812

    norm = _re.sub(r"[\W_]+", " ", str(text).lower()).strip() if text else ""
    if not norm:
        return np.zeros(0, dtype=np.int64)
    cps = H.codepoints(norm)
    length = len(cps)
    tables = pows.upto(length)
    # word starts/ends in char coords (single spaces by construction)
    sp = np.nonzero(cps == 32)[0]
    starts = np.concatenate(([0], sp + 1))
    ends = np.concatenate((sp, [length]))
    k = len(starts)
    if k < n:
        a = np.zeros(1, dtype=np.int64)
        b = np.asarray([length], dtype=np.int64)
    else:
        a = starts[: k - n + 1]
        b = ends[n - 1 :]
    hs = []
    for powb, powbinv in tables:
        # cp·B^{-t} < 2^31·2^31; reduce each term before the cumsum
        # (terms < P, so the running sum stays < len·2^31 — int64-safe)
        q = np.concatenate(
            ([0], np.cumsum((cps * powbinv[:length]) % H.P) % H.P)
        ).astype(np.int64)
        hs.append((powb[b - 1] * ((q[b] - q[a]) % H.P)) % H.P)
    return np.unique((hs[0] << 31) + hs[1])


class PowTable:
    """Grow-on-demand tables of base^t and base^{-t} mod P for both hash
    bases (one per kernel closure; amortized O(max text length) total
    growth per task)."""

    def __init__(self) -> None:
        from ..functions import hashing as H  # noqa: N812

        self._tables = [
            {"base": base, "binv": pow(base, H.P - 2, H.P), "powb": [1], "powbinv": [1]}
            for base in (H.B, H.B2)
        ]

    def upto(self, length: int):
        import numpy as np

        from ..functions import hashing as H  # noqa: N812

        out = []
        for t in self._tables:
            powb, powbinv = t["powb"], t["powbinv"]
            while len(powb) < length:
                powb.append(powb[-1] * t["base"] % H.P)
                powbinv.append(powbinv[-1] * t["binv"] % H.P)
            out.append(
                (
                    np.asarray(powb[:length], dtype=np.int64),
                    np.asarray(powbinv[:length], dtype=np.int64),
                )
            )
        return out


def ngram_hash_rows(
    df: DataFrame, text_col: str, n: int, id_col: str | None = None
) -> DataFrame:
    """(id_col?, gram): one row per DISTINCT word ``n``-gram hash of each
    document — the exploded shape both decontamination sides consume.
    Arrow-batched ``mapInPandas`` (the per-doc kernel is vectorized numpy;
    see :func:`_ngram_poly_hashes`); emitting rows directly skips the
    build-array-then-explode detour."""
    schema = (f"{id_col} string, " if id_col else "") + "gram long"

    def _rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        pows = PowTable()
        for pdf in batches:
            ids: list = []
            grams: list = []
            for row in pdf.itertuples(index=False):
                h = _ngram_poly_hashes(row[-1], n, pows)
                if not len(h):
                    continue
                grams.append(h)
                if id_col:
                    ids.extend([row[0]] * len(h))
            g = np.concatenate(grams) if grams else np.zeros(0, dtype=np.int64)
            out = {"gram": g}
            if id_col:
                out = {id_col: pd.array(ids, dtype="string"), "gram": g}
            yield pd.DataFrame(out)

    sel = df.select(*(
        [F.col(id_col).cast("string").alias(id_col)] if id_col else []
    ), F.col(text_col))
    return sel.mapInPandas(_rows, schema=schema)


def _gram_hits(
    docs: DataFrame, blocklist: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """(id_col, n_contaminated_grams): per-doc count of DISTINCT gram
    hashes overlapping ``blocklist`` (a ``gram long`` table). The one
    linear corpus pass both batch and incremental decontamination share:
    gram rows → broadcast semijoin → hash aggregate."""
    return (
        ngram_hash_rows(docs, text_col, n, id_col=id_col)
        .join(F.broadcast(blocklist), "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_grams"))
    )


def decontaminate(
    docs: DataFrame,
    contamination: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    cont_text_col: str | None = None,
    mode: str = "drop",
) -> DataFrame:
    """Remove (or flag) training documents that overlap a held-out /
    benchmark set by at least ``min_hits`` distinct word ``n``-grams —
    the GPT-3-style decontamination step every training-data pipeline
    runs before export.

    Scale shape: the contamination side is SMALL by contract (an eval
    suite — thousands to millions of items, never the corpus), so its
    distinct gram-hash blocklist is built once and broadcast. The corpus
    side is one linear pass: per-doc distinct gram hashes (Arrow-batched
    vectorized kernel, :func:`ngram_hash_rows` — row amplification
    ×~words/doc but NO shuffle) → broadcast LEFT SEMI join against the
    blocklist → one hash aggregate on ``id_col`` (map-side partial
    count) to apply ``min_hits``. The final subtract/annotate join of
    hit ids back to ``docs`` is left to AQE: hit sets are usually tiny
    (runtime broadcast), but nothing breaks if an adversarial corpus
    makes them huge (plain hash join).

    ``mode="drop"`` returns the clean corpus unchanged in schema;
    ``mode="flag"`` returns all docs + ``n_contaminated_grams`` (the RAW
    overlap count, 0 for clean docs, NOT thresholded — the audit view
    must show the borderline docs) + boolean ``contaminated``
    (``count >= min_hits``, the docs drop mode would remove).

    Collisions: the 62-bit dual-base gram hash over-flags a doc about
    once per 2^62 corpus-gram x blocklist-gram pairs — negligible at any
    real scale, and biased the safe way (a false positive removes a
    training doc, never leaks an eval item)."""
    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    if mode == "flag":
        clash = {"n_contaminated_grams", "contaminated"} & set(docs.columns)
        if clash:
            raise ValueError(
                f"flag mode adds columns {sorted(clash)} that already exist "
                "in docs — rename or drop them first"
            )
    cont_text_col = cont_text_col or text_col
    blocklist = ngram_hash_rows(contamination, cont_text_col, n).distinct()
    hits = _gram_hits(docs, blocklist, n, text_col, id_col).withColumnRenamed(
        id_col, "_decon_id"
    )
    # the kernel emits string ids; join on the string-cast key so an
    # integer id_col in docs still matches exactly (no numeric coercion)
    if mode == "drop":
        doomed = hits.filter(F.col("n_contaminated_grams") >= min_hits)
        return docs.join(
            doomed, docs[id_col].cast("string") == doomed["_decon_id"], "left_anti"
        )
    return docs.join(
        hits, docs[id_col].cast("string") == hits["_decon_id"], "left"
    ).select(
        docs["*"],
        F.coalesce(hits["n_contaminated_grams"], F.lit(0)).alias(
            "n_contaminated_grams"
        ),
        (F.coalesce(hits["n_contaminated_grams"], F.lit(0)) >= min_hits).alias(
            "contaminated"
        ),
    )


def curate_corpus(
    docs: DataFrame,
    contamination: DataFrame | None = None,
    budget: int = 2048,
    quotas: dict[str, int] | int | None = None,
    stratum_col: str = "source",
    n_gram: int = 13,
    dedup_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    audit: bool = True,
    token_mode: str = "ws",
) -> tuple[DataFrame, DataFrame, dict]:
    """The composed corpus→training-export path: PII scrub →
    decontaminate (when a contamination set is given) → exact dedup →
    MinHash cluster-level near-dup removal (keep one doc per cluster) →
    stratified quota (when quotas are given) → token-budget sequence
    packing. Returns ``(curated, packed, audit_dict)``: ``curated`` is
    the surviving docs WITH the scrubbed text (exporting the original
    ``docs`` would re-introduce the PII the scrub removed), ``packed``
    assigns each curated doc a training-sequence ``pack_id`` — the final
    materialization is ``curated ⋈ packed`` on ``id_col`` at the
    caller's chosen sink.

    Each stage is the already-tested operator — this function only fixes
    the order (scrub BEFORE hashing, so a doc differing only in its PII
    spans dedups against its scrubbed twin; decontaminate BEFORE dedup,
    so a contaminated cluster keeper can't smuggle its duplicates
    through; exact dedup BEFORE MinHash, because docs shorter than the
    5-char shingle width have no profile and would skip near-dup
    clustering entirely) and wires the id plumbing between them. With
    ``audit=False`` nothing executes until the caller writes the result;
    ``audit=True`` persists the two expensive intermediates, takes the
    per-stage counts against the caches, and unpersists before
    returning (the caller's write recomputes the final plan once — the
    same cost as ``audit=False``, plus one cached counting pass)."""
    from .dedup import exact_dedup, minhash_dedup_clusters, minhash_profiles
    from .textstats import token_count

    report: dict = {}
    if audit:
        report["input_docs"] = docs.count()

    scrubbed = scrub_pii(docs, text_col=text_col)
    scrub_counts = [f"n_{kind}" for kind in PII_PATTERNS]
    if audit:
        agg = scrubbed.agg(
            *[F.sum(c).alias(c) for c in scrub_counts]
        ).collect()[0]
        report["pii_matches"] = {c: int(agg[c] or 0) for c in scrub_counts}
    scrubbed = scrubbed.drop(*scrub_counts)

    if contamination is not None:
        clean = decontaminate(
            scrubbed, contamination, n=n_gram, text_col=text_col, id_col=id_col
        )
    else:
        clean = scrubbed
    if audit:
        clean = clean.persist()
        if contamination is not None:
            report["after_decontaminate"] = clean.count()

    # exact duplicates first (md5 groupBy) — also catches docs shorter
    # than the MinHash shingle width, which have no near-dup profile
    keepers = exact_dedup(clean, text_col=text_col, id_col=id_col).select(
        F.col("keep_id").alias("_keep_id")
    )
    uniq = clean.join(
        keepers, clean[id_col].cast("string") == keepers["_keep_id"].cast("string"),
        "left_semi",
    )

    # minhash profiles contract a LONG doc id; arbitrary ids ride a
    # 64-bit surrogate (keeper = lowest surrogate in the cluster —
    # deterministic, collision odds ~2^-64 per pair)
    with_sid = uniq.withColumn("_sid", F.xxhash64(F.col(id_col).cast("string")))
    profiles = minhash_profiles(
        with_sid.select(F.col("_sid").alias("doc_id"), text_col), text_col=text_col
    )
    clusters = minhash_dedup_clusters(profiles, threshold=dedup_threshold)
    drop_ids = clusters.filter(~F.col("is_keeper")).select(
        F.col("doc_id").alias("_dup_sid")
    )
    deduped = with_sid.join(
        drop_ids, with_sid["_sid"] == drop_ids["_dup_sid"], "left_anti"
    ).drop("_sid")
    if audit:
        deduped = deduped.persist()
        report["after_dedup"] = deduped.count()
        clean.unpersist()

    if quotas is not None:
        sampled = stratified_quota(deduped, stratum_col, quotas, key=id_col)
        if audit:
            report["after_quota"] = sampled.count()
    else:
        sampled = deduped

    # token_mode: the unit of the packing budget. "ws" (default) is the
    # space-delimited-corpus surface; on CJK text (the reference's
    # domain, no spaces) whitespace tokens are ~1/doc and the budget is
    # meaningless — pass token_mode="cjk" there (textstats.token_count).
    toks = token_count(
        sampled.select(F.col(id_col).alias("doc_id"), text_col),
        text_col=text_col,
        mode=token_mode,
    )
    tok_col = "ws_tokens" if token_mode == "ws" else "n_tokens"
    packed = pack_sequences(
        toks.select("doc_id", F.col(tok_col).alias("n_tokens")),
        budget=budget,
        id_col="doc_id",
    )
    if audit:
        report["packs"] = packed.select("pack_id").distinct().count()
        deduped.unpersist()
    return sampled, packed, report


def incremental_decontaminate(
    new_docs: DataFrame,
    base_blockgrams: DataFrame | None,
    new_contamination: DataFrame | None = None,
    history_docs: DataFrame | None = None,
    n: int = 13,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    cont_text_col: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """Decontamination as maintained state (the posture of
    plans/incremental.py and dedup_incremental.py): the persisted state
    is ``base_blockgrams`` — one ``gram long`` row per distinct n-gram
    hash of every eval item ever registered — and each ingestion batch
    touches O(delta), never re-gramming history.

    → ``(clean_new, blockgram_delta, hit_history)``:

    - ``clean_new`` — ``new_docs`` minus those overlapping the FULL
      blocklist (base ∪ the new eval items' grams) by ≥ ``min_hits``
      distinct grams: one linear pass over the DELTA docs against a
      broadcast blocklist (eval-suite-sized by contract).
    - ``blockgram_delta`` — the new eval items' grams not already in the
      store: append to the blockgram table. Empty when
      ``new_contamination`` is None.
    - ``hit_history`` — only when BOTH ``new_contamination`` and
      ``history_docs`` are given: (id_col, n_contaminated_grams) for
      historical docs NEWLY reaching the threshold — total overlap
      (vs the full blocklist) ≥ min_hits AND ≥ 1 hit on a NEW gram, so
      docs already condemned by old grams are not re-reported. This is
      the one unavoidable O(history) read when the eval suite grows (the
      ``rescan="exact"`` stance): history streams ONCE against a
      broadcast of the flagged blocklist, nothing shuffles but the
      per-doc counts. None when there is nothing to rescan.

    Callers tombstone ``hit_history`` ids and append ``blockgram_delta``
    to the store; ``clean_new`` appends to the corpus. Parity with batch
    :func:`decontaminate` over the union is pinned by tests."""
    spark = new_docs.sparkSession
    cont_text_col = cont_text_col or text_col
    if base_blockgrams is None:
        base_blockgrams = spark.createDataFrame([], "gram long")
    if new_contamination is not None:
        blockgram_delta = (
            ngram_hash_rows(new_contamination, cont_text_col, n)
            .distinct()
            .join(base_blockgrams, "gram", "left_anti")
        )
    else:
        blockgram_delta = spark.createDataFrame([], "gram long")

    full = base_blockgrams.unionByName(blockgram_delta)
    doomed = _gram_hits(new_docs, full, n, text_col, id_col).filter(
        F.col("n_contaminated_grams") >= min_hits
    ).withColumnRenamed(id_col, "_decon_id")
    clean_new = new_docs.join(
        doomed, new_docs[id_col].cast("string") == doomed["_decon_id"], "left_anti"
    )

    hit_history = None
    if new_contamination is not None and history_docs is not None:
        flagged = base_blockgrams.withColumn(
            "is_new", F.lit(False)
        ).unionByName(blockgram_delta.withColumn("is_new", F.lit(True)))
        hits_str = (
            ngram_hash_rows(history_docs, text_col, n, id_col=id_col)
            .join(F.broadcast(flagged), "gram")
            .groupBy(id_col)
            .agg(
                F.count("*").alias("n_contaminated_grams"),
                F.sum(F.col("is_new").cast("int")).alias("_n_new"),
            )
            .filter(
                (F.col("n_contaminated_grams") >= min_hits) & (F.col("_n_new") >= 1)
            )
            .withColumnRenamed(id_col, "_hit_id")
        )
        # the gram kernel casts ids to string; hand back the caller's
        # ORIGINAL id column and type (a string '10' silently failing to
        # match a long 10 in the caller's tombstone set is exactly the
        # bug this join prevents)
        hit_history = history_docs.join(
            F.broadcast(hits_str),
            history_docs[id_col].cast("string") == hits_str["_hit_id"],
        ).select(history_docs[id_col], hits_str["n_contaminated_grams"])
    return clean_new, blockgram_delta, hit_history
