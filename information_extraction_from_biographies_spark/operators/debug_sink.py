"""S7 — human-inspection text dumps, the reference's only debugging
affordance (NER.py:514-540, Relationship.py:191-206, Cooccurrence.py:113-117,
Get_Timeline.py:103-113), re-expressed as partitioned text sinks.

Each dump is a (conv_id, value) frame built with JVM-side ordered
aggregation (sort_array(collect_list(struct)) → array_join — no Python),
written via ``df.write.partitionBy('conv_id').format('text')`` so every
conversation lands in its own directory, the columnar analogue of the
reference's file-per-biography layout. Line formats match the reference:

- ner:          "Names:" block then "Alias_s:" block of "name type alias"
                (the per-tool Jieba/Stanford sections do not apply — the
                engine's channels are N1 segmentation + N2 rule NER)
- relations:    "name1 relation name2"
- cooccurrence: "name1 round(score,2) name2", descending score
- timeline:     "year : event" between #---# rulers, ascending year
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

_RULER = "#--------------------------------------------------#"


def _joined(df: DataFrame, order_cols: list, line_col, desc: bool = False) -> DataFrame:
    """(conv_id, value): lines ordered by ``order_cols`` then joined."""
    struct = F.struct(*order_cols, line_col.alias("_line"))
    arr = F.sort_array(F.collect_list(struct), asc=not desc)
    return df.groupBy("conv_id").agg(
        F.array_join(F.transform(arr, lambda s: s._line), "\n").alias("value")
    )


def ner_dump(conv_names: DataFrame, conv_aliases: DataFrame) -> DataFrame:
    """NER.py:514-540 inspection block per conversation."""
    names = _joined(conv_names, [F.col("name")], F.col("name"))
    aliases = _joined(
        conv_aliases,
        [F.col("name"), F.col("alias_type"), F.col("alias")],
        F.concat_ws(" ", "name", "alias_type", "alias"),
    )
    return (
        names.withColumnRenamed("value", "_names")
        .join(aliases.withColumnRenamed("value", "_aliases"), "conv_id", "left")
        .select(
            "conv_id",
            F.concat(
                F.lit("\nNames:\n"),
                F.col("_names"),
                F.lit("\n\nAlias_s:\n"),
                F.coalesce(F.col("_aliases"), F.lit("")),
            ).alias("value"),
        )
    )


def relations_dump(triples: DataFrame) -> DataFrame:
    """Relationship.py:191-206: 'name1 relation name2' lines."""
    return _joined(
        triples,
        [F.col("subj"), F.col("pred"), F.col("obj")],
        F.concat_ws(" ", "subj", "pred", "obj"),
    )


def cooccurrence_dump(cooc: DataFrame) -> DataFrame:
    """Cooccurrence.py:113-117: 'name1 score name2' descending score."""
    line = F.concat_ws(" ", "name1", F.round("score", 2).cast("string"), "name2")
    return _joined(cooc, [F.round("score", 2)], line, desc=True)


def timeline_dump(timeline: DataFrame) -> DataFrame:
    """Get_Timeline.py:103-113: 'year : event' between rulers."""
    body = _joined(
        timeline, [F.col("year")], F.concat_ws(" : ", F.col("year").cast("string"), "event")
    )
    return body.select(
        "conv_id",
        F.concat(
            F.lit("\n" + _RULER + "\n"), F.col("value"), F.lit("\n" + _RULER + "\n")
        ).alias("value"),
    )


def write_debug_sinks(
    out_dir: str,
    conv_names: DataFrame | None = None,
    conv_aliases: DataFrame | None = None,
    triples: DataFrame | None = None,
    cooccurrence: DataFrame | None = None,
    timeline: DataFrame | None = None,
) -> list[str]:
    """Write whichever dumps have inputs under ``out_dir/<kind>/conv_id=*``;
    returns the kinds written. Text sink, one partition directory per
    conversation."""
    written = []
    dumps = {}
    if conv_names is not None:
        dumps["ner_result"] = ner_dump(conv_names, conv_aliases if conv_aliases is not None else conv_names.limit(0).select("conv_id", F.lit(None).cast("string").alias("name"), F.lit(None).cast("string").alias("alias_type"), F.lit(None).cast("string").alias("alias")))
    if triples is not None:
        dumps["relation"] = relations_dump(triples)
    if cooccurrence is not None:
        dumps["cooccurrence"] = cooccurrence_dump(cooccurrence)
    if timeline is not None:
        dumps["timeline"] = timeline_dump(timeline)
    for kind, df in dumps.items():
        (
            df.write.mode("overwrite")
            .partitionBy("conv_id")
            .format("text")
            .save(f"{out_dir}/{kind}")
        )
        written.append(kind)
    return written
