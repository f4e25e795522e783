"""Stage 4 — graph materialization (nodes / edges / cooccurrence edges).

- nodes (J5): people + alias attributes as a map column (Graph.py:8-13)
  + the CC entity id.
- relation edges (A7): the canonical `edges` table keeps EVERY triple
  (deliberate deviation, richer); `collapsed_edges` reproduces the
  reference's DiGraph last-wins one-edge-per-(u,v) (Graph.py:34-35) with a
  deterministic "last" = max by (conv_id, pred).
- cooccurrence edges: zoomed + rounded as the graphml writer does
  (Graph.py:21-23); per-(pair) last-wins by conv_id mirrors Mongo insert
  order being arbitrary — ours is deterministic (max conv_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

from ..gazetteers import COOCCURRENCE_ZOOM_FACTOR


def nodes_table(people: DataFrame, aliases: DataFrame, entities: DataFrame) -> DataFrame:
    """(name, attrs map<alias_type,alias>, entity_id)."""
    attr = (
        aliases.groupBy("name")
        .agg(
            F.map_from_entries(
                F.array_distinct(F.collect_list(F.struct("alias_type", "alias")))
            ).alias("attrs")
        )
    )
    return (
        people.join(attr, "name", "left")
        .join(entities, "name", "left")
        .select("name", "attrs", "entity_id")
    )


def collapsed_edges(triples: DataFrame) -> DataFrame:
    """One edge per (subj, obj), deterministic last-wins on the predicate."""
    w = Window.partitionBy("subj", "obj").orderBy(F.desc("conv_id"), F.desc("pred"))
    return (
        triples.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("subj", "pred", "obj")
    )


def cooccurrence_edges(scores: DataFrame) -> DataFrame:
    """(name1, name2, weight): zoomed, rounded, last-wins per pair."""
    w = Window.partitionBy("name1", "name2").orderBy(F.desc("conv_id"))
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "name1",
            "name2",
            F.round(F.col("score") * F.lit(COOCCURRENCE_ZOOM_FACTOR), 2).alias("weight"),
        )
    )


def timeline_final(timeline: DataFrame) -> DataFrame:
    """A6 last-wins per (conv_id, year) by latest start_pos, sorted (O2)."""
    w = Window.partitionBy("conv_id", "year").orderBy(F.desc("start_pos"))
    return (
        timeline.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("conv_id", "year", "event")
        .orderBy("conv_id", "year")
    )


def load_graphml(spark, path: str):
    """S8 inverse: parse a GraphML file — including the reference's own
    committed artifacts (DataBase/graph/*.graphml, written by NetworkX at
    Graph.py:26,38) — into (nodes, edges) DataFrames:

        nodes(id string, attrs map<string,string>)
        edges(src string, dst string, attrs map<string,string>)

    Attr keys resolve through the <key> declarations (attr.name), so
    NetworkX's d0/d1 indirection round-trips. Driver-side XML parse —
    graphs are O(entities) summaries, not corpus-scale; a user of the
    reference can load their existing outputs straight into the engine."""
    import xml.etree.ElementTree as ET

    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
    root = ET.parse(path).getroot()
    key_names = {
        k.get("id"): k.get("attr.name", k.get("id"))
        for k in root.findall("g:key", ns)
    }

    def _attrs(el) -> dict:
        return {
            key_names.get(d.get("key"), d.get("key")): (d.text or "")
            for d in el.findall("g:data", ns)
        }

    graph = root.find("g:graph", ns)
    nodes = [(n.get("id"), _attrs(n)) for n in graph.findall("g:node", ns)]
    edges = [
        (e.get("source"), e.get("target"), _attrs(e))
        for e in graph.findall("g:edge", ns)
    ]
    nodes_df = spark.createDataFrame(nodes, "id string, attrs map<string,string>")
    edges_df = spark.createDataFrame(
        edges, "src string, dst string, attrs map<string,string>"
    )
    return nodes_df, edges_df


def to_graphml(nodes_pdf, edges_pdf, path: str, directed: bool = True) -> None:
    """Driver-side GraphML export (fixture scale only — S8)."""
    import xml.sax.saxutils as sx

    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '<key id="d0" for="edge" attr.name="Relation" attr.type="string"/>',
        f'<graph edgedefault="{"directed" if directed else "undirected"}">',
    ]
    for _, row in nodes_pdf.iterrows():
        lines.append(f'<node id={sx.quoteattr(str(row["name"]))}/>')
    for _, row in edges_pdf.iterrows():
        s = sx.quoteattr(str(row["subj"]))
        t = sx.quoteattr(str(row["obj"]))
        p = sx.escape(str(row["pred"]))
        lines.append(f"<edge source={s} target={t}><data key=\"d0\">{p}</data></edge>")
    lines += ["</graph>", "</graphml>"]
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
