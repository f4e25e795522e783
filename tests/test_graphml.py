"""S8 GraphML sink + N1 lexicon segmenter shape tests."""

import xml.etree.ElementTree as ET

import pandas as pd

from information_extraction_from_biographies_spark.functions.relations import (
    build_lex_index,
    _segment,
)
from information_extraction_from_biographies_spark.operators.graph import to_graphml


def test_graphml_roundtrip(tmp_path):
    nodes = pd.DataFrame({"name": ["陳一", "林二", 'q"uote']})
    edges = pd.DataFrame(
        {"subj": ["陳一", "林二"], "pred": ["合作", "推薦<>&"], "obj": ["林二", "陳一"]}
    )
    path = str(tmp_path / "g.graphml")
    to_graphml(nodes, edges, path)
    root = ET.parse(path).getroot()
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    g = root.find(f"{ns}graph")
    node_ids = {n.get("id") for n in g.findall(f"{ns}node")}
    assert node_ids == {"陳一", "林二", 'q"uote'}
    edge_rel = {
        (e.get("source"), e.get("target"), e.find(f"{ns}data").text)
        for e in g.findall(f"{ns}edge")
    }
    assert ("陳一", "林二", "合作") in edge_rel
    assert ("林二", "陳一", "推薦<>&") in edge_rel  # escaped + parsed back


def test_segmenter_longest_match_and_pos_tags():
    """N1: deterministic lexicon segmentation (jieba-style longest match)."""
    idx = build_lex_index(["陳泗治", "陳泗"])
    toks = _segment("與陳泗治合作", idx)
    assert ("陳泗治", "NR") in toks  # longest surface wins over 陳泗
    kinds = {t[1] for t in toks}
    assert "VV" in kinds  # 合作 from the verb lexicon
    assert toks[0] == ("與", "P")  # particle tag


import os

import pytest


REF_GRAPH_DIR = "/root/reference/DataBase/graph"


@pytest.mark.skipif(
    not os.path.isdir(REF_GRAPH_DIR), reason="reference artifacts not present"
)
def test_load_reference_graphml_artifacts(spark):
    """The reference's committed full-run outputs load into the engine:
    relation_network.graphml (3,325 nodes / 4,774 edges) and
    cooccurrence.graphml (30,345 weighted edges) — a reference user's
    existing artifacts are directly consumable."""
    from information_extraction_from_biographies_spark.operators.graph import load_graphml

    nodes, edges = load_graphml(spark, f"{REF_GRAPH_DIR}/relation_network.graphml")
    assert nodes.count() == 3325
    assert edges.count() == 4774
    # edges carry the Relation attribute through the key indirection
    sample = edges.filter("attrs['Relation'] IS NOT NULL").count()
    assert sample == 4774

    cnodes, cedges = load_graphml(spark, f"{REF_GRAPH_DIR}/cooccurrence.graphml")
    assert cedges.count() == 30345
    weighted = cedges.filter("attrs['weight'] IS NOT NULL").count()
    assert weighted == 30345


def test_graphml_round_trip_through_loader(spark, tmp_path):
    """Our S8 sink's output re-loads through load_graphml unchanged."""
    import pandas as pd

    from information_extraction_from_biographies_spark.operators.graph import (
        load_graphml,
        to_graphml,
    )

    nodes_pdf = pd.DataFrame({"name": ["甲", "乙", "丙"]})
    edges_pdf = pd.DataFrame(
        {"subj": ["甲", "乙"], "pred": ["結識", "合作"], "obj": ["乙", "丙"]}
    )
    path = str(tmp_path / "g.graphml")
    to_graphml(nodes_pdf, edges_pdf, path)
    nodes, edges = load_graphml(spark, path)
    assert {r["id"] for r in nodes.collect()} == {"甲", "乙", "丙"}
    got = {(r["src"], r["dst"], r["attrs"]["Relation"]) for r in edges.collect()}
    assert got == {("甲", "乙", "結識"), ("乙", "丙", "合作")}


@pytest.mark.skipif(
    not os.path.isdir(REF_GRAPH_DIR), reason="reference artifacts not present"
)
def test_automaton_over_reference_name_registry(spark):
    """J1 automaton built from the reference's REAL 3,325-name registry
    (loaded from its committed graph) finds embedded real names in text —
    the scan validated on the actual production vocabulary."""
    from information_extraction_from_biographies_spark.operators.graph import load_graphml
    from information_extraction_from_biographies_spark.operators.scan import build_surface_index

    nodes, _ = load_graphml(spark, f"{REF_GRAPH_DIR}/relation_network.graphml")
    names = [r["id"] for r in nodes.collect()]
    assert len(names) == 3325
    surfaces = spark.createDataFrame(
        [(n, n, "name") for n in names], "surface string, person string, kind string"
    )
    idx = build_surface_index(surfaces).local()
    probe_names = [n for n in names if len(n) >= 2][:10]
    text = "當日" + "、".join(probe_names) + "等人均出席盛會。"
    found = {person for person, _s, _k in idx.persons_in(text)}
    assert set(probe_names) <= found


def test_degree_and_khop_hand_graph(spark):
    """degree + neighbors_within vs hand-computed values on a path-plus-
    triangle graph (the reference's committed analyses: degree
    distribution and 2-hop neighborhoods, DataBase/graph/*.png)."""
    from information_extraction_from_biographies_spark.operators.graph import (
        degree,
        neighbors_within,
    )

    # triangle a-b-c plus tail c-d-e (duplicate edge rows must not double-count)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"), ("a", "b")],
        "src string, dst string",
    )
    deg = {r["vertex"]: r["degree"] for r in degree(edges).collect()}
    assert deg == {"a": 2, "b": 2, "c": 3, "d": 2, "e": 1}

    sources = spark.createDataFrame([("a",)], "source string")
    hops = {
        (r["vertex"]): r["distance"]
        for r in neighbors_within(edges, sources, k=2).collect()
    }
    # from a: b,c at 1; d at 2 (via c); e is at 3 -> absent; a itself excluded
    assert hops == {"b": 1, "c": 1, "d": 2}


def test_graphml_writer_full_reference_format(spark, tmp_path):
    """to_graphml now writes the reference's complete format — node
    alias-type attrs (Graph.py:8-13) and weighted undirected co-occurrence
    edges (Graph.py:21-23) — and load_graphml round-trips both."""
    import pandas as pd

    from information_extraction_from_biographies_spark.operators.graph import (
        load_graphml,
        to_graphml,
    )

    nodes_pdf = pd.DataFrame(
        {
            "name": ["陳一", "林二", "黃三"],
            "attrs": [{"字": "子安", "英文名": "Chen I"}, {"號": "竹軒"}, None],
        }
    )
    # weighted co-occurrence mode (name1/name2/weight)
    edges_pdf = pd.DataFrame(
        {"name1": ["陳一", "林二"], "name2": ["林二", "黃三"], "weight": [1.2, 0.66]}
    )
    path = str(tmp_path / "cooc.graphml")
    to_graphml(nodes_pdf, edges_pdf, path)
    nodes, edges = load_graphml(spark, path)
    got_nodes = {r["id"]: dict(r["attrs"]) for r in nodes.collect()}
    assert got_nodes == {
        "陳一": {"字": "子安", "英文名": "Chen I"},
        "林二": {"號": "竹軒"},
        "黃三": {},
    }
    got_edges = {(r["src"], r["dst"], r["attrs"]["weight"]) for r in edges.collect()}
    assert got_edges == {("陳一", "林二", "1.2"), ("林二", "黃三", "0.66")}

    # Relation mode with attrs still round-trips
    rel_edges = pd.DataFrame(
        {"subj": ["陳一"], "pred": ["推薦"], "obj": ["林二"]}
    )
    path2 = str(tmp_path / "rel.graphml")
    to_graphml(nodes_pdf, rel_edges, path2)
    n2, e2 = load_graphml(spark, path2)
    assert {r["id"]: dict(r["attrs"]) for r in n2.collect()}["陳一"] == {
        "字": "子安", "英文名": "Chen I"
    }
    assert [(r["src"], r["dst"], r["attrs"]["Relation"]) for r in e2.collect()] == [
        ("陳一", "林二", "推薦")
    ]


def test_write_graphml_distributed_matches_pandas_writer(spark, tmp_path):
    """write_graphml (executor-side XML + streamed merge) produces the
    same graph as the driver-side to_graphml on identical data — both
    parsed back through load_graphml — for both edge modes, including
    escaping, NULL/empty attr maps, and the weight double rendering."""
    import pandas as pd

    from information_extraction_from_biographies_spark.operators.graph import (
        load_graphml,
        to_graphml,
        write_graphml,
    )

    names = ["陳一", "林二", "黃三", 'q"uo<te>&']
    attrs = [{"字": "子安", "英文名": "Chen&I"}, {"號": "竹<軒>"}, None, {}]
    nodes_pdf = pd.DataFrame({"name": names, "attrs": attrs})
    nodes_sdf = spark.createDataFrame(
        list(zip(names, attrs)), "name string, attrs map<string,string>"
    )

    def parsed(p):
        n, e = load_graphml(spark, p)
        return (
            {r["id"]: dict(r["attrs"]) for r in n.collect()},
            {(r["src"], r["dst"], tuple(sorted(r["attrs"].items()))) for r in e.collect()},
        )

    # weighted co-occurrence mode
    w_pdf = pd.DataFrame(
        {"name1": ["陳一", "林二"], "name2": ["林二", "黃三"], "weight": [1.2, 0.66]}
    )
    w_sdf = spark.createDataFrame(w_pdf)
    to_graphml(nodes_pdf, w_pdf, str(tmp_path / "w_ref.graphml"))
    write_graphml(nodes_sdf, w_sdf, str(tmp_path / "w_dist.graphml"))
    assert parsed(str(tmp_path / "w_dist.graphml")) == parsed(
        str(tmp_path / "w_ref.graphml")
    )

    # relation mode
    r_pdf = pd.DataFrame(
        {"subj": ["陳一", "林二"], "pred": ["推薦<>&", "合作"], "obj": ['q"uo<te>&', "黃三"]}
    )
    r_sdf = spark.createDataFrame(r_pdf)
    to_graphml(nodes_pdf, r_pdf, str(tmp_path / "r_ref.graphml"))
    write_graphml(nodes_sdf, r_sdf, str(tmp_path / "r_dist.graphml"))
    assert parsed(str(tmp_path / "r_dist.graphml")) == parsed(
        str(tmp_path / "r_ref.graphml")
    )

    # control whitespace: a newline in an attribute value would be
    # normalized to a space by any conforming parser unless written as
    # &#10; (as to_graphml's quoteattr does), and a raw newline would
    # split write_graphml's one-row-per-line text fragments — both
    # writers must round-trip \n/\r/\t byte-identically after parse
    ws_names = ["a\nb", "c\td"]
    ws_attrs = [{"k": "v1\nv2"}, {"k": "x\ry"}]
    ws_nodes_pdf = pd.DataFrame({"name": ws_names, "attrs": ws_attrs})
    ws_nodes_sdf = spark.createDataFrame(
        list(zip(ws_names, ws_attrs)), "name string, attrs map<string,string>"
    )
    ws_edges_pdf = pd.DataFrame(
        {"subj": ["a\nb"], "pred": ["knows\nwell"], "obj": ["c\td"]}
    )
    ws_edges_sdf = spark.createDataFrame(ws_edges_pdf)
    to_graphml(ws_nodes_pdf, ws_edges_pdf, str(tmp_path / "ws_ref.graphml"))
    write_graphml(ws_nodes_sdf, ws_edges_sdf, str(tmp_path / "ws_dist.graphml"))
    ws_parsed = parsed(str(tmp_path / "ws_dist.graphml"))
    assert ws_parsed == parsed(str(tmp_path / "ws_ref.graphml"))
    assert set(ws_parsed[0]) == {"a\nb", "c\td"}  # ids survive verbatim

    # many-partition input still yields one well-formed file
    big_nodes = spark.range(0, 500, 1, 8).selectExpr(
        "concat('n', id) as name", "map('t', concat('v', id)) as attrs"
    )
    big_edges = spark.range(0, 499, 1, 8).selectExpr(
        "concat('n', id) as subj", "'knows' as pred", "concat('n', id + 1) as obj"
    )
    p = str(tmp_path / "big.graphml")
    write_graphml(big_nodes, big_edges, p)
    n, e = load_graphml(spark, p)
    assert n.count() == 500 and e.count() == 499
    assert {r["attrs"]["t"] for r in n.collect()} == {f"v{i}" for i in range(500)}


def test_to_graphml_guard_points_to_distributed_writer(tmp_path):
    """Beyond max_rows the driver-side writer refuses with an error naming
    write_graphml — the tables are the product at scale (S8 guard)."""
    import pandas as pd

    nodes_pdf = pd.DataFrame({"name": [f"n{i}" for i in range(10)]})
    edges_pdf = pd.DataFrame({"subj": ["n0"], "pred": ["p"], "obj": ["n1"]})
    with pytest.raises(ValueError, match="write_graphml"):
        to_graphml(nodes_pdf, edges_pdf, str(tmp_path / "g.graphml"), max_rows=5)
    # at the boundary itself it still writes
    to_graphml(nodes_pdf, edges_pdf, str(tmp_path / "g.graphml"), max_rows=11)


@pytest.mark.skipif(
    not os.path.isdir(REF_GRAPH_DIR), reason="reference artifacts not present"
)
def test_degree_over_reference_graph(spark):
    """Degree analysis runs directly over the reference's committed
    relation graph: handshake identity sum(degree) = 2·|distinct sym
    pairs| and every graph vertex gets a degree row."""
    from information_extraction_from_biographies_spark.operators.graph import (
        degree,
        load_graphml,
    )

    _nodes, edges = load_graphml(spark, f"{REF_GRAPH_DIR}/relation_network.graphml")
    deg = degree(edges)
    total = deg.agg({"degree": "sum"}).first()[0]
    from pyspark.sql import functions as F
    e = edges.select("src", "dst").distinct()
    sym = e.union(e.select(F.col("dst"), F.col("src"))).distinct()
    assert total == sym.count()
    assert deg.count() == sym.select("src").distinct().count()


def test_write_graphml_empty_graph(spark, tmp_path):
    """Zero-row nodes/edges (the text writes emit no part files) still
    produce a valid, loadable GraphML — the stream-merge must tolerate
    part-less fragment directories, not crash or emit a torn file."""
    from information_extraction_from_biographies_spark.operators.graph import (
        load_graphml,
        write_graphml,
    )

    nodes = spark.createDataFrame([], "name string, attrs map<string,string>")
    edges = spark.createDataFrame([], "subj string, pred string, obj string")
    p = str(tmp_path / "empty.graphml")
    write_graphml(nodes, edges, p)
    n, e = load_graphml(spark, p)
    assert n.count() == 0 and e.count() == 0
