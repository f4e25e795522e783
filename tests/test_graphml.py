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
