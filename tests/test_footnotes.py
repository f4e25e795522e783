"""A5 — footnote grouping (Preprocess.py:134-148)."""

from information_extraction_from_biographies_spark.operators.normalize import (
    footnotes_array,
    group_footnotes,
    normalize_with_footnotes,
)


def test_group_footnotes_matches_hand_computed(spark):
    """3-footnote fixture incl. an unnumbered continuation line and the
    reference's drop-past-second-space quirk (pair[1] only)."""
    lines = spark.createDataFrame(
        [
            ("c1", 0, "1 第一條附註"),
            ("c1", 1, "接續上一條的無編號行"),
            ("c1", 2, "又一個接續行"),
            ("c1", 3, "2 第二條附註 這段在第二個空格後會被丟棄"),
            ("c1", 4, "3 第三條附註"),
            ("c2", 0, "沒有編號行在前面會被丟棄"),
            ("c2", 1, "1 乙傳附註"),
        ],
        "conv_id string, line_idx int, line string",
    )
    got = {
        (r["conv_id"], r["numbering"]): r["footnote_text"]
        for r in group_footnotes(lines).collect()
    }
    assert got == {
        ("c1", "1"): "第一條附註\n接續上一條的無編號行\n又一個接續行",
        ("c1", "2"): "第二條附註",  # pair[1] quirk: third token dropped
        ("c1", "3"): "第三條附註",
        ("c2", "1"): "乙傳附註",
    }
    arr = {r["conv_id"]: r["footnotes"] for r in footnotes_array(group_footnotes(lines)).collect()}
    assert [f["numbering"] for f in arr["c1"]] == ["1", "2", "3"]
    assert arr["c1"][0]["footnote_text"].startswith("第一條附註\n")


def test_normalize_with_footnotes_routes_roles(spark):
    rows = [
        ("c1", 0, "user", "陳一（1900-1980）台北人，業商。", None, None),
        ("c1", 1, "user", "創辦商會。", None, None),
        ("c1", 2, "footnote", "1 參見檔案", None, None),
        ("c1", 3, "footnote", "補充行", None, None),
    ]
    tdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    turns, meta, footnotes = normalize_with_footnotes(tdf)
    # footnote turns removed from the content stream
    assert turns.count() == 2
    m = meta.collect()[0]
    assert [f["numbering"] for f in m["footnotes"]] == ["1"]
    assert m["footnotes"][0]["footnote_text"] == "參見檔案\n補充行"


def test_group_footnotes_property_vs_simulation(spark):
    """Randomized line lists: the window+aggregate grouping equals a
    direct imperative simulation of the reference's process_footnote loop
    (Preprocess.py:134-148), including the pair[1] initial-text quirk."""
    import random

    from information_extraction_from_biographies_spark.operators.normalize import (
        group_footnotes,
    )

    rng = random.Random(31)
    rows, expected = [], {}
    for conv in range(6):
        cid = f"c{conv}"
        lines = []
        for i in range(rng.randrange(1, 12)):
            if rng.random() < 0.6:
                nparts = rng.randrange(1, 4)
                lines.append(f"{i} " + " ".join(f"字{i}{j}" for j in range(nparts)))
            else:
                lines.append(f"無編號{i}")
        # imperative simulation (independent of the window implementation)
        feet = []
        for line in lines:
            pair = line.split(" ")
            if len(pair) != 1:
                feet.append([pair[0], pair[1]])
            elif feet:
                feet[-1][1] += "\n" + line
            # else: dangling continuation — dropped (documented)
        for numbering, text in feet:
            expected[(cid, numbering)] = text
        rows += [(cid, i, line) for i, line in enumerate(lines)]

    df = spark.createDataFrame(rows, "conv_id string, line_idx int, line string")
    got = {
        (r["conv_id"], r["numbering"]): r["footnote_text"]
        for r in group_footnotes(df).collect()
    }
    assert got == expected
