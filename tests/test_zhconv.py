"""X5 round-trip + column-expression tests."""

from information_extraction_from_biographies_spark.functions import zhconv


def test_scalar_roundtrip_identity_on_mapped_vocab():
    text = "陳泗治，臺灣臺北人，創辦學校，當選會長。"
    simp = zhconv.t2s(text)
    assert simp == "陈泗治，台湾台北人，创办学校，当选会长。"
    assert zhconv.s2t(simp) == text


def test_unmapped_chars_pass_through():
    assert zhconv.t2s("abc 123 泗") == "abc 123 泗"


def test_column_expression_matches_scalar(spark):
    import pandas as pd

    texts = ["陳泗治，臺灣人。", "發表論文，擔任會長", "no chinese at all"]
    df = spark.createDataFrame(pd.DataFrame({"t": texts}))
    got = [r.s for r in df.select(zhconv.to_simplified("t").alias("s")).collect()]
    assert got == [zhconv.t2s(t) for t in texts]
    back = [
        r.b
        for r in df.select(zhconv.to_traditional(zhconv.to_simplified("t")).alias("b")).collect()
    ]
    assert back == texts
