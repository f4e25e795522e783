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


def test_phrase_layer_disambiguates_one_to_many(spark):
    """OpenCC-style phrase rules: ambiguous simplified chars resolve by
    context, and phrase outputs are protected from the char layer."""
    from pyspark.sql import functions as F

    from information_extraction_from_biographies_spark.functions.zhconv import (
        s2t,
        t2s,
        to_traditional,
    )

    cases = {
        "他的头发很长": "他的頭髮很長",      # 发->髮 in 头发
        "出发以后再说": "出發以後再說",  # defaults: 发->發, 后->後 outside phrases
        "皇后与太后": "皇后與太后",          # royal 后 survives the 后->後 default
        "等了三分钟": "等了三分鐘",          # 钟->鐘 (clock), not the 鍾 surname default
        "吃面包和饼干": "吃麵包和餅乾",      # 面->麵, 干->乾 only inside phrases
        "重复的复杂工作": "重複的複雜工作",  # 复->複 via phrases
    }
    for simp, trad in cases.items():
        assert s2t(simp) == trad, simp

    # default readings unaffected outside phrases
    assert s2t("发展") == "發展"
    assert s2t("以后") == "以後"

    # t2s collapses all variants back (many->one at char level)
    assert t2s("頭髮長") == "头发长"
    assert t2s("三分鐘") == "三分钟"

    # column expression agrees with the scalar kernel
    df = spark.createDataFrame([(s,) for s in cases], "txt string")
    got = {r["txt"]: r["out"] for r in df.select("txt", to_traditional("txt").alias("out")).collect()}
    for simp in cases:
        assert got[simp] == s2t(simp), simp
