"""Unit tests for scalar Column builders — goldens mirror the
reference's unit suites (``ColumnMetaMapperTest``, ``StudyFilterTest``)."""

from pyspark.sql import functions as F

from picsure_dictionary_etl_spark.functions import columns as C


def _one(spark, expr, **cols):
    schema = ", ".join(f"{k} string" for k in cols)
    df = spark.createDataFrame([tuple(cols.values())], schema)
    return df.select(expr.alias("out")).collect()[0]["out"]


def test_decode_mu(spark):
    # µ -> \ (ColumnMetaMapper.java:53)
    assert _one(spark, C.decode_mu(F.col("p")), p="aµbµc") == "a\\b\\c"


def test_split_mu_list(spark):
    assert _one(spark, C.split_mu_list(F.col("v")), v="FALSEµTRUE") == ["FALSE", "TRUE"]
    assert _one(spark, C.split_mu_list(F.col("v")), v="") == []
    assert _one(spark, C.split_mu_list(F.col("v")), v="solo") == ["solo"]


def test_path_segments_drops_blanks(spark):
    # FacetExpressionEvaluator.java:116-118
    assert _one(spark, C.path_segments(F.col("p")), p="\\a\\b\\c\\") == ["a", "b", "c"]
    assert _one(spark, C.path_segments(F.col("p")), p="\\\\a\\\\") == ["a"]


def test_parent_path(spark):
    assert _one(spark, C.parent_path(F.col("p")), p="\\a\\b\\c\\") == "\\a\\b\\"
    assert _one(spark, C.parent_path(F.col("p")), p="\\a\\") is None


def test_trim_single_value_categorical(spark):
    """ColumnMetaMapperTest.java:89-95,131-135: categorical with one
    value equal to the last segment -> segment stripped."""
    df = spark.createDataFrame(
        [
            ("\\demographics\\SEX\\female\\", True, ["female"], "\\demographics\\SEX\\"),
            ("\\demographics\\SEX\\female\\", True, ["female", "male"], "\\demographics\\SEX\\female\\"),
            ("\\demographics\\SEX\\female\\", False, ["female"], "\\demographics\\SEX\\female\\"),
            ("\\lab\\AGE\\", True, ["other"], "\\lab\\AGE\\"),
        ],
        ["path", "cat", "vals", "expected"],
    )
    out = df.select(
        C.trim_single_value_categorical(F.col("path"), F.col("cat"), F.col("vals")).alias("got"),
        "expected",
    ).collect()
    for r in out:
        assert r["got"] == r["expected"]


def test_null_sentinels_and_try_double(spark):
    assert _one(spark, C.null_if_sentinel(F.col("v")), v="null") is None
    assert _one(spark, C.null_if_sentinel(F.col("v")), v="NULL") is None
    assert _one(spark, C.null_if_sentinel(F.col("v")), v="") is None
    assert _one(spark, C.null_if_sentinel(F.col("v")), v="x") == "x"
    assert _one(spark, C.try_double(F.col("v")), v="2.5") == 2.5
    assert _one(spark, C.try_double(F.col("v")), v="null") is None
    assert _one(spark, C.try_double(F.col("v")), v="abc") is None


def test_row_md5_null_safe(spark):
    a = _one(spark, C.row_md5(F.col("x"), F.col("y")), x="a", y=None)
    b = _one(spark, C.row_md5(F.col("x"), F.col("y")), x="a", y="<null>")
    assert a == b  # documented sentinel collision, not silent divergence
    c = _one(spark, C.row_md5(F.col("x"), F.col("y")), x="a", y="b")
    assert a != c and len(c) == 32
