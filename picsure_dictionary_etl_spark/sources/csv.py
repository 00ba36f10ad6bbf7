"""File sources (SURVEY.md §2.A): positional columnMeta CSV, TSV,
header-mapped "ideal ingest" CSV with open-ended extra columns, and
JSON payloads — each with per-row error routing instead of job failure.

Reference parity:
* positional 12-column columnMeta rows, columns 9-11 optional
  (``loading/model/ColumnMeta.java:5-18``, ``loading/ColumnMetaMapper.java:15-50``)
* escape char disabled so backslash paths survive (``configuration/Config.java:11-14``)
* malformed rows -> error registry, scan continues
  (``loading/ColumnMetaSource.java:81-98``)
* TSV with header map (``anvil/AnVILService.java:74-85``)
* dynamic extra columns -> metadata keys (``Utility/CSVUtility.java:28-49``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from picsure_dictionary_etl_spark.functions.columns import (
    decode_mu,
    split_mu_list,
    trim_single_value_categorical,
    try_double,
)

COLUMN_META_RAW_SCHEMA = T.StructType(
    [
        T.StructField("concept_path", T.StringType()),
        T.StructField("width_in_bytes", T.StringType()),
        T.StructField("column_offset", T.StringType()),
        T.StructField("categorical", T.StringType()),
        T.StructField("category_values", T.StringType()),
        T.StructField("min", T.StringType()),
        T.StructField("max", T.StringType()),
        T.StructField("all_observations_offset", T.StringType()),
        T.StructField("all_observations_length", T.StringType()),
        T.StructField("observation_count", T.StringType()),
        T.StructField("patient_count", T.StringType()),
        T.StructField("is_timestamp", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_column_meta(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Positional columnMeta CSV -> (typed rows, dead-letter rows).

    All 12 columns read as strings (PERMISSIVE, corrupt rows captured),
    then vectorized-normalized: µ decode, bool/double casts with
    sentinel nulls, µ-list split, single-value-categorical path trim.
    A1+A2+A3+B2+B3+B4 in one declarative plan.
    """
    raw = (
        spark.read.schema(COLUMN_META_RAW_SCHEMA)
        .option("header", "false")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("quote", '"')
        .option("escape", "\u0000")  # reference disables the escape char
        .csv(path)
    )
    def _parse_fails(c: str) -> F.Column:
        # the reference's Double.parseDouble throws on non-sentinel
        # non-numeric input -> row goes to the error registry
        # (ColumnMetaMapper.java:77-88 + ColumnMetaSource.java:81-98)
        sentinel = F.lower(F.trim(F.coalesce(F.col(c), F.lit("")))).isin("", "null")
        return ~sentinel & F.col(c).try_cast("double").isNull()

    bad = (
        F.col("_corrupt_record").isNotNull()
        | F.col("concept_path").isNull()
        | (F.trim(F.col("concept_path")) == "")
        | _parse_fails("min")
        | _parse_fails("max")
    )
    corrupt = raw.filter(bad).select(
        F.coalesce(
            "_corrupt_record",
            F.to_json(F.struct(*[c for c in raw.columns if c != "_corrupt_record"])),
        ).alias("error_row")
    )

    ok = raw.filter(~bad)
    categorical = F.lower(F.trim(F.col("categorical"))) == "true"
    values = split_mu_list(F.col("category_values"))
    path_col = trim_single_value_categorical(
        decode_mu(F.col("concept_path")), categorical, values
    )
    typed = ok.select(
        path_col.alias("concept_path"),
        categorical.alias("categorical"),
        values.alias("category_values"),
        try_double(F.col("min")).alias("min"),
        try_double(F.col("max")).alias("max"),
        F.col("observation_count").try_cast("long").alias("observation_count"),
        F.col("patient_count").try_cast("long").alias("patient_count"),
        (F.lower(F.trim(F.coalesce(F.col("is_timestamp"), F.lit("false")))) == "true").alias(
            "is_timestamp"
        ),
    )
    return typed, corrupt


def read_tsv(spark: SparkSession, path: str) -> DataFrame:
    """A5: header-mapped TSV (AnVIL studies)."""
    return (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_ideal_ingest_csv(
    spark: SparkSession, path: str, core_columns: list[str]
) -> tuple[DataFrame, DataFrame]:
    """A4+F2: RFC4180 CSV with a header; known ``core_columns`` stay
    wide, every other column melts to (key, value) metadata rows with
    blanks dropped (``CSVUtility.java:38-49``).

    Returns (core rows, long-format metadata)."""
    df = spark.read.option("header", "true").option("mode", "PERMISSIVE").csv(path)
    extra = [c for c in df.columns if c not in core_columns]
    core = df.select(*[c for c in core_columns if c in df.columns])
    if not extra:
        meta = spark.createDataFrame(
            [], T.StructType([
                T.StructField(core_columns[0], T.StringType()),
                T.StructField("key", T.StringType()),
                T.StructField("value", T.StringType()),
            ])
        )
        return core, meta
    from picsure_dictionary_etl_spark.operators.pivots import melt

    meta = melt(df, [core_columns[0]], extra)
    return core, meta


def read_json_payload(
    spark: SparkSession, df: DataFrame, json_col: str, schema: T.DataType
) -> DataFrame:
    """A6: JSON strings -> typed nested rows (``from_json``), parse
    failures surfacing as nulls for the caller's dead-letter split."""
    return df.withColumn("_parsed", F.from_json(F.col(json_col), schema))


CURATED_JSON_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("concept_path", T.StringType()),
        T.StructField("display", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)


def read_curated_json(
    spark: SparkSession, path: str, dataset_ref: str
) -> tuple[DataFrame, DataFrame]:
    """A7: curated-JSON concept source (``PUT /concept/curated``,
    ``concept/ConceptController.java:267-355``) — a JSON array of
    ``{name, concept_path, display?, metadata: {k: v}}`` objects.

    Returns (concepts, metadata-EAV). Parity notes: concept_type is
    pinned categorical (``:290``; the engine's lowercase spelling),
    display defaults to name (``:296-302``), newlines normalize to
    spaces; the reference's ``''`` quote-doubling is dropped (B10 — the
    plans are parameterized, not string-spliced SQL). The nested
    metadata object explodes to (concept_path, key, value) rows via
    ``map_entries`` — no per-row Python, unlike the reference's
    JSONObject loop (``:330-344``)."""
    raw = (
        spark.read.option("multiLine", "true").schema(CURATED_JSON_SCHEMA).json(path)
    )

    def clean(c):
        return F.regexp_replace(c, "\n", " ")

    concepts = raw.select(
        F.lit(dataset_ref).alias("dataset_ref"),
        clean(F.col("name")).alias("name"),
        clean(F.coalesce(F.col("display"), F.col("name"))).alias("display"),
        F.lit("categorical").alias("concept_type"),
        clean(F.col("concept_path")).alias("concept_path"),
    )
    meta = raw.select(
        clean(F.col("concept_path")).alias("concept_path"),
        F.explode(F.map_entries(F.col("metadata"))).alias("_kv"),
    ).select("concept_path", F.col("_kv.key").alias("key"), F.col("_kv.value").alias("value"))
    return concepts, meta
