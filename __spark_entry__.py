"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
(the ID is noted in each docstring); ``oracle_sql()`` carries the DuckDB
twin with identical column names and rendering. Every entry is oracled:
MinHash-LSH and SimHash use the library's ``portable=True`` md5-derived
hash stream (exact DuckDB twin), and the multimodal mapInPandas query
projects its deterministic fake-decode features to scalars.

Timestamps are compared as ``unix micros`` bigints, doubles are either
passed through untouched or rounded/decimal-cast identically on both
sides — value-hash-stable across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from picsure_dictionary_etl_spark.operators import dedup, diffs, flatten, multimodal
from picsure_dictionary_etl_spark.operators import paths as pathops
from picsure_dictionary_etl_spark.operators import pivots, similarity, text
from picsure_dictionary_etl_spark.functions.columns import row_md5


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# CDC core (events as a WAL: event_id = LSN, key = (user_id, k))
# ---------------------------------------------------------------------------


def _events_as_cdc(spark, sf_dir) -> DataFrame:
    """WAL envelope derivation: lsn=event_id, turn_idx=k from props,
    op = D for 'error' events, else upsert."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("lsn"),
        F.col("user_id"),
        F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int").alias("turn_idx"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.col("event_type"),
        F.col("value"),
        F.col("ts"),
    )


def q_cdc_lww_latest(spark, sf_dir):
    """D2/C4: last-writer-wins by max LSN per key (max_by reduce)."""
    ev = _t(spark, sf_dir, "events")
    out = flatten.last_writer_wins(
        ev, ["user_id", "event_type"], "event_id", ["value", "ts"]
    )
    return out.select(
        "user_id",
        "event_type",
        F.col("value").alias("last_value"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("last_ts_us"),
        F.col("event_id").alias("last_lsn"),
    )


SQL_CDC_LWW_LATEST = """
SELECT user_id, event_type,
       arg_max(value, event_id) AS last_value,
       epoch_us(arg_max(ts, event_id)) AS last_ts_us,
       max(event_id) AS last_lsn
FROM events GROUP BY user_id, event_type
"""


def q_cdc_apply_final_state(spark, sf_dir):
    """Flagship (D1+D2+H4): apply the derived WAL in LSN order — LWW per
    (user_id, turn_idx), deletes drop the key. Equivalent to the lake
    MERGE's net effect, expressed as one reduce for oracle parity."""
    cdc = _events_as_cdc(spark, sf_dir)
    w = flatten.last_writer_wins(
        cdc, ["user_id", "turn_idx"], "lsn", ["op", "event_type", "value"]
    )
    return w.filter(F.col("op") != "D").select(
        "user_id",
        "turn_idx",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("lsn").alias("last_lsn"),
    )


SQL_CDC_APPLY_FINAL_STATE = """
WITH ev AS (
  SELECT event_id AS lsn, user_id,
         CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS turn_idx,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         event_type, value
  FROM events
), w AS (
  SELECT user_id, turn_idx,
         arg_max(op, lsn) AS op,
         arg_max(event_type, lsn) AS last_event_type,
         arg_max(value, lsn) AS last_value,
         max(lsn) AS last_lsn
  FROM ev GROUP BY user_id, turn_idx
)
SELECT user_id, turn_idx, last_event_type, last_value, last_lsn
FROM w WHERE op <> 'D'
"""


def q_conversation_reassembly(spark, sf_dir):
    """The north-rule equality check AS a query: apply the WAL (LWW +
    deletes), then reassemble each conversation under stable turn
    ordering into one per-conversation digest — md5 over
    'turn_idx:value' pairs joined in turn order. Two engines agreeing
    on every digest IS per-turn text equality under stable ordering."""
    cdc = _events_as_cdc(spark, sf_dir)
    w = flatten.last_writer_wins(
        cdc, ["user_id", "turn_idx"], "lsn", ["op", "value"]
    ).filter(F.col("op") != "D")
    rendered = F.concat(
        F.col("turn_idx").cast("string"),
        F.lit(":"),
        F.when(F.col("value").isNull(), F.lit("null")).otherwise(
            F.format_string("%.2f", F.col("value"))
        ),
    )
    return (
        w.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct(F.col("turn_idx"), rendered.alias("r")))),
                        lambda x: x["r"],
                    ),
                    "|",
                )
            ).alias("turns_digest"),
        )
    )


SQL_CONVERSATION_REASSEMBLY = """
WITH ev AS (
  SELECT event_id AS lsn, user_id,
         CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS turn_idx,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         value
  FROM events
), w AS (
  SELECT user_id, turn_idx, arg_max(op, lsn) AS op, arg_max(value, lsn) AS value
  FROM ev GROUP BY user_id, turn_idx
)
SELECT user_id, count(*) AS n_turns,
       md5(string_agg(
             turn_idx || ':' ||
             CASE WHEN value IS NULL THEN 'null' ELSE printf('%.2f', value) END,
             '|' ORDER BY turn_idx)) AS turns_digest
FROM w WHERE op <> 'D'
GROUP BY user_id
"""


def q_cdc_dead_letter(spark, sf_dir):
    """A2/A12: per-type counts of rows failing a validity predicate —
    the dead-letter split."""
    ev = _t(spark, sf_dir, "events")
    invalid = (
        F.col("value").isNull() | (F.col("value") < 5.0) | (F.col("value") > 180.0)
    )
    return (
        ev.filter(invalid)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_invalid"), F.min("event_id").alias("first_lsn"))
    )


SQL_CDC_DEAD_LETTER = """
SELECT event_type, count(*) AS n_invalid, min(event_id) AS first_lsn
FROM events
WHERE value IS NULL OR value < 5.0 OR value > 180.0
GROUP BY event_type
"""


def q_cdc_watermark_slice(spark, sf_dir):
    """J/G6: one micro-batch = LSN-range slice (pushed-down scan filter)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter((F.col("event_id") > 2000) & (F.col("event_id") <= 4000))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("event_id").alias("max_lsn"),
            F.min("event_id").alias("min_lsn"),
        )
    )


SQL_CDC_WATERMARK_SLICE = """
SELECT event_type, count(*) AS n_events, max(event_id) AS max_lsn, min(event_id) AS min_lsn
FROM events WHERE event_id > 2000 AND event_id <= 4000 GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Reference operator analogs (SURVEY.md §2.B/C/E/F/G)
# ---------------------------------------------------------------------------


def q_partial_update_coalesce(spark, sf_dir):
    """D7: field-wise last-SPECIFIED-writer-wins (partial-update CDC) —
    each field independently from the latest event that provided it,
    respecting the delete boundary (pre-delete values never leak into a
    reinserted key). Exercises lake.merge.lww_winners_fieldwise, the
    reduce behind merge_into(update_policy='coalesce')."""
    from picsure_dictionary_etl_spark.lake.merge import lww_winners_fieldwise

    cdc = _events_as_cdc(spark, sf_dir)
    src = cdc.select(
        F.col("lsn").alias("_lsn"),
        F.col("op").alias("_op"),
        "user_id",
        "turn_idx",
        "event_type",
        "value",
    )
    w = lww_winners_fieldwise(
        src, ["user_id", "turn_idx"], ["event_type", "value"], policy="coalesce"
    )
    return w.filter(F.col("_op") != "D").select(
        "user_id",
        "turn_idx",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_specified_value"),
        F.col("_lsn").alias("last_lsn"),
    )


SQL_PARTIAL_UPDATE_COALESCE = """
WITH ev AS (
  SELECT event_id AS lsn, user_id,
         CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS turn_idx,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         event_type, value
  FROM events
), g AS (
  SELECT user_id, turn_idx,
         max(CASE WHEN op = 'D' THEN lsn END) AS del_lsn,
         arg_max(op, lsn) AS op,
         max(lsn) AS last_lsn,
         arg_max(event_type, CASE WHEN event_type IS NOT NULL THEN lsn END) AS et,
         max(CASE WHEN event_type IS NOT NULL THEN lsn END) AS et_lsn,
         arg_max(value, CASE WHEN value IS NOT NULL THEN lsn END) AS v,
         max(CASE WHEN value IS NOT NULL THEN lsn END) AS v_lsn
  FROM ev GROUP BY user_id, turn_idx
)
SELECT user_id, turn_idx,
       CASE WHEN del_lsn IS NULL OR et_lsn > del_lsn THEN et END AS last_event_type,
       CASE WHEN del_lsn IS NULL OR v_lsn > del_lsn THEN v END AS last_specified_value,
       last_lsn
FROM g WHERE op <> 'D'
"""


def q_partial_update_mixed(spark, sf_dir):
    """The MOR field-wise read path (round 3): a history mixing FULL
    rows (row-policy deltas / compacted bases — here even-LSN events)
    with PARTIAL rows (_pu-tagged field-wise deltas — odd-LSN events)
    resolves in ONE aggregate: full rows specify every field at their
    LSN, nulls included (so a committed null is never resurrected),
    partial rows only the fields they provided. Exercises
    lake.merge.lww_winners_fieldwise(full_row_col=...), the reduce
    behind resolve_live on _pu-carrying tables."""
    from picsure_dictionary_etl_spark.lake.merge import lww_winners_fieldwise

    cdc = _events_as_cdc(spark, sf_dir)
    src = cdc.select(
        F.col("lsn").alias("_lsn"),
        F.col("op").alias("_op"),
        "user_id",
        "turn_idx",
        "event_type",
        "value",
    ).withColumn("_pu", F.pmod(F.col("_lsn"), F.lit(2)) == 1)
    w = lww_winners_fieldwise(
        src, ["user_id", "turn_idx"], ["event_type", "value"],
        policy="coalesce", full_row_col="_pu",
    )
    return w.filter(F.col("_op") != "D").select(
        "user_id",
        "turn_idx",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_specified_value"),
        F.col("_lsn").alias("last_lsn"),
    )


SQL_PARTIAL_UPDATE_MIXED = """
WITH ev AS (
  SELECT event_id AS lsn, user_id,
         CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS turn_idx,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         (event_id % 2 = 1) AS pu,
         event_type, value
  FROM events
), g AS (
  SELECT user_id, turn_idx,
         max(CASE WHEN op = 'D' THEN lsn END) AS del_lsn,
         arg_max(op, lsn) AS op,
         max(lsn) AS last_lsn,
         arg_max(event_type,
                 CASE WHEN (NOT pu) OR event_type IS NOT NULL THEN lsn END) AS et,
         max(CASE WHEN (NOT pu) OR event_type IS NOT NULL THEN lsn END) AS et_lsn,
         arg_max(value, CASE WHEN (NOT pu) OR value IS NOT NULL THEN lsn END) AS v,
         max(CASE WHEN (NOT pu) OR value IS NOT NULL THEN lsn END) AS v_lsn
  FROM ev GROUP BY user_id, turn_idx
)
SELECT user_id, turn_idx,
       CASE WHEN del_lsn IS NULL OR et_lsn > del_lsn THEN et END AS last_event_type,
       CASE WHEN del_lsn IS NULL OR v_lsn > del_lsn THEN v END AS last_specified_value,
       last_lsn
FROM g WHERE op <> 'D'
"""


def q_cdc_change_feed(spark, sf_dir):
    """Change data feed (J/CDF, lake.merge.state_diff — the classify
    half of table_changes): diff the LWW live state at the half-way
    watermark against the final state; one full outer join, _change in
    I/U/D from null-sides + payload-hash compare. Oracled via the
    column-wise equivalent (IS DISTINCT FROM)."""
    from picsure_dictionary_etl_spark.lake.merge import state_diff

    cdc = _events_as_cdc(spark, sf_dir)
    mid = cdc.agg(F.floor(F.max("lsn") / 2).alias("_mid"))

    def live(df):
        w = flatten.last_writer_wins(
            df, ["user_id", "turn_idx"], "lsn", ["op", "event_type", "value"]
        )
        return (
            w.filter(F.col("op") != "D")
            .withColumnRenamed("lsn", "_lsn")
            .select("user_id", "turn_idx", "event_type", "value", "_lsn")
        )

    old = live(cdc.join(F.broadcast(mid)).filter(F.col("lsn") <= F.col("_mid")))
    new = live(cdc)
    d = state_diff(old, new, ["user_id", "turn_idx"], ["event_type", "value"])
    return d.select(
        F.col("_change").alias("change"),
        "user_id",
        "turn_idx",
        F.col("event_type").alias("new_event_type"),
        F.col("value").alias("new_value"),
        F.col("_lsn").alias("lsn"),
    )


SQL_CDC_CHANGE_FEED = """
WITH ev AS (
  SELECT event_id AS lsn, user_id,
         CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS turn_idx,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         event_type, value
  FROM events
), old_w AS (
  SELECT user_id, turn_idx, arg_max(op, lsn) AS op,
         arg_max(event_type, lsn) AS event_type,
         arg_max(value, lsn) AS value, max(lsn) AS lsn
  FROM ev WHERE lsn <= (SELECT CAST(floor(max(lsn) / 2) AS BIGINT) FROM ev)
  GROUP BY user_id, turn_idx
), new_w AS (
  SELECT user_id, turn_idx, arg_max(op, lsn) AS op,
         arg_max(event_type, lsn) AS event_type,
         arg_max(value, lsn) AS value, max(lsn) AS lsn
  FROM ev GROUP BY user_id, turn_idx
), o AS (SELECT * FROM old_w WHERE op <> 'D'),
   n AS (SELECT * FROM new_w WHERE op <> 'D')
SELECT CASE WHEN o.user_id IS NULL THEN 'I'
            WHEN n.user_id IS NULL THEN 'D'
            ELSE 'U' END AS change,
       coalesce(n.user_id, o.user_id) AS user_id,
       coalesce(n.turn_idx, o.turn_idx) AS turn_idx,
       n.event_type AS new_event_type,
       n.value AS new_value,
       coalesce(n.lsn, o.lsn) AS lsn
FROM o FULL OUTER JOIN n USING (user_id, turn_idx)
WHERE o.user_id IS NULL OR n.user_id IS NULL
   OR (o.event_type IS DISTINCT FROM n.event_type)
   OR (o.value IS DISTINCT FROM n.value)
"""


def q_cdf_fold_materialize(spark, sf_dir):
    """Consumer-side CDF fold (lake.merge.materialize_feed — the
    inverse of table_changes): reconstruct final live state from a
    multi-span change feed, exercising the documented D-preimage rule
    — a delete change row is stamped with the DELETED row's last live
    _lsn, so update-then-delete emits U and D at the SAME _lsn and the
    fold must break equal-LSN ties in favor of D. Feed synthesized
    deterministically from events: every key's first event is its I
    span; keys with >=2 events add a U span at max LSN; keys whose
    LAST event is an 'error' add a D stamped with the preimage LSN
    (== the U's LSN when one exists — real ties at sf0.01)."""
    from picsure_dictionary_etl_spark.lake.merge import materialize_feed

    ev = _events_as_cdc(spark, sf_dir)
    agg = ev.groupBy("user_id", "turn_idx").agg(
        F.min("lsn").alias("first_lsn"),
        F.max("lsn").alias("last_lsn"),
        F.min_by("value", "lsn").alias("first_value"),
        F.max_by("value", "lsn").alias("last_value"),
        F.max_by("event_type", "lsn").alias("last_type"),
        F.count(F.lit(1)).alias("cnt"),
    )
    i_rows = agg.select(
        "user_id", "turn_idx", F.lit("I").alias("_change"),
        F.col("first_value").alias("value"), F.col("first_lsn").alias("_lsn"),
    )
    u_rows = agg.filter(F.col("cnt") >= 2).select(
        "user_id", "turn_idx", F.lit("U").alias("_change"),
        F.col("last_value").alias("value"), F.col("last_lsn").alias("_lsn"),
    )
    d_rows = agg.filter(F.col("last_type") == "error").select(
        "user_id", "turn_idx", F.lit("D").alias("_change"),
        F.lit(None).cast("string").alias("value"),
        F.col("last_lsn").alias("_lsn"),
    )
    feed = i_rows.unionByName(u_rows).unionByName(d_rows)
    out = materialize_feed(feed, ["user_id", "turn_idx"], ["value"])
    return out.select(
        "user_id", "turn_idx",
        F.col("value").alias("last_value"),
        F.col("_lsn").alias("last_lsn"),
    )


SQL_CDF_FOLD_MATERIALIZE = """
WITH ev AS (
  SELECT event_id AS lsn, user_id,
         CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS turn_idx,
         event_type, value
  FROM events
), agg AS (
  SELECT user_id, turn_idx,
         min(lsn) AS first_lsn, max(lsn) AS last_lsn,
         arg_min(value, lsn) AS first_value,
         arg_max(value, lsn) AS last_value,
         arg_max(event_type, lsn) AS last_type,
         count(*) AS cnt
  FROM ev GROUP BY user_id, turn_idx
), feed AS (
  SELECT user_id, turn_idx, 'I' AS c, first_value AS v, first_lsn AS lsn
  FROM agg
  UNION ALL
  SELECT user_id, turn_idx, 'U', last_value, last_lsn FROM agg WHERE cnt >= 2
  UNION ALL
  SELECT user_id, turn_idx, 'D', NULL, last_lsn FROM agg
  WHERE last_type = 'error'
), win AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, turn_idx
             ORDER BY lsn DESC, (c = 'D') DESC) AS rn
  FROM feed
)
SELECT user_id, turn_idx, v AS last_value, lsn AS last_lsn
FROM win WHERE rn = 1 AND c <> 'D'
"""


def q_lake_time_travel(spark, sf_dir):
    """Lake storage + TIMESTAMP AS OF as a driver query (D1/D2/H4 over
    the REAL on-disk lake, plus the r6 commit-timestamp surface): apply
    the derived WAL into a LakeTable in two MOR commits split at the
    WAL's median LSN, record the FIRST commit's ``committed_at``
    wall-clock stamp from its manifest, then time-travel read at that
    stamp (``version_at_timestamp`` → ``read_version`` → merge-on-read
    resolve). The result must equal the plain LWW fold over events with
    ``lsn <= cut`` (deletes dropped) — the DuckDB oracle, which never
    sees the lake. The one driver query that certifies manifest
    commits, the strictly-monotone commit-stamp rule, and MOR
    resolution end to end (the others are pure reads).
    Ref parity: the reference re-reads the whole DB state per load
    (README.md:247-260); snapshots make 'state as of' a metadata read.
    """
    import tempfile

    from pyspark.sql import types as T

    from picsure_dictionary_etl_spark.lake.merge import merge_into, resolve_live
    from picsure_dictionary_etl_spark.lake.table import LakeTable

    cdc = _events_as_cdc(spark, sf_dir).filter(F.col("turn_idx").isNotNull())
    # metadata-scale scalar (one agg row), same class as the runner's
    # max-LSN probe (cdc/runner.py:254)
    cut = cdc.agg(F.floor(F.max("lsn") / 2).cast("long")).first()[0]
    src = cdc.select(
        "user_id", "turn_idx", "event_type", "value",
        F.col("op").alias("_op"), F.col("lsn").alias("_lsn"),
    )
    schema = T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("_op", T.StringType(), False),
        T.StructField("_lsn", T.LongType(), False),
    ])
    root = tempfile.mkdtemp(prefix="lake_tt_") + "/t"
    t = LakeTable.create(spark, root, schema=schema,
                         key_cols=["user_id", "turn_idx"], bucket_count=8)
    merge_into(t, src.filter(F.col("_lsn") <= cut), "tt-1")
    stamp = t.snapshot(t.current_version()).committed_at
    merge_into(t, src.filter(F.col("_lsn") > cut), "tt-2")
    as_of = t.read_version(t.version_at_timestamp(stamp))
    live = resolve_live(as_of, ["user_id", "turn_idx"],
                        ["event_type", "value"])
    return live.select(
        "user_id", "turn_idx",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("_lsn").alias("last_lsn"),
    )


def q_cdf_batch_span(spark, sf_dir):
    """The lake_cdf Python-datasource BATCH read path under the driver's
    value-hash gate: apply the derived WAL into an on-disk LakeTable in
    two MOR commits split at the median LSN, then
    ``spark.read.format("lake_cdf").option("startversion", v_cut)`` —
    the span's I/U/D rows must equal the classification between the
    two plain LWW folds (old = lsn<=cut, new = all), which is the
    DuckDB oracle (lake- and datasource-blind): I = key live only
    after; D = key live only before (row carries the PREIMAGE lsn and
    null payload); U = live in both with a changed (event_type, value)
    pair or an advanced winner lsn. Exercises the executor-side
    pyarrow resolve + vectorized diff + arrow-batch yield end to end.
    """
    import tempfile

    from pyspark.sql import types as T

    from picsure_dictionary_etl_spark.lake.merge import merge_into
    from picsure_dictionary_etl_spark.lake.table import LakeTable
    from picsure_dictionary_etl_spark.streaming.cdf_source import (
        LakeChangeFeedDataSource,
    )

    spark.dataSource.register(LakeChangeFeedDataSource)
    cdc = _events_as_cdc(spark, sf_dir).filter(F.col("turn_idx").isNotNull())
    cut = cdc.agg(F.floor(F.max("lsn") / 2).cast("long")).first()[0]
    src = cdc.select(
        "user_id", "turn_idx", "event_type", "value",
        F.col("op").alias("_op"), F.col("lsn").alias("_lsn"),
    )
    schema = T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("_op", T.StringType(), False),
        T.StructField("_lsn", T.LongType(), False),
    ])
    root = tempfile.mkdtemp(prefix="lake_cdf_span_") + "/t"
    t = LakeTable.create(spark, root, schema=schema,
                         key_cols=["user_id", "turn_idx"], bucket_count=8)
    merge_into(t, src.filter(F.col("_lsn") <= cut), "span-1")
    v_cut = t.current_version()
    merge_into(t, src.filter(F.col("_lsn") > cut), "span-2")
    feed = (
        spark.read.format("lake_cdf")
        .option("path", root)
        .option("startversion", str(v_cut))
        .load()
    )
    return feed.select(
        "_change", "user_id", "turn_idx",
        F.col("event_type").alias("new_event_type"),
        F.col("value").alias("new_value"),
        F.col("_lsn").alias("change_lsn"),
    )


def q_lake_sink_append(spark, sf_dir):
    """The native lake SINK under the driver's value-hash gate: apply
    the derived WAL via ``df.write.format("lake").mode("append")`` in
    two batches split at the median LSN (the second exercises the
    executor watermark guard against the first's committed watermark),
    then resolve merge-on-read — the appended raw rows must fold to the
    SAME final state as the plain LWW reduce (deletes dropped), the
    DuckDB oracle. Bucket placement runs the JVM fast path
    (with_bucket). Certifies: arrow executor write, per-bucket file
    layout, manifest commit, batch-id/watermark bookkeeping, read-time
    LWW over sink-written deltas."""
    import tempfile

    from pyspark.sql import types as T

    from picsure_dictionary_etl_spark.lake.merge import resolve_live
    from picsure_dictionary_etl_spark.lake.table import LakeTable
    from picsure_dictionary_etl_spark.streaming.lake_sink import (
        LakeTableSinkDataSource,
        with_bucket,
    )

    spark.dataSource.register(LakeTableSinkDataSource)
    cdc = _events_as_cdc(spark, sf_dir).filter(F.col("turn_idx").isNotNull())
    cut = cdc.agg(F.floor(F.max("lsn") / 2).cast("long")).first()[0]
    src = cdc.select(
        "user_id", "turn_idx", "event_type", "value",
        F.col("op").alias("_op"), F.col("lsn").alias("_lsn"),
    )
    schema = T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("_op", T.StringType(), False),
        T.StructField("_lsn", T.LongType(), False),
    ])
    root = tempfile.mkdtemp(prefix="lake_sink_q_") + "/t"
    LakeTable.create(spark, root, schema=schema,
                     key_cols=["user_id", "turn_idx"], bucket_count=8)
    for lo_hi in (F.col("_lsn") <= cut, F.col("_lsn") > cut):
        (with_bucket(src.filter(lo_hi), root)
         .write.format("lake").mode("append").option("path", root).save())
    t = LakeTable.load(spark, root)
    live = resolve_live(t.read(), ["user_id", "turn_idx"],
                        ["event_type", "value"])
    return live.select(
        "user_id", "turn_idx",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("_lsn").alias("last_lsn"),
    )


SQL_LAKE_SINK_APPEND = """
WITH ev AS (
  SELECT event_id AS lsn, user_id,
         CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS turn_idx,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         event_type, value
  FROM events
), w AS (
  SELECT user_id, turn_idx,
         arg_max(op, lsn) AS op,
         arg_max(event_type, lsn) AS last_event_type,
         arg_max(value, lsn) AS last_value,
         max(lsn) AS last_lsn
  FROM ev WHERE turn_idx IS NOT NULL
  GROUP BY user_id, turn_idx
)
SELECT user_id, turn_idx, last_event_type, last_value, last_lsn
FROM w WHERE op <> 'D'
"""


SQL_CDF_BATCH_SPAN = """
WITH ev AS (
  SELECT event_id AS lsn, user_id,
         CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS turn_idx,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         event_type, value
  FROM events
), cut AS (
  SELECT CAST(floor(max(lsn) / 2) AS BIGINT) AS c FROM ev
), fold_old AS (
  SELECT user_id, turn_idx, arg_max(op, lsn) AS op,
         arg_max(event_type, lsn) AS et, arg_max(value, lsn) AS v,
         max(lsn) AS lsn
  FROM ev, cut WHERE lsn <= cut.c AND turn_idx IS NOT NULL
  GROUP BY user_id, turn_idx
), fold_new AS (
  SELECT user_id, turn_idx, arg_max(op, lsn) AS op,
         arg_max(event_type, lsn) AS et, arg_max(value, lsn) AS v,
         max(lsn) AS lsn
  FROM ev WHERE turn_idx IS NOT NULL GROUP BY user_id, turn_idx
), o AS (SELECT * FROM fold_old WHERE op <> 'D'),
   n AS (SELECT * FROM fold_new WHERE op <> 'D')
-- change = payload difference ONLY: a key re-asserted with an
-- identical payload at a higher lsn emits NOTHING (state_diff hashes
-- payload columns, never _lsn)
SELECT CASE WHEN o.user_id IS NULL THEN 'I'
            WHEN n.user_id IS NULL THEN 'D'
            ELSE 'U' END AS _change,
       COALESCE(n.user_id, o.user_id) AS user_id,
       COALESCE(n.turn_idx, o.turn_idx) AS turn_idx,
       n.et AS new_event_type,
       n.v AS new_value,
       COALESCE(n.lsn, o.lsn) AS change_lsn
FROM o FULL OUTER JOIN n
  ON o.user_id = n.user_id AND o.turn_idx = n.turn_idx
WHERE o.user_id IS NULL OR n.user_id IS NULL
   OR (o.et IS DISTINCT FROM n.et) OR (o.v IS DISTINCT FROM n.v)
"""


SQL_LAKE_TIME_TRAVEL = """
WITH ev AS (
  SELECT event_id AS lsn, user_id,
         CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS turn_idx,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         event_type, value
  FROM events
), cut AS (
  SELECT CAST(floor(max(lsn) / 2) AS BIGINT) AS c FROM ev
), w AS (
  SELECT user_id, turn_idx,
         arg_max(op, lsn) AS op,
         arg_max(event_type, lsn) AS last_event_type,
         arg_max(value, lsn) AS last_value,
         max(lsn) AS last_lsn
  FROM ev, cut
  WHERE lsn <= cut.c AND turn_idx IS NOT NULL
  GROUP BY user_id, turn_idx
)
SELECT user_id, turn_idx, last_event_type, last_value, last_lsn
FROM w WHERE op <> 'D'
"""


def q_partial_update_blank_preserve(spark, sf_dir):
    """D6 blank-preserving reduce as a driver query: synthesized blank
    and null event_type fields (deterministic on event_id) are both
    'not provided' under blank_preserve — the latest NON-BLANK specifier
    wins, respecting the delete boundary."""
    from picsure_dictionary_etl_spark.lake.merge import lww_winners_fieldwise

    cdc = _events_as_cdc(spark, sf_dir)
    src = cdc.select(
        F.col("lsn").alias("_lsn"),
        F.col("op").alias("_op"),
        "user_id",
        "turn_idx",
        F.when(F.pmod(F.col("lsn"), F.lit(5)) == 0, F.lit(""))
        .when(F.pmod(F.col("lsn"), F.lit(7)) == 0, F.lit(None))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        "value",
    )
    w = lww_winners_fieldwise(
        src, ["user_id", "turn_idx"], ["event_type", "value"],
        policy="blank_preserve", schema=src.schema,
    )
    return w.filter(F.col("_op") != "D").select(
        "user_id",
        "turn_idx",
        F.col("event_type").alias("last_nonblank_event_type"),
        F.col("value").alias("last_specified_value"),
        F.col("_lsn").alias("last_lsn"),
    )


SQL_PARTIAL_UPDATE_BLANK_PRESERVE = """
WITH ev AS (
  SELECT event_id AS lsn, user_id,
         CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS turn_idx,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         CASE WHEN event_id % 5 = 0 THEN ''
              WHEN event_id % 7 = 0 THEN NULL
              ELSE event_type END AS event_type,
         value
  FROM events
), g AS (
  SELECT user_id, turn_idx,
         max(CASE WHEN op = 'D' THEN lsn END) AS del_lsn,
         arg_max(op, lsn) AS op,
         max(lsn) AS last_lsn,
         arg_max(event_type,
                 CASE WHEN event_type IS NOT NULL
                       AND regexp_replace(event_type, '\\s', '', 'g') <> ''
                      THEN lsn END) AS et,
         max(CASE WHEN event_type IS NOT NULL
                   AND regexp_replace(event_type, '\\s', '', 'g') <> ''
                  THEN lsn END) AS et_lsn,
         arg_max(value, CASE WHEN value IS NOT NULL THEN lsn END) AS v,
         max(CASE WHEN value IS NOT NULL THEN lsn END) AS v_lsn
  FROM ev GROUP BY user_id, turn_idx
)
SELECT user_id, turn_idx,
       CASE WHEN del_lsn IS NULL OR et_lsn > del_lsn THEN et END AS last_nonblank_event_type,
       CASE WHEN del_lsn IS NULL OR v_lsn > del_lsn THEN v END AS last_specified_value,
       last_lsn
FROM g WHERE op <> 'D'
"""


def q_flatten_categorical(spark, sf_dir):
    """C2: sorted distinct value-set union per key (µ-joined)."""
    ev = _t(spark, sf_dir, "events")
    out = flatten.flatten_categorical_scalar(ev, "user_id", "event_type")
    return out.select(
        "user_id", F.array_join("values", "µ").alias("value_set"), "n_rows"
    )


SQL_FLATTEN_CATEGORICAL = """
SELECT user_id, string_agg(DISTINCT event_type, 'µ' ORDER BY event_type) AS value_set,
       count(*) AS n_rows
FROM events GROUP BY user_id
"""


def q_flatten_continuous(spark, sf_dir):
    """C3: min-of-mins / max-of-maxes per key."""
    li = _t(spark, sf_dir, "lineitem")
    return flatten.flatten_continuous(li, "l_partkey", "l_extendedprice", "l_extendedprice").select(
        "l_partkey", "min_val", "max_val", "n_rows"
    )


SQL_FLATTEN_CONTINUOUS = """
SELECT l_partkey, min(l_extendedprice) AS min_val, max(l_extendedprice) AS max_val,
       count(*) AS n_rows
FROM lineitem GROUP BY l_partkey
"""


def q_first_wins_pick(spark, sf_dir):
    """C4/D2: first-writer-wins representative per key (min_by)."""
    ev = _t(spark, sf_dir, "events")
    out = flatten.first_wins(ev, ["user_id"], "event_id", ["event_type", "value"])
    return out.select(
        "user_id",
        F.col("event_type").alias("first_event_type"),
        F.col("value").alias("first_value"),
        F.col("event_id").alias("first_lsn"),
    )


SQL_FIRST_WINS_PICK = """
SELECT user_id, arg_min(event_type, event_id) AS first_event_type,
       arg_min(value, event_id) AS first_value, min(event_id) AS first_lsn
FROM events GROUP BY user_id
"""


def q_study_filter(spark, sf_dir):
    """B1+E1: allow-list filter on the path root segment (broadcast dims)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    path = F.concat(F.lit("\\"), F.col("r_name"), F.lit("\\"), F.col("n_name"), F.lit("\\"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.lower("r_name").isin("asia", "europe"))
        .groupBy(path.alias("concept_path"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


SQL_STUDY_FILTER = """
SELECT '\\' || r_name || '\\' || n_name || '\\' AS concept_path, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE lower(r_name) IN ('asia', 'europe')
GROUP BY 1
"""


def _paths_df(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.concat(
                F.lit("\\"), "r_name", F.lit("\\"), "n_name", F.lit("\\"), "c_mktsegment", F.lit("\\")
            ).alias("concept_path")
        )
        .distinct()
    )


def q_path_prefix_explode(spark, sf_dir):
    """K (UDTF analog): leaf path -> ancestor prefix rows, distinct."""
    out = pathops.distinct_concept_nodes(_paths_df(spark, sf_dir), "concept_path")
    return out.select("prefix", F.col("depth").cast("int").alias("depth"))


SQL_PATH_PREFIX_EXPLODE = """
WITH paths AS (
  SELECT DISTINCT [r_name, n_name, c_mktsegment] AS segs
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
)
SELECT DISTINCT '\\' || array_to_string(segs[1:i], '\\') || '\\' AS prefix, CAST(i AS INT) AS depth
FROM paths, (SELECT unnest(generate_series(1, 3)) AS i)
"""


def q_leaf_paths(spark, sf_dir):
    """E3: anti-join leaf detection over the exploded prefix set."""
    return pathops.leaf_paths(_paths_df(spark, sf_dir), "concept_path")


SQL_LEAF_PATHS = """
WITH paths AS (
  SELECT DISTINCT '\\' || r_name || '\\' || n_name || '\\' || c_mktsegment || '\\' AS concept_path,
         [r_name, n_name, c_mktsegment] AS segs
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
),
prefixes AS (
  SELECT DISTINCT '\\' || array_to_string(segs[1:i], '\\') || '\\' AS p
  FROM paths, (SELECT unnest(generate_series(1, 2)) AS i)
)
SELECT concept_path FROM paths
WHERE concept_path NOT IN (SELECT p FROM prefixes)
"""


def q_facet_expression_filter(spark, sf_dir):
    """B6/B7: {exactly, contains, regex} on indexed path segments,
    OR-of-ANDs. Path is built from type\\brand\\name-words so every
    predicate kind has real selectivity on the synthetic data (the r3
    rule literals targeted TPC-H p_type strings that don't exist here
    and certified a trivial 0 = 0 match)."""
    from picsure_dictionary_etl_spark.operators.facets import Expression, FacetRule, compile_rule

    p = _t(spark, sf_dir, "part").withColumn(
        "concept_path",
        F.concat(
            F.lit("\\"), F.col("p_type"),
            F.lit("\\"), F.col("p_brand"),
            F.lit("\\"), F.regexp_replace("p_name", " ", "\\\\"), F.lit("\\"),
        ),
    )
    rule = FacetRule(
        "metal",
        groups=[
            [Expression("regex", "ECONOMY|PROMO", 0), Expression("contains", "ring", -1)],
            [Expression("exactly", "STANDARD", 0), Expression("contains", "Brand#1", None)],
        ],
    )
    return p.filter(compile_rule(rule)).select("p_partkey", "p_type")


SQL_FACET_EXPRESSION_FILTER = """
WITH t AS (
  SELECT p_partkey, p_type,
         list_concat([p_type, p_brand], string_split(p_name, ' ')) AS segs
  FROM part)
SELECT p_partkey, p_type FROM t
WHERE (regexp_matches(segs[1], 'ECONOMY|PROMO') AND contains(segs[-1], 'ring'))
   OR (segs[1] = 'STANDARD' AND EXISTS (SELECT 1 FROM unnest(segs) AS u(s) WHERE contains(s, 'Brand#1')))
"""


def q_eav_unpivot(spark, sf_dir):
    """F2: wide -> (key, value) EAV rows."""
    p = _t(spark, sf_dir, "part")
    return pivots.melt(p, ["p_partkey"], ["p_brand", "p_name", "p_type"])


SQL_EAV_UNPIVOT = """
SELECT p_partkey, 'p_brand' AS key, p_brand AS value FROM part
UNION ALL SELECT p_partkey, 'p_type', p_type FROM part
UNION ALL SELECT p_partkey, 'p_name', p_name FROM part
"""


def q_eav_pivot(spark, sf_dir):
    """F1: EAV -> wide, explicit sorted key list (no extra distinct job)."""
    p = _t(spark, sf_dir, "part")
    eav = pivots.melt(p, ["p_partkey"], ["p_brand", "p_name", "p_type"])
    return pivots.eav_pivot(eav, "p_partkey", "key", "value", ["p_brand", "p_name", "p_type"])


SQL_EAV_PIVOT = """
WITH eav AS (
  SELECT p_partkey, 'p_brand' AS key, p_brand AS value FROM part
  UNION ALL SELECT p_partkey, 'p_type', p_type FROM part
  UNION ALL SELECT p_partkey, 'p_name', p_name FROM part
)
SELECT p_partkey,
       max(CASE WHEN key = 'p_brand' THEN value END) AS p_brand,
       max(CASE WHEN key = 'p_name' THEN value END) AS p_name,
       max(CASE WHEN key = 'p_type' THEN value END) AS p_type
FROM eav GROUP BY p_partkey
"""


def q_anti_join_new(spark, sf_dir):
    """D10/E2: keys present in the dim but absent from the fact.

    Anti-joins against URGENT orders only: on the synthetic data every
    customer has at least one order, so the unfiltered pairing returned
    0 rows and certified nothing (r3 verdict). ~13% of customers have no
    urgent order at every test SF."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return diffs.new_rows(c.select("c_custkey"), o.select(F.col("o_custkey").alias("c_custkey")), ["c_custkey"])


SQL_ANTI_JOIN_NEW = """
SELECT c_custkey FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def q_update_only_matched(spark, sf_dir):
    """D11: touch only rows whose key already exists (left semi)."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    amer = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "AMERICA")
        .select("n_nationkey")
    )
    return s.join(amer, s.s_nationkey == amer.n_nationkey, "left_semi").select(
        "s_suppkey", "s_nationkey"
    )


SQL_UPDATE_ONLY_MATCHED = """
SELECT s_suppkey, s_nationkey FROM supplier
WHERE s_nationkey IN (
  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA')
"""


def q_hierarchical_rollup(spark, sf_dir):
    """E8/F4: bottom-up rollup — child-level counts unioned into parents."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    per_nation = j.groupBy(F.col("n_name").alias("name")).agg(
        F.count(F.lit(1)).alias("n_customers")
    ).withColumn("level", F.lit("nation"))
    per_region = j.groupBy(F.col("r_name").alias("name")).agg(
        F.count(F.lit(1)).alias("n_customers")
    ).withColumn("level", F.lit("region"))
    return per_nation.unionByName(per_region).select("level", "name", "n_customers")


SQL_HIERARCHICAL_ROLLUP = """
WITH j AS (
  SELECT n_name, r_name FROM customer
  JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
)
SELECT 'nation' AS level, n_name AS name, count(*) AS n_customers FROM j GROUP BY n_name
UNION ALL
SELECT 'region', r_name, count(*) FROM j GROUP BY r_name
"""


def q_change_detection_hash(spark, sf_dir):
    """D9/I: canonical row hash for no-op suppression; distinct hashes
    per group. Doubles rendered with printf('%.2f') on both engines."""
    o = _t(spark, sf_dir, "orders")
    h = row_md5(
        F.col("o_orderkey"),
        F.col("o_orderstatus"),
        F.format_string("%.2f", F.col("o_totalprice")),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
    )
    return (
        o.withColumn("row_hash", h)
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("row_hash").alias("n_distinct_hashes"), F.count(F.lit(1)).alias("n_rows"))
    )


SQL_CHANGE_DETECTION_HASH = """
SELECT o_orderpriority,
       count(DISTINCT md5(
         CAST(o_orderkey AS VARCHAR) || o_orderstatus ||
         printf('%.2f', o_totalprice) || strftime(o_orderdate, '%Y-%m-%d')
       )) AS n_distinct_hashes,
       count(*) AS n_rows
FROM orders GROUP BY o_orderpriority
"""


def q_multiway_join_revenue(spark, sf_dir):
    """E4/E1: 5-table join, exact decimal revenue per nation (ASIA)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast("decimal(14,2)") * (
        F.lit(1).cast("decimal(14,2)") - F.col("l_discount").cast("decimal(14,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(rev).cast("decimal(28,4)").cast("double").alias("revenue"))
    )


SQL_MULTIWAY_JOIN_REVENUE = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
                (CAST(1 AS DECIMAL(14,2)) - CAST(l_discount AS DECIMAL(14,2)))) AS DECIMAL(28,4)) :: DOUBLE AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def q_key_filtered_join(spark, sf_dir):
    """E5: key-filtered left join (predicate inside the ON clause)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (li.l_partkey == p.p_partkey) & (p.p_size < 10)
    return (
        li.join(p, cond, "left")
        .groupBy("l_returnflag")
        .agg(F.count("p_partkey").alias("n_small_parts"), F.count(F.lit(1)).alias("n_rows"))
    )


SQL_KEY_FILTERED_JOIN = """
SELECT l_returnflag, count(p_partkey) AS n_small_parts, count(*) AS n_rows
FROM lineitem LEFT JOIN part ON l_partkey = p_partkey AND p_size < 10
GROUP BY l_returnflag
"""


def q_windowed_event_counts(spark, sf_dir):
    """Tumbling 1-day event-time windows per event_type (the batch twin
    of streaming/windows.windowed_event_counts — same F.window operator
    Structured Streaming runs with a watermark): counts plus
    order-independent min/max of value (double sums are float-order
    unstable across engines; min/max are exact). Window start projected
    as unix micros per the oracle timestamp rule."""
    ev = _t(spark, sf_dir, "events")
    w = ev.groupBy(
        F.window("ts", "1 day").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )
    return w.select(
        # ts is TIMESTAMP_NTZ in the parquet; the session tz is pinned
        # UTC (session.py), so the cast is numerically identity
        F.unix_micros(F.col("w.start").cast("timestamp")).alias("window_start_us"),
        "event_type",
        "n",
        "min_value",
        "max_value",
    )


SQL_WINDOWED_EVENT_COUNTS = """
SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS window_start_us,
       event_type,
       count(*) AS n,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events
GROUP BY 1, 2
"""


def q_window_latest_k(spark, sf_dir):
    """G/window: latest 3 events per user (the LWW window generalization)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "event_type", F.col("rn").cast("int").alias("rn"))
    )


SQL_WINDOW_LATEST_K = """
SELECT user_id, event_id, event_type,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS INT) AS rn
FROM events
QUALIFY rn <= 3
"""


def q_sorted_export(spark, sf_dir):
    """G1/A9: deterministic ordered export slice (top 50 by total price)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(50)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


SQL_SORTED_EXPORT = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
"""


def q_distinct_sorted(spark, sf_dir):
    """C5: distinct + sort discovery."""
    return _t(spark, sf_dir, "orders").select("o_orderpriority").distinct().orderBy("o_orderpriority")


SQL_DISTINCT_SORTED = "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority"


def q_count_per_key(spark, sf_dir):
    """C6: count per key (lineage/report counts)."""
    return _t(spark, sf_dir, "orders").groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))


SQL_COUNT_PER_KEY = "SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey"


# ---------------------------------------------------------------------------
# Training-data pipeline operators (documents / embeddings)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash."""
    d = _t(spark, sf_dir, "documents")
    return dedup.exact_duplicates(d, "doc_id", "text")


SQL_DEDUP_EXACT = """
SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def q_dedup_jaccard_pairs(spark, sf_dir):
    """Near-dup pairs: word-3-gram Jaccard >= 0.5 via inverted-index join.
    ``max_shingle_freq=100`` drops shingles shared by >100 docs — the
    quadratic-blowup guard that makes this survive boilerplate at scale
    (candidate count stays O(docs x rare-shingles), never all-pairs).
    Sizes (|A|, |B|) still count ALL shingles; only candidate generation
    is capped — mirrored exactly in the oracle's ``rare`` CTE."""
    d = _t(spark, sf_dir, "documents")
    return dedup.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5, max_shingle_freq=100)


SQL_DEDUP_JACCARD_PAIRS = """
WITH words AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM words, (SELECT unnest(generate_series(1, 10000)) AS i) s
  WHERE i <= len(w) - 2
),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM grams GROUP BY doc_id),
rare AS (SELECT shingle FROM grams GROUP BY shingle HAVING count(*) <= 100),
gr AS (SELECT g.doc_id, g.shingle FROM grams g JOIN rare USING (shingle)),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM gr a JOIN gr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(n_common / (sa.n_shingles + sb.n_shingles - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common / (sa.n_shingles + sb.n_shingles - n_common) >= 0.5
"""


def q_dedup_containment_pairs(spark, sf_dir):
    """Directed near-superset dedup (round 3): shingle containment
    |A∩B|/|A| — catches a short document embedded in a longer one,
    which Jaccard under-scores. Same capped inverted-index plan as
    dedup_jaccard_pairs."""
    d = _t(spark, sf_dir, "documents")
    return dedup.containment_pairs(
        d, "doc_id", "text", n=3, threshold=0.5, max_shingle_freq=100
    )


SQL_DEDUP_CONTAINMENT_PAIRS = """
WITH words AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM words, (SELECT unnest(generate_series(1, 10000)) AS i) s
  WHERE i <= len(w) - 2
),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM grams GROUP BY doc_id),
rare AS (SELECT shingle FROM grams GROUP BY shingle HAVING count(*) <= 100),
gr AS (SELECT g.doc_id, g.shingle FROM grams g JOIN rare USING (shingle)),
common AS (
  SELECT a.doc_id AS id_small, b.doc_id AS id_big, count(*) AS n_common
  FROM gr a JOIN gr b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_small, id_big, round(n_common / s.n_shingles, 6) AS containment
FROM common JOIN sizes s ON s.doc_id = id_small
WHERE n_common / s.n_shingles >= 0.5
"""


def q_corpus_curation(spark, sf_dir):
    """Composed training-data curation pipeline: quality gate (length)
    + near-dup removal (drop the higher-id side of every Jaccard>=0.5
    pair) in one plan — the filter a pretraining corpus pass runs.
    Both stages reuse the library operators; Catalyst fuses the quality
    projection and pushes the anti-join after the (already-capped)
    candidate generation."""
    d = _t(spark, sf_dir, "documents")
    q = text.quality_features(d.select("doc_id", "text")).filter(F.col("n_tokens") >= 40)
    losers = (
        dedup.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5, max_shingle_freq=100)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return q.join(losers, "doc_id", "left_anti").select(
        "doc_id", "n_tokens", "mean_token_len"
    )


SQL_CORPUS_CURATION = """
WITH words AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM words, (SELECT unnest(generate_series(1, 10000)) AS i) s
  WHERE i <= len(w) - 2
),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM grams GROUP BY doc_id),
rare AS (SELECT shingle FROM grams GROUP BY shingle HAVING count(*) <= 100),
gr AS (SELECT g.doc_id, g.shingle FROM grams g JOIN rare USING (shingle)),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM gr a JOIN gr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
losers AS (
  SELECT DISTINCT id_b AS doc_id
  FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_common / (sa.n_shingles + sb.n_shingles - n_common) >= 0.5
),
quality AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
         round(length(text) / greatest(CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END, 1), 6) AS mean_token_len
  FROM documents
)
SELECT doc_id, n_tokens, mean_token_len
FROM quality
WHERE n_tokens >= 40 AND doc_id NOT IN (SELECT doc_id FROM losers)
"""


def q_text_quality(spark, sf_dir):
    """Quality features: token/punct/stopword ratios."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.quality_features(d).select(
        "doc_id", "n_tokens", "n_punct", "punct_ratio", "stopword_ratio", "mean_token_len"
    )


SQL_TEXT_QUALITY = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
       len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
       round(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) /
             greatest(length(text), 1), 6) AS punct_ratio,
       round(len(regexp_extract_all(lower(text), '\\b(the|of|and|to|a)\\b')) /
             greatest(CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END, 1), 6) AS stopword_ratio,
       round(length(text) / greatest(CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END, 1), 6) AS mean_token_len
FROM documents
"""


def q_lang_scores(spark, sf_dir):
    """Language-ID heuristic: stopword-marker hit counts + argmax guess."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.lang_scores(d).select(
        "doc_id", "score_de", "score_en", "score_es", "score_fr", "lang_guess"
    )


SQL_LANG_SCORES = """
WITH s AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\\b(der|die|das|und|ist)\\b')) AS score_de,
         len(regexp_extract_all(text, '\\b(the|of|and|to|a)\\b')) AS score_en,
         len(regexp_extract_all(text, '\\b(el|la|los|y|es)\\b')) AS score_es,
         len(regexp_extract_all(text, '\\b(le|la|les|et|est)\\b')) AS score_fr
  FROM documents
)
SELECT doc_id, score_de, score_en, score_es, score_fr,
       CASE WHEN greatest(score_de, score_en, score_es, score_fr) = 0 THEN NULL
            WHEN score_de = greatest(score_de, score_en, score_es, score_fr) THEN 'de'
            WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
            WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
            ELSE 'fr' END AS lang_guess
FROM s
"""


def q_token_counts(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex pre-tokens."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.token_counts(d).select("doc_id", "ws_tokens", "bpe_tokens")


SQL_TOKEN_COUNTS = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens
FROM documents
"""


def q_doc_fingerprint(spark, sf_dir):
    """Normalized md5 fingerprint per document."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.fingerprint(d).select("doc_id", "fingerprint")


SQL_DOC_FINGERPRINT = """
SELECT doc_id, md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
FROM documents
"""


def q_embedding_cosine_topk(spark, sf_dir):
    """ANN baseline: brute-force cosine top-10 vs vec_id=0's embedding,
    similarity rounded to 4 digits for cross-engine rank stability."""
    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.cosine_topk(e, list(qv), "vec_id", "embedding", k=10, round_digits=4)


SQL_EMBEDDING_COSINE_TOPK = """
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[],
             (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS cosine_sim
FROM embeddings
ORDER BY cosine_sim DESC, vec_id LIMIT 10
"""


def q_ann_topk_per_label(spark, sf_dir):
    """IVF-style coarse-partitioned top-k per label cell."""
    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    out = similarity.pairwise_topk_per_label(e, list(qv), "label", "vec_id", "embedding", k=3)
    return out.select("label", "vec_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))


SQL_ANN_TOPK_PER_LABEL = """
SELECT label, vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[],
             (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS cosine_sim,
       CAST(row_number() OVER (PARTITION BY label
            ORDER BY round(list_cosine_similarity(embedding::DOUBLE[],
              (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) DESC, vec_id) AS INT) AS rank
FROM embeddings
QUALIFY rank <= 3
"""


def q_ann_lsh_bucket_topk(spark, sf_dir):
    """Hyperplane-LSH bucketed ANN (the 100 TB scale path): probe ONLY
    the query's sign-pattern bucket — at scale the bucket column is a
    partition key and the probe is a partition-pruned scan — then exact
    cosine top-5 within it. The md5-derived literal coefficient matrix
    is reproduced by the oracle from the same formula."""
    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.lsh_bucketed_topk(
        e, list(qv), "vec_id", "embedding", k=5, planes=8
    )


def _sql_ann_lsh(dim: int = 64, planes: int = 8, k: int = 5) -> str:
    coeffs = similarity.hyperplane_coeffs(dim, planes)

    def arr(row):
        return "[" + ", ".join(repr(c) for c in row) + "]"

    bucket = " + ".join(
        f"(CASE WHEN round(list_dot_product(embedding::DOUBLE[], {arr(coeffs[p])}), 9) > 0"
        f" THEN {2 ** p} ELSE 0 END)"
        for p in range(planes)
    )
    return f"""
WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
q AS (SELECT bucket AS qb, embedding AS qe FROM b WHERE vec_id = 0)
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[], (SELECT qe FROM q)::DOUBLE[]), 6) AS cosine_sim
FROM b WHERE bucket = (SELECT qb FROM q)
ORDER BY cosine_sim DESC, vec_id LIMIT {k}
"""


SQL_ANN_LSH_BUCKET_TOPK = _sql_ann_lsh(64, 8, 5)


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs: hyperplane-bucketed candidates
    (never all-pairs) + exact cosine verify. The synthetic embeddings
    have no true near-dups (max in-bucket cosine ~0.41), so the
    threshold is set low enough (0.35) that the banded join + verify
    path produces checkable rows."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.embedding_near_duplicates(
        e, "vec_id", "embedding", threshold=0.35, planes=8, dim=64
    )


def _sql_embedding_near_dups(dim: int = 64, planes: int = 8, threshold: float = 0.35) -> str:
    coeffs = similarity.hyperplane_coeffs(dim, planes)

    def arr(row):
        return "[" + ", ".join(repr(c) for c in row) + "]"

    bucket = " + ".join(
        f"(CASE WHEN round(list_dot_product(embedding::DOUBLE[], {arr(coeffs[p])}), 9) > 0"
        f" THEN {2 ** p} ELSE 0 END)"
        for p in range(planes)
    )
    return f"""
WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine_sim
FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= {threshold}
"""


SQL_EMBEDDING_NEAR_DUPS = _sql_embedding_near_dups(64, 8, 0.35)


def q_embedding_near_dups_multiprobe(spark, sf_dir):
    """Multi-probe near-dups (round 3): each vector additionally
    registers under the bucket reached by flipping its lowest-|margin|
    hyperplane bit, so borderline pairs split by one plane still meet;
    pairs dedupe before the exact cosine verify. Same plan family as
    embedding_near_dups (bucket-join, never all-pairs), explode factor
    2 per side."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.embedding_near_duplicates(
        e, "vec_id", "embedding", threshold=0.35, planes=8, dim=64, multi_probe=1
    )


def _sql_embedding_near_dups_multiprobe(
    dim: int = 64, planes: int = 8, threshold: float = 0.35
) -> str:
    coeffs = similarity.hyperplane_coeffs(dim, planes)

    def arr(row):
        return "[" + ", ".join(repr(c) for c in row) + "]"

    def proj(p):
        return f"round(list_dot_product(embedding::DOUBLE[], {arr(coeffs[p])}), 9)"

    bucket = " + ".join(
        f"(CASE WHEN {proj(p)} > 0 THEN {2 ** p} ELSE 0 END)" for p in range(planes)
    )
    margins = ", ".join(
        f"struct_pack(m := abs({proj(p)}), p := {p})" for p in range(planes)
    )
    return f"""
WITH b AS (
  SELECT vec_id, embedding,
         CAST({bucket} AS BIGINT) AS bucket,
         list_sort([{margins}]) AS margins
  FROM embeddings
), probes AS (
  SELECT vec_id, embedding, bucket AS pb FROM b
  UNION ALL
  SELECT vec_id, embedding,
         xor(bucket, CAST(2 ** margins[1].p AS BIGINT)) AS pb FROM b
)
SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine_sim
FROM probes a JOIN probes b ON a.pb = b.pb AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= {threshold}
"""


SQL_EMBEDDING_NEAR_DUPS_MULTIPROBE = _sql_embedding_near_dups_multiprobe(64, 8, 0.35)


def q_regex_extract_families(spark, sf_dir):
    """B9: regex family extraction (the month-pattern analog) — numeric
    group pulled out of a formatted code, distinct + counted."""
    p = _t(spark, sf_dir, "part")
    num = F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int")
    return (
        p.select(num.alias("brand_num"))
        .groupBy("brand_num")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


SQL_REGEX_EXTRACT_FAMILIES = """
SELECT CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT) AS brand_num,
       count(*) AS n_parts
FROM part GROUP BY 1
"""


def q_group_size_max(spark, sf_dir):
    """C7: max/min of per-key group sizes (export pad-length analog)."""
    o = _t(spark, sf_dir, "orders")
    sizes = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    return sizes.agg(
        F.max("n").alias("max_group"), F.min("n").alias("min_group"),
        F.count(F.lit(1)).alias("n_groups"),
    )


SQL_GROUP_SIZE_MAX = """
SELECT max(n) AS max_group, min(n) AS min_group, count(*) AS n_groups
FROM (SELECT count(*) AS n FROM orders GROUP BY o_custkey)
"""


def q_depth_layer_counts(spark, sf_dir):
    """G3: per-depth node counts of the concept tree (the BFS
    level-by-level persist order, now just an aggregate)."""
    nodes = pathops.distinct_concept_nodes(_paths_df(spark, sf_dir), "concept_path")
    return nodes.groupBy(F.col("depth").cast("int").alias("depth")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )


SQL_DEPTH_LAYER_COUNTS = """
WITH paths AS (
  SELECT DISTINCT [r_name, n_name, c_mktsegment] AS segs
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
),
nodes AS (
  SELECT DISTINCT '\\' || array_to_string(segs[1:i], '\\') || '\\' AS prefix, CAST(i AS INT) AS depth
  FROM paths, (SELECT unnest(generate_series(1, 3)) AS i)
)
SELECT depth, count(*) AS n_nodes FROM nodes GROUP BY depth
"""


def q_parent_backfill(spark, sf_dir):
    """D12: parent-path backfill — each non-root node joined to its
    parent by path slice (natural-key version of the reference's
    parent_id UPDATE ... FROM join)."""
    from picsure_dictionary_etl_spark.functions.columns import parent_path

    nodes = pathops.distinct_concept_nodes(_paths_df(spark, sf_dir), "concept_path")
    withp = nodes.select("prefix", parent_path(F.col("prefix")).alias("parent_path"))
    parents = nodes.select(F.col("prefix").alias("parent_path"), F.lit(True).alias("parent_exists"))
    return (
        withp.filter(F.col("parent_path").isNotNull())
        .join(parents, "parent_path", "left")
        .select("prefix", "parent_path", F.coalesce("parent_exists", F.lit(False)).alias("parent_exists"))
    )


SQL_PARENT_BACKFILL = """
WITH paths AS (
  SELECT DISTINCT [r_name, n_name, c_mktsegment] AS segs
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
),
nodes AS (
  SELECT DISTINCT '\\' || array_to_string(segs[1:i], '\\') || '\\' AS prefix,
         CASE WHEN i > 1 THEN '\\' || array_to_string(segs[1:i-1], '\\') || '\\' END AS parent_path
  FROM paths, (SELECT unnest(generate_series(1, 3)) AS i)
)
SELECT n.prefix, n.parent_path,
       EXISTS (SELECT 1 FROM nodes p WHERE p.prefix = n.parent_path) AS parent_exists
FROM nodes n WHERE n.parent_path IS NOT NULL
"""


def q_index_aligned_pivot(spark, sf_dir):
    """F3: index-aligned columnar pivot (Facet_Concept_Lists layout) —
    one column per event type, event ids listed down, rows aligned.
    Keys passed explicitly (sorted, like the reference —
    DictionaryCSVService.java:455): no distinct-keys pre-job, pinned
    column order."""
    ev = _t(spark, sf_dir, "events").select("event_type", "event_id")
    return pivots.index_aligned_pivot(
        ev, "event_type", "event_id",
        keys=["click", "error", "purchase", "signup", "view"])


SQL_INDEX_ALIGNED_PIVOT = """
WITH r AS (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS _rn
  FROM events
)
SELECT _rn,
       max(CASE WHEN event_type = 'click' THEN event_id END) AS click,
       max(CASE WHEN event_type = 'error' THEN event_id END) AS error,
       max(CASE WHEN event_type = 'purchase' THEN event_id END) AS purchase,
       max(CASE WHEN event_type = 'signup' THEN event_id END) AS signup,
       max(CASE WHEN event_type = 'view' THEN event_id END) AS view
FROM r GROUP BY _rn
"""


def q_canonical_json_hash(spark, sf_dir):
    """D9/I-json: sha256 over a canonical field-ordered JSON rendering
    (the reference's facet change-detection hash)."""
    n = _t(spark, sf_dir, "nation")
    h = F.sha2(
        F.to_json(F.struct(F.col("n_name"), F.col("n_regionkey"))), 256
    )
    return n.select("n_nationkey", h.alias("canon_hash"))


SQL_CANONICAL_JSON_HASH = """
SELECT n_nationkey,
       sha256(to_json(struct_pack(n_name := n_name, n_regionkey := n_regionkey))) AS canon_hash
FROM nation
"""


def q_minhash_lsh_candidates(spark, sf_dir):
    """MinHash+LSH banded candidate pairs. The ``portable=True`` hash
    stream (one md5 per shingle -> Carter-Wegman seed family mod 2^31-1,
    band hash = md5 of the band's mins) has an exact DuckDB twin — full
    oracle parity while keeping the banded (band_idx, band_hash) shuffle
    shape. The default xxhash64 path stays the production fast path."""
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_candidates(
        d, "doc_id", "text", n=3, num_hashes=32, bands=8, portable=True
    )


def _sql_minhash_lsh(num_hashes: int = 32, bands: int = 8) -> str:
    r = num_hashes // bands
    p = 2_147_483_647
    sig_cols = ",\n         ".join(
        f"min((a*{k + 1} + b) % {p}) AS h{k}" for k in range(num_hashes)
    )
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5(concat_ws('|', {parts}, '{b}')) AS band_hash FROM sig".format(
            b=b, parts=", ".join(f"h{i}" for i in range(b * r, (b + 1) * r))
        )
        for b in range(bands)
    )
    return f"""
WITH words AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM words, (SELECT unnest(generate_series(1, 10000)) AS i) s
  WHERE i <= len(w) - 2
),
hashes AS (
  SELECT doc_id,
         ('0x' || substring(md5(shingle), 1, 15))::BIGINT % {p} AS a,
         ('0x' || substring(md5(shingle), 17, 15))::BIGINT % {p} AS b
  FROM grams
),
sig AS (
  SELECT doc_id, {sig_cols}
  FROM hashes GROUP BY doc_id
),
banded AS (
  {band_selects}
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM banded a JOIN banded b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
"""


SQL_MINHASH_LSH_CANDIDATES = _sql_minhash_lsh(32, 8)


def q_simhash_duplicates(spark, sf_dir):
    """SimHash signature groups. ``portable=True`` derives word bits from
    two 32-bit md5 hex slices (LSB-first) and renders the signature as a
    16-char hex string — bit-identical in DuckDB, full oracle parity."""
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash_duplicates(d, "doc_id", "text", portable=True)


def _simhash_sql_fragments() -> tuple[str, str, str]:
    """Shared DuckDB fragments mirroring dedup.simhash_halves' packed
    encoding: (packs CTE aggregates, hi expr, lo expr). Bit j of
    md5(word) lives in x1/x2 (two 32-bit hex slices); 4 bit-counts pack
    per 16-bit lane of p0..p15; bit j of the signature is set iff
    2*count > n_words (tie -> 0, same as the ±1 sum's sign)."""

    def b(j: int) -> str:
        return f"((x{1 if j < 32 else 2} >> {j % 32}) & 1)"

    pack_cols = ",\n         ".join(
        "sum(" + " + ".join(f"{b(4 * g + lane)} * {2 ** (16 * lane)}" for lane in range(4)) + f") AS p{g}"
        for g in range(16)
    )

    def set_bit(j: int) -> str:
        return f"2*((p{j // 4} >> {16 * (j % 4)}) & 65535) > n"

    hi = " + ".join(f"CASE WHEN {set_bit(j)} THEN {2 ** (j - 32)} ELSE 0 END" for j in range(32, 64))
    lo = " + ".join(f"CASE WHEN {set_bit(j)} THEN {2 ** j} ELSE 0 END" for j in range(32))
    return pack_cols, hi, lo


_SIMHASH_SQL_PREFIX = """
WITH words AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w FROM documents
),
ints AS (
  SELECT doc_id,
         ('0x' || substring(md5(w), 1, 8))::BIGINT AS x1,
         ('0x' || substring(md5(w), 9, 8))::BIGINT AS x2
  FROM words
),
packs AS (
  SELECT doc_id, {pack_cols},
         count(*) AS n
  FROM ints GROUP BY doc_id
)"""


def _sql_simhash_duplicates() -> str:
    pack_cols, hi, lo = _simhash_sql_fragments()
    return _SIMHASH_SQL_PREFIX.format(pack_cols=pack_cols) + f""",
sig AS (
  SELECT doc_id, printf('%08x', {hi}) || printf('%08x', {lo}) AS simhash FROM packs
)
SELECT simhash, min(doc_id) AS keeper_id, count(*) AS n_docs
FROM sig GROUP BY simhash HAVING count(*) > 1
"""


SQL_SIMHASH_DUPLICATES = _sql_simhash_duplicates()


def q_simhash_near_dups(spark, sf_dir):
    """SimHash Hamming-banded near-dup pairs: 4x16-bit pigeonhole blocks
    generate candidates only within (block_idx, block_value) buckets
    (never all-pairs), verified by two bit_count XORs; distance <= 3."""
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash_near_duplicates(d, "doc_id", "text", max_hamming=3, portable=True)


def _sql_simhash_near_dups(max_hamming: int = 3) -> str:
    pack_cols, hi, lo = _simhash_sql_fragments()
    ham = "bit_count(xor(a.s_hi, b.s_hi)) + bit_count(xor(a.s_lo, b.s_lo))"
    return _SIMHASH_SQL_PREFIX.format(pack_cols=pack_cols) + f""",
sig AS (SELECT doc_id, {hi} AS s_hi, {lo} AS s_lo FROM packs),
banded AS (
  SELECT doc_id, s_hi, s_lo, 0 AS block_idx, (s_lo >> 0) & 65535 AS block_val FROM sig
  UNION ALL SELECT doc_id, s_hi, s_lo, 1, (s_lo >> 16) & 65535 FROM sig
  UNION ALL SELECT doc_id, s_hi, s_lo, 2, (s_hi >> 0) & 65535 FROM sig
  UNION ALL SELECT doc_id, s_hi, s_lo, 3, (s_hi >> 16) & 65535 FROM sig
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST({ham} AS INT) AS hamming
FROM banded a JOIN banded b
  ON a.block_idx = b.block_idx AND a.block_val = b.block_val AND a.doc_id < b.doc_id
WHERE {ham} <= {max_hamming}
"""


SQL_SIMHASH_NEAR_DUPS = _sql_simhash_near_dups(3)


def q_multimodal_features(spark, sf_dir):
    """Binary media plumbing: mapInPandas Arrow-batched feature extraction
    over opaque binary payloads. The deterministic fake decode
    (byte-stats -> dim-16 float32 vector) is SQL-reproducible, so the
    query projects driver-hashable scalars: n_bytes plus three rounded
    feature dims (the raw array<float> column crashes the driver's
    pandas canonicalizer — unhashable list)."""
    d = _t(spark, sf_dir, "documents")
    media = multimodal.documents_as_media(d)
    feats = multimodal.extract_features(media, dim=16)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.round(F.col("feature")[0].cast("double"), 4).alias("f0"),
        F.round(F.col("feature")[7].cast("double"), 4).alias("f7"),
        F.round(F.col("feature")[15].cast("double"), 4).alias("f15"),
    )


SQL_MULTIMODAL_FEATURES = """
WITH m AS (
  SELECT doc_id AS media_id, 'image' AS kind,
         CAST(strlen(text) AS INT) AS n_bytes,
         -- first UTF-8 BYTE (hex slice of the encoded blob), not the
         -- first character's codepoint: byte-exact with the Spark
         -- side's payload[0] for non-ASCII-leading documents
         CASE WHEN strlen(text) = 0 THEN 0
              ELSE ('0x' || substring(hex(encode(text)), 1, 2))::INT END AS first_byte
  FROM documents
)
SELECT media_id, kind, n_bytes,
       round(((n_bytes * 31 + first_byte * 17 + 0) % 1000) / 500.0 - 1.0, 4) AS f0,
       round(((n_bytes * 31 + first_byte * 17 + 7) % 1000) / 500.0 - 1.0, 4) AS f7,
       round(((n_bytes * 31 + first_byte * 17 + 15) % 1000) / 500.0 - 1.0, 4) AS f15
FROM m
"""


_SQL_MEDIA_DIMS = """
  SELECT doc_id AS media_id,
         ('0x' || substring(md5(doc_id::VARCHAR || '|w'), 1, 15))::BIGINT % 1920 AS width,
         ('0x' || substring(md5(doc_id::VARCHAR || '|h'), 1, 15))::BIGINT % 1080 AS height,
         ('0x' || substring(md5(doc_id::VARCHAR || '|d'), 1, 15))::BIGINT % 60000 AS duration_ms
  FROM documents
"""


def q_multimodal_resize(spark, sf_dir):
    """mapInPandas image-resize plumbing: aspect-preserving downscale to
    max side 256 (pixel work stubbed; dimension arithmetic is the real
    vectorized-numpy contract, oracle-checked)."""
    d = _t(spark, sf_dir, "documents")
    media = multimodal.documents_as_media(d)
    return multimodal.resize_images(media, max_side=256).select(
        "media_id", "kind", "out_width", "out_height"
    )


SQL_MULTIMODAL_RESIZE = f"""
WITH m AS ({_SQL_MEDIA_DIMS})
SELECT media_id, 'image' AS kind,
       CAST(floor(width * least(1.0, 256.0 / greatest(greatest(width, height), 1))) AS INT) AS out_width,
       CAST(floor(height * least(1.0, 256.0 / greatest(greatest(width, height), 1))) AS INT) AS out_height
FROM m
"""


def q_multimodal_frame_sample(spark, sf_dir):
    """Video frame-sampling grid at 1 fps: 1 -> N row expansion via a
    codegen'd sequence+posexplode over the clip duration."""
    d = _t(spark, sf_dir, "documents")
    media = multimodal.documents_as_media(d, kind="video")
    return multimodal.sample_frames(media, fps=1.0)


SQL_MULTIMODAL_FRAME_SAMPLE = f"""
WITH m AS ({_SQL_MEDIA_DIMS})
SELECT media_id, CAST(i AS INT) AS frame_idx, CAST(i * 1000 AS INT) AS frame_ts_ms
FROM m, LATERAL unnest(generate_series(
  0, greatest(CAST(ceil(duration_ms / 1000.0) AS INT) - 1, 0))) AS t(i)
"""


def q_multimodal_real_decode(spark, sf_dir):
    """REAL image decode certification over THREE formats: P6 PPM
    (pure-numpy parse), baseline sequential JPEG (from-scratch codec:
    huffman entropy decode, dequant, zigzag, IDCT, YCbCr->RGB in
    operators/jpeg_codec.py) and PNG (stdlib zlib inflate + all five
    scanline unfilters in operators/png_codec.py). Every pattern is a
    pure integer function of media_id — the JPEGs use constant 8x8
    blocks + all-ones quant tables, which survive the lossy pipeline
    BIT-exactly (ids ≡3 mod 4 are REAL 4:2:0 subsampled payloads with
    constant non-neutral chroma, exercising the MCU-interleaved decode
    + chroma upsample + color convert); PPM/PNG are lossless outright.
    The 16 PNG ids rotate through five format variants (id % 5):
    plain 8-bit RGB, Adam7-interlaced, 16-bit (samples gradient*257,
    high-byte reduction exact), palette (color type 3) and grey+alpha
    — so one query certifies every decode path in png_codec.py. Eight
    more JPEG payloads (media_id 100..107) are **12-bit SOF1
    grayscale** (level shift 2048, 16-bit DQT, extended DC huffman
    table, uint16 decode) — constant blocks valued mod 4096, still
    integer-exact. Eight more (media_id 200..207) are **LOSSLESS
    (SOF3)** payloads — per-pixel 16-bit grayscale / 8-bit RGB
    patterns through all seven Annex-H predictors and a restart
    interval; lossless, so arbitrary patterns certify exactly. Projected as per-channel integer pixel SUMS, so the
    DuckDB twin recomputing the patterns must match exactly. This is
    pixels actually decoded from real image bytes, not the
    byte-statistics stub (sf-independent by design: fixed id sets)."""
    ppm = multimodal.synthetic_ppm_media(spark, 16, width=32, height=24)
    jpg = multimodal.synthetic_jpeg_media(spark, 16, width=32, height=24)
    j12 = multimodal.synthetic_jpeg12_media(spark, 8, width=32, height=24)
    jls = multimodal.synthetic_jpeg_lossless_media(spark, 8, width=32,
                                                   height=24)
    png = multimodal.synthetic_png_media(spark, 16, width=32, height=24)
    return multimodal.image_channel_sums(
        ppm.unionByName(jpg).unionByName(j12).unionByName(jls)
        .unionByName(png)
    )


# JPEG rows: gray value per 8x8 block is (id*11 + bx*7 + by*13) % 256;
# each block contributes 64x its value to every channel (grayscale ->
# r=g=b, and the odd-id YCbCr payloads use neutral chroma so RGB == Y).
SQL_MULTIMODAL_REAL_DECODE = """
WITH ids AS (SELECT unnest(generate_series(0, 15)) AS media_id),
grid AS (
  SELECT xs.x AS x, ys.y AS y
  FROM (SELECT unnest(generate_series(0, 31)) AS x) xs,
       (SELECT unnest(generate_series(0, 23)) AS y) ys
),
blocks AS (
  SELECT bxs.bx AS bx, bys.by AS by
  FROM (SELECT unnest(generate_series(0, 3)) AS bx) bxs,
       (SELECT unnest(generate_series(0, 2)) AS by) bys
)
SELECT media_id, 'ppm' AS fmt,
       CAST(sum((x * 8 + media_id) % 256) AS BIGINT)      AS r_sum,
       CAST(sum((y * 8 + media_id * 3) % 256) AS BIGINT)  AS g_sum,
       CAST(sum((x + y + media_id * 7) % 256) AS BIGINT)  AS b_sum
FROM ids, grid
GROUP BY media_id
UNION ALL
SELECT media_id, 'jpeg' AS fmt,
       CAST(sum(64 * ((media_id * 11 + bx * 7 + by * 13) % 256)) AS BIGINT) AS r_sum,
       CAST(sum(64 * ((media_id * 11 + bx * 7 + by * 13) % 256)) AS BIGINT) AS g_sum,
       CAST(sum(64 * ((media_id * 11 + bx * 7 + by * 13) % 256)) AS BIGINT) AS b_sum
FROM ids, blocks
WHERE media_id % 4 != 3
GROUP BY media_id
UNION ALL
-- ids ≡3 (mod 4): 4:2:0 payloads, constant per-image chroma
-- cb=(id*17+40)%256, cr=(id*29+60)%256 — each 8x8 block decodes to one
-- constant RGB via the T.871 inverse (round-half-even like numpy does
-- not differ from round() here: the irrational coefficients never land
-- exactly on .5 for integer inputs)
SELECT media_id, 'jpeg' AS fmt,
       CAST(sum(64 * LEAST(255, GREATEST(0, round(
           ((media_id * 11 + bx * 7 + by * 13) % 256)
           + 1.402 * (((media_id * 29 + 60) % 256) - 128))))) AS BIGINT) AS r_sum,
       CAST(sum(64 * LEAST(255, GREATEST(0, round(
           ((media_id * 11 + bx * 7 + by * 13) % 256)
           - 0.344136 * (((media_id * 17 + 40) % 256) - 128)
           - 0.714136 * (((media_id * 29 + 60) % 256) - 128))))) AS BIGINT) AS g_sum,
       CAST(sum(64 * LEAST(255, GREATEST(0, round(
           ((media_id * 11 + bx * 7 + by * 13) % 256)
           + 1.772 * (((media_id * 17 + 40) % 256) - 128))))) AS BIGINT) AS b_sum
FROM ids, blocks
WHERE media_id % 4 = 3
GROUP BY media_id
UNION ALL
-- media_id 100..107: 12-bit SOF1 grayscale, block value
-- (id*97 + bx*31 + by*57) % 4096, uint16 decode -> r=g=b
SELECT media_id, 'jpeg' AS fmt,
       CAST(sum(64 * ((media_id * 97 + bx * 31 + by * 57) % 4096)) AS BIGINT) AS r_sum,
       CAST(sum(64 * ((media_id * 97 + bx * 31 + by * 57) % 4096)) AS BIGINT) AS g_sum,
       CAST(sum(64 * ((media_id * 97 + bx * 31 + by * 57) % 4096)) AS BIGINT) AS b_sum
FROM (SELECT unnest(generate_series(100, 107)) AS media_id) ids12, blocks
GROUP BY media_id
UNION ALL
-- media_id 200..207: LOSSLESS (SOF3) JPEG — any pattern certifies
-- exactly. Even ids: 16-bit grayscale (x*131 + y*61 + id*257) %% 65536
-- replicated to r=g=b; odd ids: 8-bit RGB gradients. Predictor
-- rotates by id (exactness is predictor-independent: lossless).
SELECT media_id, 'jpeg' AS fmt,
       CAST(sum((x * 131 + y * 61 + media_id * 257) % 65536) AS BIGINT) AS r_sum,
       CAST(sum((x * 131 + y * 61 + media_id * 257) % 65536) AS BIGINT) AS g_sum,
       CAST(sum((x * 131 + y * 61 + media_id * 257) % 65536) AS BIGINT) AS b_sum
FROM (SELECT unnest(generate_series(200, 207)) AS media_id) idsl, grid
WHERE media_id % 2 = 0
GROUP BY media_id
UNION ALL
SELECT media_id, 'jpeg' AS fmt,
       CAST(sum((x * 3 + media_id) % 256) AS BIGINT)          AS r_sum,
       CAST(sum((y * 5 + media_id * 7) % 256) AS BIGINT)      AS g_sum,
       CAST(sum((x + y + media_id * 11) % 256) AS BIGINT)     AS b_sum
FROM (SELECT unnest(generate_series(200, 207)) AS media_id) idsl, grid
WHERE media_id % 2 = 1
GROUP BY media_id
UNION ALL
-- PNG ids % 5 in (0,1,2): the same RGB gradient emitted as plain
-- 8-bit, Adam7-interlaced and 16-bit (*257) payloads — interlacing
-- only reorders scanlines and the 16-bit high-byte reduction inverts
-- *257 exactly, so all three variants share one sum formula
SELECT media_id, 'png' AS fmt,
       CAST(sum((x * 5 + media_id) % 256) AS BIGINT)              AS r_sum,
       CAST(sum((y * 7 + media_id * 5) % 256) AS BIGINT)          AS g_sum,
       CAST(sum((x * 2 + y * 3 + media_id * 11) % 256) AS BIGINT) AS b_sum
FROM ids, grid
WHERE media_id % 5 IN (0, 1, 2)
GROUP BY media_id
UNION ALL
-- ids % 5 = 3: palette images — index (x + y*32 + id) % 256 into
-- pal[i] = ((i*5)%256, (i*7)%256, (i*11)%256)
SELECT media_id, 'png' AS fmt,
       CAST(sum(((x + y * 32 + media_id) % 256) * 5 % 256) AS BIGINT)  AS r_sum,
       CAST(sum(((x + y * 32 + media_id) % 256) * 7 % 256) AS BIGINT)  AS g_sum,
       CAST(sum(((x + y * 32 + media_id) % 256) * 11 % 256) AS BIGINT) AS b_sum
FROM ids, grid
WHERE media_id % 5 = 3
GROUP BY media_id
UNION ALL
-- ids % 5 = 4: grey+alpha — grey replicated to RGB, alpha dropped
SELECT media_id, 'png' AS fmt,
       CAST(sum((x * 3 + y * 5 + media_id) % 256) AS BIGINT) AS r_sum,
       CAST(sum((x * 3 + y * 5 + media_id) % 256) AS BIGINT) AS g_sum,
       CAST(sum((x * 3 + y * 5 + media_id) % 256) AS BIGINT) AS b_sum
FROM ids, grid
WHERE media_id % 5 = 4
GROUP BY media_id
"""


def q_multimodal_real_decode_audio(spark, sf_dir):
    """REAL audio decode certification: deterministic 16-bit PCM WAV
    payloads whose samples are a pure integer function of
    (media_id, i) are decoded with the stdlib ``wave`` reader and
    projected as integer sample statistics — the audio twin of the
    image channel-sum certification (sf-independent: fixed 16 clips)."""
    wav = multimodal.synthetic_int_wav_media(spark, 16, n_samples=2048)
    return multimodal.wav_sample_sums(wav)


SQL_MULTIMODAL_REAL_DECODE_AUDIO = """
WITH ids AS (SELECT unnest(generate_series(0, 15)) AS media_id),
samp AS (SELECT unnest(generate_series(0, 2047)) AS i)
SELECT media_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum((i * (media_id + 3) + media_id * 17) % 65536 - 32768) AS BIGINT) AS sample_sum,
       CAST(min((i * (media_id + 3) + media_id * 17) % 65536 - 32768) AS BIGINT) AS sample_min,
       CAST(max((i * (media_id + 3) + media_id * 17) % 65536 - 32768) AS BIGINT) AS sample_max
FROM ids, samp
GROUP BY media_id
"""


def q_multimodal_real_decode_video(spark, sf_dir):
    """REAL MP4 (ISO BMFF) demux + decode certification: deterministic
    container payloads written by the from-scratch pure-stdlib writer
    (operators/mp4_codec.py) — one 'raw ' RGB24 video track and one
    'sowt' PCM audio track per id, with the physical layout rotating by
    id (samples_per_chunk 1-4, stco vs co64, mdat-first vs moov-first,
    and FRAGMENTED moof/tfdt/trun files — trex/tfhd defaults and
    per-sample trun arrays — on ids with id%5>=3) so one query
    exercises every sample-table parser path. The demuxer expands
    stts/stsc/stsz/stco (and the fragment runs) with vectorized numpy,
    decodes both tracks, and projects integer statistics (per-channel
    pixel sums
    over all frames, raw 16-bit PCM stats, mdhd duration, and the
    stts→dts frame-index sum at 2 fps) that the DuckDB twin recomputes
    exactly from media_id alone. sf-independent by design (fixed 16
    containers). Reference parity: the reference ships opaque blobs
    with no media decode (reference README.md) — this is part of the
    training-data-pipeline surface the brief adds."""
    mp4 = multimodal.synthetic_mp4_media(spark, 16)
    return multimodal.mp4_track_sums(mp4, sample_fps=2.0)


# 16x12x6 RGB frames: r=(x*3+f*7+id)%256, g=(y*5+f*11+id*3)%256,
# b=(x+y+f*13+id*7)%256; audio x[i]=(i*(id+5)+id*13)%65536-32768.
# video_ms: 6 frames @5fps, timescale 600 -> 720*1000//600 = 1200.
# fidx at 2fps: ticks k=0..2 (ceil(1.2s*2)=3), index floor(k*5/2)
# clipped to 5 -> 0+2+5 = 7 (DuckDB // is integer division).
SQL_MULTIMODAL_REAL_DECODE_VIDEO = """
WITH ids AS (SELECT unnest(generate_series(0, 15)) AS media_id),
grid AS (
  SELECT xs.x AS x, ys.y AS y, fs.f AS f
  FROM (SELECT unnest(generate_series(0, 15)) AS x) xs,
       (SELECT unnest(generate_series(0, 11)) AS y) ys,
       (SELECT unnest(generate_series(0, 5)) AS f) fs
),
samp AS (SELECT unnest(generate_series(0, 511)) AS i),
vid AS (
  SELECT media_id,
         CAST(sum((x * 3 + f * 7 + media_id) % 256) AS BIGINT)          AS r_sum,
         CAST(sum((y * 5 + f * 11 + media_id * 3) % 256) AS BIGINT)     AS g_sum,
         CAST(sum((x + y + f * 13 + media_id * 7) % 256) AS BIGINT)     AS b_sum
  FROM ids, grid GROUP BY media_id
),
aud AS (
  SELECT media_id,
         CAST(count(*) AS BIGINT) AS n_audio,
         CAST(sum((i * (media_id + 5) + media_id * 13) % 65536 - 32768) AS BIGINT) AS audio_sum,
         CAST(min((i * (media_id + 5) + media_id * 13) % 65536 - 32768) AS BIGINT) AS audio_min,
         CAST(max((i * (media_id + 5) + media_id * 13) % 65536 - 32768) AS BIGINT) AS audio_max
  FROM ids, samp GROUP BY media_id
)
SELECT v.media_id,
       CAST(6 AS BIGINT) AS n_frames,
       CAST(16 AS BIGINT) AS width,
       CAST(12 AS BIGINT) AS height,
       CAST(1200 AS BIGINT) AS video_ms,
       v.r_sum, v.g_sum, v.b_sum,
       a.n_audio, a.audio_sum, a.audio_min, a.audio_max,
       -- frame sampling follows PRESENTATION order: ids ≡ 2 (mod 7)
       -- store frames in adjacent-swap decode order (ctts/trun cts +
       -- net-zero elst), so the sampled STORED index is slot XOR 1
       (SELECT CAST(sum(CASE WHEN v.media_id % 7 = 2
                             THEN slot + 1 - 2 * (slot % 2)   -- slot XOR 1
                             ELSE slot END) AS BIGINT)
        FROM (SELECT LEAST(5, (k * 5) // 2) AS slot
              FROM (SELECT unnest(generate_series(0, 2)) AS k))) AS fidx_sum
FROM vid v JOIN aud a USING (media_id)
"""


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC final-state apply on sf0.001."""
    return q_cdc_apply_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Order matters: the driver's correctness gate checks a 50-entry
    # prefix of this dict (61 entries total). Rotation policy (r6,
    # same rule as r5): the queries whose last driver row is OLDEST
    # lead the prefix — the six trivials whose evidence is from r4
    # (token_counts, sorted_export, group_size_max, depth_layer_counts,
    # canonical_json_hash, doc_fingerprint) re-enter slots 0-5 — the
    # new multimodal_real_decode_video (MP4), cdf_fold_materialize,
    # lake_time_travel, cdf_batch_span and lake_sink_append (no
    # evidence yet) join the prefix, and the tail
    # (indices 50-60) holds eleven simple queries freshly certified in
    # r5 (window_latest_k, minhash_lsh_candidates, distinct_sorted,
    # count_per_key, eav_pivot, eav_unpivot, first_wins_pick,
    # study_filter, windowed_event_counts, key_filtered_join,
    # regex_extract_families), so every entry's driver
    # evidence stays <=2 rounds old and the bounded prefix never ships
    # an unverified operator.
    return {
        "token_counts": q_token_counts,
        "sorted_export": q_sorted_export,
        "group_size_max": q_group_size_max,
        "depth_layer_counts": q_depth_layer_counts,
        "canonical_json_hash": q_canonical_json_hash,
        "doc_fingerprint": q_doc_fingerprint,
        "simhash_duplicates": q_simhash_duplicates,
        "multimodal_real_decode": q_multimodal_real_decode,
        "multimodal_real_decode_audio": q_multimodal_real_decode_audio,
        "multimodal_real_decode_video": q_multimodal_real_decode_video,
        "simhash_near_dups": q_simhash_near_dups,
        "multimodal_features": q_multimodal_features,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_frame_sample": q_multimodal_frame_sample,
        "cdc_lww_latest": q_cdc_lww_latest,
        "cdc_apply_final_state": q_cdc_apply_final_state,
        "conversation_reassembly": q_conversation_reassembly,
        "cdc_dead_letter": q_cdc_dead_letter,
        "cdc_watermark_slice": q_cdc_watermark_slice,
        "partial_update_coalesce": q_partial_update_coalesce,
        "partial_update_mixed": q_partial_update_mixed,
        "partial_update_blank_preserve": q_partial_update_blank_preserve,
        "cdc_change_feed": q_cdc_change_feed,
        "cdf_fold_materialize": q_cdf_fold_materialize,
        "lake_time_travel": q_lake_time_travel,
        "cdf_batch_span": q_cdf_batch_span,
        "lake_sink_append": q_lake_sink_append,
        "embedding_near_dups_multiprobe": q_embedding_near_dups_multiprobe,
        "flatten_categorical": q_flatten_categorical,
        "flatten_continuous": q_flatten_continuous,
        "path_prefix_explode": q_path_prefix_explode,
        "leaf_paths": q_leaf_paths,
        "facet_expression_filter": q_facet_expression_filter,
        "anti_join_new": q_anti_join_new,
        "update_only_matched": q_update_only_matched,
        "hierarchical_rollup": q_hierarchical_rollup,
        "change_detection_hash": q_change_detection_hash,
        "multiway_join_revenue": q_multiway_join_revenue,
        "parent_backfill": q_parent_backfill,
        "index_aligned_pivot": q_index_aligned_pivot,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
        "dedup_containment_pairs": q_dedup_containment_pairs,
        "corpus_curation": q_corpus_curation,
        "text_quality": q_text_quality,
        "lang_scores": q_lang_scores,
        "embedding_cosine_topk": q_embedding_cosine_topk,
        "ann_topk_per_label": q_ann_topk_per_label,
        "ann_lsh_bucket_topk": q_ann_lsh_bucket_topk,
        "embedding_near_dups": q_embedding_near_dups,
        # --- tail (beyond the driver's 50-slot prefix): simple queries
        # --- with a fresh (<=1 round old) driver-green row, still
        # --- oracled every run by tests/test_entry_oracle.py.
        # --- minhash_lsh_candidates moved here when the new
        # --- multimodal_real_decode_video entered the prefix (r6);
        # --- its r5 row stays within the 2-round evidence budget.
        "window_latest_k": q_window_latest_k,
        "minhash_lsh_candidates": q_minhash_lsh_candidates,
        "distinct_sorted": q_distinct_sorted,
        "count_per_key": q_count_per_key,
        "eav_pivot": q_eav_pivot,
        "eav_unpivot": q_eav_unpivot,
        "first_wins_pick": q_first_wins_pick,
        "study_filter": q_study_filter,
        "windowed_event_counts": q_windowed_event_counts,
        "key_filtered_join": q_key_filtered_join,
        "regex_extract_families": q_regex_extract_families,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "multimodal_real_decode": SQL_MULTIMODAL_REAL_DECODE,
        "multimodal_real_decode_audio": SQL_MULTIMODAL_REAL_DECODE_AUDIO,
        "multimodal_real_decode_video": SQL_MULTIMODAL_REAL_DECODE_VIDEO,
        "cdc_lww_latest": SQL_CDC_LWW_LATEST,
        "cdc_apply_final_state": SQL_CDC_APPLY_FINAL_STATE,
        "conversation_reassembly": SQL_CONVERSATION_REASSEMBLY,
        "cdc_dead_letter": SQL_CDC_DEAD_LETTER,
        "cdc_watermark_slice": SQL_CDC_WATERMARK_SLICE,
        "partial_update_coalesce": SQL_PARTIAL_UPDATE_COALESCE,
        "partial_update_mixed": SQL_PARTIAL_UPDATE_MIXED,
        "partial_update_blank_preserve": SQL_PARTIAL_UPDATE_BLANK_PRESERVE,
        "cdc_change_feed": SQL_CDC_CHANGE_FEED,
        "cdf_fold_materialize": SQL_CDF_FOLD_MATERIALIZE,
        "lake_time_travel": SQL_LAKE_TIME_TRAVEL,
        "cdf_batch_span": SQL_CDF_BATCH_SPAN,
        "lake_sink_append": SQL_LAKE_SINK_APPEND,
        "embedding_near_dups_multiprobe": SQL_EMBEDDING_NEAR_DUPS_MULTIPROBE,
        "flatten_categorical": SQL_FLATTEN_CATEGORICAL,
        "flatten_continuous": SQL_FLATTEN_CONTINUOUS,
        "first_wins_pick": SQL_FIRST_WINS_PICK,
        "study_filter": SQL_STUDY_FILTER,
        "path_prefix_explode": SQL_PATH_PREFIX_EXPLODE,
        "leaf_paths": SQL_LEAF_PATHS,
        "facet_expression_filter": SQL_FACET_EXPRESSION_FILTER,
        "eav_unpivot": SQL_EAV_UNPIVOT,
        "eav_pivot": SQL_EAV_PIVOT,
        "anti_join_new": SQL_ANTI_JOIN_NEW,
        "update_only_matched": SQL_UPDATE_ONLY_MATCHED,
        "hierarchical_rollup": SQL_HIERARCHICAL_ROLLUP,
        "change_detection_hash": SQL_CHANGE_DETECTION_HASH,
        "multiway_join_revenue": SQL_MULTIWAY_JOIN_REVENUE,
        "key_filtered_join": SQL_KEY_FILTERED_JOIN,
        "window_latest_k": SQL_WINDOW_LATEST_K,
        "windowed_event_counts": SQL_WINDOWED_EVENT_COUNTS,
        "sorted_export": SQL_SORTED_EXPORT,
        "distinct_sorted": SQL_DISTINCT_SORTED,
        "count_per_key": SQL_COUNT_PER_KEY,
        "regex_extract_families": SQL_REGEX_EXTRACT_FAMILIES,
        "group_size_max": SQL_GROUP_SIZE_MAX,
        "depth_layer_counts": SQL_DEPTH_LAYER_COUNTS,
        "parent_backfill": SQL_PARENT_BACKFILL,
        "index_aligned_pivot": SQL_INDEX_ALIGNED_PIVOT,
        "canonical_json_hash": SQL_CANONICAL_JSON_HASH,
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_jaccard_pairs": SQL_DEDUP_JACCARD_PAIRS,
        "dedup_containment_pairs": SQL_DEDUP_CONTAINMENT_PAIRS,
        "corpus_curation": SQL_CORPUS_CURATION,
        "text_quality": SQL_TEXT_QUALITY,
        "lang_scores": SQL_LANG_SCORES,
        "token_counts": SQL_TOKEN_COUNTS,
        "doc_fingerprint": SQL_DOC_FINGERPRINT,
        "embedding_cosine_topk": SQL_EMBEDDING_COSINE_TOPK,
        "ann_topk_per_label": SQL_ANN_TOPK_PER_LABEL,
        "ann_lsh_bucket_topk": SQL_ANN_LSH_BUCKET_TOPK,
        "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
        "minhash_lsh_candidates": SQL_MINHASH_LSH_CANDIDATES,
        "simhash_duplicates": SQL_SIMHASH_DUPLICATES,
        "simhash_near_dups": SQL_SIMHASH_NEAR_DUPS,
        "multimodal_features": SQL_MULTIMODAL_FEATURES,
        "multimodal_resize": SQL_MULTIMODAL_RESIZE,
        "multimodal_frame_sample": SQL_MULTIMODAL_FRAME_SAMPLE,
    }
