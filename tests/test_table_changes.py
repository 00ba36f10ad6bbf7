"""Change data feed between snapshots (the Iceberg/Delta CDF analog):
inserted / updated / deleted keys classified from two resolved
snapshots, chainable by downstream incremental consumers."""

import datetime

from picsure_dictionary_etl_spark.cdc.envelope import (
    TRANSCRIPT_KEY,
    change_event_schema,
    transcript_table_schema,
)
from picsure_dictionary_etl_spark.lake.merge import merge_into, table_changes
from picsure_dictionary_etl_spark.lake.table import LakeTable

TS = datetime.datetime(2025, 1, 1)


def test_table_changes_classification(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        schema=transcript_table_schema(),
        key_cols=TRANSCRIPT_KEY,
        bucket_by=["conv_id"],
        bucket_count=4,
    )

    def ev(rows):
        return spark.createDataFrame(rows, change_event_schema())

    merge_into(
        t,
        ev(
            [
                (1, "I", "a", 0, "user", "hello", None, TS),
                (2, "I", "a", 1, "assistant", "hi", None, TS),
                (3, "I", "b", 0, "user", "yo", None, TS),
            ]
        ),
        "b1",
    )
    v1 = t.current().version
    merge_into(
        t,
        ev(
            [
                (4, "U", "a", 0, "user", "hello-edited", None, TS),  # update
                (5, "D", "a", 1, None, None, None, None),            # delete
                (6, "I", "c", 0, "user", "new", None, TS),           # insert
                (7, "U", "b", 0, "user", "yo", None, TS),            # no-op value
            ]
        ),
        "b2",
    )
    v2 = t.current().version

    got = {
        (r["_change"], r["conv_id"], r["turn_idx"]): r["text"]
        for r in table_changes(t, v1, v2).collect()
    }
    # (b,0) rewrote the same values at a higher LSN -> NOT a change
    assert got == {
        ("U", "a", 0): "hello-edited",
        ("D", "a", 1): None,
        ("I", "c", 0): "new",
    }

    # self-diff is empty; full-history diff is all inserts
    assert table_changes(t, v2, v2).count() == 0
    first = table_changes(t, 0, v2)
    assert {r["_change"] for r in first.collect()} == {"I"}
    assert first.count() == 3


def test_delete_rows_carry_preimage_lsn_and_fold_rule(spark, tmp_path):
    """The documented D-row contract: a delete change carries the
    DELETED row's last live _lsn (the preimage), not the tombstone's
    own LSN — so "update at L, then delete" across two spans emits a U
    and a D both stamped L, and a consumer folding the feed by max-LSN
    per key must break equal-LSN ties in favor of D (always correct
    under the watermark guard; see table_changes docstring and
    BENCH/stream_soak.py's end-to-end reconstruction)."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        schema=transcript_table_schema(),
        key_cols=TRANSCRIPT_KEY,
        bucket_by=["conv_id"],
        bucket_count=2,
    )

    def ev(rows):
        return spark.createDataFrame(rows, change_event_schema())

    merge_into(t, ev([(1, "I", "a", 0, "user", "v1", None, TS)]), "b1")
    merge_into(t, ev([(7, "U", "a", 0, "user", "v2", None, TS)]), "b2")
    v2 = t.current().version
    merge_into(t, ev([(9, "D", "a", 0, None, None, None, None)]), "b3")
    v3 = t.current().version

    # span (v2, v3): the D row is stamped with the preimage LSN 7 —
    # the last LIVE version's LSN — not the tombstone's 9
    (d_row,) = table_changes(t, v2, v3).collect()
    assert d_row["_change"] == "D" and d_row["_lsn"] == 7

    # span-wise fold across (0,v2) + (v2,v3): U@7 and D@7 tie on _lsn;
    # D-wins reproduces the (empty) final state, naive max-LSN may not
    feed = table_changes(t, 0, v2).unionByName(table_changes(t, v2, v3))
    rows = sorted(feed.collect(), key=lambda r: (r["_lsn"], r["_change"] == "D"))
    assert [(r["_change"], r["_lsn"]) for r in rows] == [("I", 7), ("D", 7)]
    live = {}
    for r in rows:  # ordered so the equal-LSN D applies last
        if r["_change"] == "D":
            live.pop((r["conv_id"], r["turn_idx"]), None)
        else:
            live[(r["conv_id"], r["turn_idx"])] = r["text"]
    assert live == {}


def test_materialize_feed_inverts_table_changes(spark, tmp_path):
    """materialize_feed (the library fold) applied to the union of
    span-wise feeds reproduces the table's resolved live state exactly
    — including the equal-LSN U/D preimage tie and a re-insert after
    delete."""
    from picsure_dictionary_etl_spark.lake.merge import materialize_feed

    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        schema=transcript_table_schema(),
        key_cols=TRANSCRIPT_KEY,
        bucket_by=["conv_id"],
        bucket_count=2,
    )

    def ev(rows):
        return spark.createDataFrame(rows, change_event_schema())

    versions = [0]
    for batch_id, rows in [
        ("b1", [(1, "I", "a", 0, "user", "v1", None, TS),
                (2, "I", "b", 0, "user", "w1", None, TS),
                (3, "I", "c", 0, "user", "x1", None, TS)]),
        ("b2", [(7, "U", "a", 0, "user", "v2", None, TS),
                (8, "D", "c", 0, None, None, None, None)]),
        ("b3", [(9, "D", "a", 0, None, None, None, None),
                (10, "I", "c", 0, "user", "x2", None, TS)]),
    ]:
        merge_into(t, ev(rows), batch_id)
        versions.append(t.current().version)

    feed = None
    for sv, ev_ in zip(versions, versions[1:]):
        span = table_changes(t, sv, ev_)
        feed = span if feed is None else feed.unionByName(span)

    payload = ["role", "text", "tool", "ts"]
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in materialize_feed(feed, list(TRANSCRIPT_KEY), payload).collect()
    }
    # a: updated@7 then deleted (D stamped 7 — the tie) -> gone;
    # b: untouched since insert; c: deleted then re-inserted@10
    assert got == {("b", 0): "w1", ("c", 0): "x2"}


def test_table_changes_property_hypothesis(spark, tmp_path):
    """Property: for ANY two-chunk event sequence, table_changes(v1, v2)
    equals the diff of the sequential pandas oracle states."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    event = st.tuples(
        st.integers(0, 2),
        st.integers(0, 2),
        st.sampled_from(["I", "U", "D"]),
        st.text(alphabet="ab", max_size=3),
    )

    counter = {"n": 0}

    @given(st.lists(event, min_size=1, max_size=16), st.integers(0, 16))
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(seq, cut):
        cut = min(cut, len(seq))
        counter["n"] += 1
        root = str(tmp_path / f"t{counter['n']}")
        t = LakeTable.create(
            spark, root, schema=transcript_table_schema(),
            key_cols=TRANSCRIPT_KEY, bucket_by=["conv_id"], bucket_count=2,
        )

        def ev(rows, off):
            return spark.createDataFrame(
                [
                    (off + i, op, f"c{conv}", turn, "user", text, None, None)
                    for i, (conv, turn, op, text) in enumerate(rows)
                ],
                change_event_schema(),
            )

        merge_into(t, ev(seq[:cut], 0), "b1")
        v1 = t.current().version
        merge_into(t, ev(seq[cut:], cut), "b2")
        v2 = t.current().version

        def oracle(upto):
            state = {}
            for conv, turn, op, text in seq[:upto]:
                k = (f"c{conv}", turn)
                if op == "D":
                    state.pop(k, None)
                else:
                    state[k] = text
            return state

        s1, s2 = oracle(cut), oracle(len(seq))
        want = {}
        for k in s2.keys() - s1.keys():
            want[k] = ("I", s2[k])
        for k in s1.keys() - s2.keys():
            want[k] = ("D", None)
        for k in s1.keys() & s2.keys():
            if s1[k] != s2[k]:
                want[k] = ("U", s2[k])

        got = {
            (r["conv_id"], r["turn_idx"]): (r["_change"], r["text"])
            for r in table_changes(t, v1, v2).collect()
        }
        assert got == want

    check()


def test_cdf_across_schema_evolution(spark, tmp_path):
    """table_changes straddling an additive evolution: the from-version
    lacks the new column; its live rows read it as null and the CDF
    classifies the fill-in as an Update."""
    from picsure_dictionary_etl_spark.cdc.envelope import (
        TRANSCRIPT_KEY,
        change_event_schema,
        transcript_table_schema,
    )
    from picsure_dictionary_etl_spark.lake.merge import merge_into, table_changes
    from picsure_dictionary_etl_spark.lake.table import LakeTable
    from pyspark.sql import types as T

    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema=transcript_table_schema(),
        key_cols=TRANSCRIPT_KEY, bucket_by=["conv_id"], bucket_count=2,
    )
    merge_into(t, spark.createDataFrame(
        [(1, "I", "c1", 0, "user", "hello", None, None)], change_event_schema()),
        "b1")
    v1 = t.current().version
    t.evolve_schema([T.StructField("model", T.StringType(), True)])
    ev2 = spark.createDataFrame(
        [(2, "U", "c1", 0, "user", "hello", None, None, "m-1")],
        T.StructType([
            T.StructField("_lsn", T.LongType()),
            T.StructField("_op", T.StringType()),
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("model", T.StringType()),
        ]),
    )
    ev2 = ev2.select("conv_id", "turn_idx", "role", "text", "tool", "ts",
                     "model", "_op", "_lsn")
    merge_into(t, ev2, "b2")
    v2 = t.current().version
    changes = {(r["conv_id"], r["turn_idx"]): (r["_change"], r["model"])
               for r in table_changes(t, v1, v2).collect()}
    assert changes == {("c1", 0): ("U", "m-1")}


def test_state_diff_patch_property(spark):
    """Property: applying state_diff(old, new) to old AS A PATCH
    (I/U upsert, D delete) reproduces new exactly — the contract an
    incremental downstream consumer relies on."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from picsure_dictionary_etl_spark.cdc.envelope import change_event_schema
    from picsure_dictionary_etl_spark.lake.merge import (
        OP_COL,
        lww_winners,
        state_diff,
    )
    from pyspark.sql import functions as F

    event = st.tuples(
        st.integers(0, 2), st.integers(0, 2),
        st.sampled_from(["I", "U", "D"]),
        st.text(alphabet="ab", max_size=3),
    )

    def live(rows):
        df = spark.createDataFrame(rows, change_event_schema())
        return lww_winners(
            df, ["conv_id", "turn_idx"], ["role", "text", "tool", "ts"]
        ).filter(F.col(OP_COL) != "D")

    @given(st.lists(event, min_size=1, max_size=10),
           st.lists(event, min_size=0, max_size=10))
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check(seq1, seq2):
        rows1 = [(i, op, f"c{c}", t, "user", txt, None, None)
                 for i, (c, t, op, txt) in enumerate(seq1)]
        rows2 = rows1 + [
            (len(rows1) + i, op, f"c{c}", t, "user", txt, None, None)
            for i, (c, t, op, txt) in enumerate(seq2)
        ]
        old_df, new_df = live(rows1), live(rows2)
        keys, payload = ["conv_id", "turn_idx"], ["role", "text", "tool", "ts"]
        diff = state_diff(old_df, new_df, keys, payload).collect()
        old = {(r["conv_id"], r["turn_idx"]): r["text"] for r in old_df.collect()}
        new = {(r["conv_id"], r["turn_idx"]): r["text"] for r in new_df.collect()}
        patched = dict(old)
        for r in diff:
            k = (r["conv_id"], r["turn_idx"])
            if r["_change"] == "D":
                patched.pop(k)  # KeyError = bogus delete
            else:
                patched[k] = r["text"]
        assert patched == new

    check()


def test_state_diff_hash_not_injectable(spark):
    """Separator/sentinel collisions ('a\\x01b','c') -> ('a','b\\x01c')
    must classify as an Update, not vanish."""
    from picsure_dictionary_etl_spark.lake.merge import state_diff

    old = spark.createDataFrame(
        [("k", 0, "a\x01b", "c", 1)],
        ["conv_id", "turn_idx", "x", "y", "_lsn"])
    new = spark.createDataFrame(
        [("k", 0, "a", "b\x01c", 2)],
        ["conv_id", "turn_idx", "x", "y", "_lsn"])
    d = state_diff(old, new, ["conv_id", "turn_idx"], ["x", "y"]).collect()
    assert len(d) == 1 and d[0]["_change"] == "U"
    # null vs sentinel-looking value is also a change
    old2 = spark.createDataFrame([("k", 0, None, "c", 1)],
                                 old.schema)
    new2 = spark.createDataFrame([("k", 0, "\x00", "c", 2)],
                                 old.schema)
    d2 = state_diff(old2, new2, ["conv_id", "turn_idx"], ["x", "y"]).collect()
    assert len(d2) == 1 and d2[0]["_change"] == "U"


def test_state_diff_nested_columns_element_wise(spark):
    """Array/struct payloads digest ELEMENT-wise, not via
    cast('string'): array('a, b') and array('a','b') both render
    '[a, b]' — the string-cast scheme would classify that real update
    as unchanged. Also: [] vs NULL array is a change, [1,null] vs [1]
    is a change, a struct field nulling out is a change, a NULL struct
    vs a struct of nulls is a change — and byte-identical nested rows
    are NOT re-emitted."""
    from pyspark.sql import types as T

    from picsure_dictionary_etl_spark.lake.merge import state_diff

    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("a", T.ArrayType(T.StringType())),
        T.StructField("la", T.ArrayType(T.LongType())),
        T.StructField("st", T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("v", T.LongType())])),
        T.StructField("_lsn", T.LongType()),
    ])
    old = spark.createDataFrame([
        ("amb", ["a, b"], [1], {"k": "x", "v": 1}, 1),
        ("empty", [], [1, None], None, 1),
        ("same", ["q"], [7, 8], {"k": None, "v": 2}, 1),
    ], schema)
    new = spark.createDataFrame([
        ("amb", ["a", "b"], [1], {"k": "x", "v": 1}, 2),
        ("empty", None, [1], {"k": None, "v": None}, 2),
        ("same", ["q"], [7, 8], {"k": None, "v": 2}, 2),
    ], schema)
    d = {r["id"]: r["_change"]
         for r in state_diff(old, new, ["id"], ["a", "la", "st"]).collect()}
    assert d == {"amb": "U", "empty": "U"}  # 'same' must NOT appear


def test_change_feed_consumer_exactly_once_downstream(spark, tmp_path):
    """Checkpointed tail of the committed snapshots: each poll returns
    the O(change) diff since the last ack; a crash between poll and ack
    re-delivers the identical diff; applying diffs as patches converges
    the downstream mirror to the table's live state."""
    from picsure_dictionary_etl_spark.lake.consume import ChangeFeedConsumer

    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema=transcript_table_schema(),
        key_cols=TRANSCRIPT_KEY, bucket_by=["conv_id"], bucket_count=4,
    )

    def ev(rows):
        return spark.createDataFrame(rows, change_event_schema())

    mirror: dict = {}

    def apply(df, from_v, to_v):
        for r in df.collect():
            k = (r["conv_id"], r["turn_idx"])
            if r["_change"] == "D":
                mirror.pop(k, None)
            else:
                mirror[k] = r["text"]

    c = ChangeFeedConsumer(t, str(tmp_path / "ckpt" / "mirror"))
    assert c.poll() is None  # fresh table, nothing to consume

    merge_into(t, ev([(1, "I", "a", 0, "user", "hello", None, TS),
                      (2, "I", "b", 0, "user", "yo", None, TS)]), "b1")
    merge_into(t, ev([(3, "U", "a", 0, "user", "edited", None, TS),
                      (4, "D", "b", 0, None, None, None, None),
                      (5, "I", "c", 0, "user", "new", None, TS)]), "b2")
    assert c.consume(apply) == 1  # both commits drained in ONE diff
    assert mirror == {("a", 0): "edited", ("c", 0): "new"}

    # crash between poll and ack: redelivery is byte-identical and
    # patch-idempotent
    merge_into(t, ev([(6, "U", "c", 0, "user", "new2", None, TS)]), "b3")
    b1 = c.poll()
    rows1 = sorted(map(tuple, b1.df.collect()))
    # "crash": no ack — a fresh consumer on the same checkpoint re-polls
    c2 = ChangeFeedConsumer(t, str(tmp_path / "ckpt" / "mirror"))
    b2 = c2.poll()
    assert (b2.from_version, b2.to_version) == (b1.from_version, b1.to_version)
    assert sorted(map(tuple, b2.df.collect())) == rows1
    apply(b2.df, b2.from_version, b2.to_version)
    apply(b2.df, b2.from_version, b2.to_version)  # double-apply: idempotent
    b2.ack()
    assert mirror == {("a", 0): "edited", ("c", 0): "new2"}
    assert c2.poll() is None  # caught up

    # mirror equals the table's resolved live state
    from picsure_dictionary_etl_spark.lake.merge import _payload_cols, resolve_live

    snap = t.current()
    live = resolve_live(t.read(), TRANSCRIPT_KEY, _payload_cols(snap))
    want = {(r["conv_id"], r["turn_idx"]): r["text"] for r in live.collect()}
    assert mirror == want


def test_change_feed_consumer_property_hypothesis(spark, tmp_path):
    """Property: for ANY event sequence split into ANY number of
    commits, a consumer that randomly interleaves polls, crashes
    (poll without ack) and fresh-handle restarts converges its mirror
    to the sequential pandas oracle state."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from picsure_dictionary_etl_spark.lake.consume import ChangeFeedConsumer

    event = st.tuples(
        st.integers(0, 2), st.integers(0, 2),
        st.sampled_from(["I", "U", "D"]),
        st.text(alphabet="ab", max_size=3),
    )
    counter = {"n": 0}

    @given(
        st.lists(event, min_size=1, max_size=14),
        st.lists(st.integers(0, 14), max_size=3),   # commit cut points
        st.lists(st.booleans(), min_size=1, max_size=6),  # ack? per poll
    )
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check(seq, cuts, acks):
        counter["n"] += 1
        root = str(tmp_path / f"c{counter['n']}")
        t = LakeTable.create(
            spark, root, schema=transcript_table_schema(),
            key_cols=TRANSCRIPT_KEY, bucket_by=["conv_id"], bucket_count=2,
        )
        bounds = sorted({min(c, len(seq)) for c in cuts} | {len(seq)})
        lo = 0
        for bi, hi in enumerate(bounds):
            if hi <= lo:
                continue
            rows = [(lo + i, op, f"c{conv}", turn, "user", text, None, None)
                    for i, (conv, turn, op, text) in enumerate(seq[lo:hi])]
            merge_into(t, spark.createDataFrame(rows, change_event_schema()),
                       f"b{bi}")
            lo = hi

        mirror: dict = {}

        def apply(df, f, to):
            for r in df.collect():
                k = (r["conv_id"], r["turn_idx"])
                if r["_change"] == "D":
                    mirror.pop(k, None)
                else:
                    mirror[k] = r["text"]

        ckpt = str(tmp_path / f"c{counter['n']}_ckpt")
        for ack in acks:
            c = ChangeFeedConsumer(t, ckpt)  # fresh handle = restart
            b = c.poll()
            if b is None:
                break
            apply(b.df, b.from_version, b.to_version)
            if ack:
                b.ack()
            # no ack = crash before checkpoint: redelivery re-applies
            # the same diff; patches are idempotent so mirror is safe
        ChangeFeedConsumer(t, ckpt).consume(apply)  # drain

        oracle: dict = {}
        for conv, turn, op, text in seq:
            k = (f"c{conv}", turn)
            if op == "D":
                oracle.pop(k, None)
            else:
                oracle[k] = text
        assert mirror == oracle

    check()


def test_consumer_retention_bootstrap_and_error(spark, tmp_path):
    """Vacuumed-away manifests: a NEVER-acked consumer bootstraps (full
    live state as inserts); a lagging consumer gets a typed
    ChangeFeedRetentionError, never a raw FileNotFoundError."""
    import pytest

    from picsure_dictionary_etl_spark.lake.consume import (
        ChangeFeedConsumer,
        ChangeFeedRetentionError,
    )

    t = LakeTable.create(
        spark, str(tmp_path / "ret"), schema=transcript_table_schema(),
        key_cols=TRANSCRIPT_KEY, bucket_by=["conv_id"], bucket_count=2,
    )

    def ev(rows):
        return spark.createDataFrame(rows, change_event_schema())

    lagging = ChangeFeedConsumer(t, str(tmp_path / "lag_ckpt"))
    for i in range(4):
        merge_into(t, ev([(i + 1, "I", f"c{i}", 0, "user", f"t{i}", None,
                           TS)]), f"b{i}")
        if i == 0:
            b = lagging.poll()
            b.ack()  # lagging consumer acked v1, then fell behind
    t.vacuum(keep_snapshots=2)  # snap-0..2 manifests gone

    # fresh consumer: snapshot(0) is vacuumed -> bootstrap as inserts
    fresh = ChangeFeedConsumer(t, str(tmp_path / "fresh_ckpt"))
    batch = fresh.poll()
    got = {(r["conv_id"], r["turn_idx"]): (r["_change"], r["text"])
           for r in batch.df.collect()}
    assert got == {(f"c{i}", 0): ("I", f"t{i}") for i in range(4)}
    batch.ack()
    assert fresh.poll() is None  # bootstrapped and caught up

    # lagging consumer (acked v1, also vacuumed): typed retention error
    with pytest.raises(ChangeFeedRetentionError, match="re-bootstrap"):
        lagging.poll()

    # non-zero start_version whose manifest was vacuumed: the caller
    # asked to SKIP history, so silently bootstrapping the full state
    # would replay exactly what they skipped — typed error instead
    # (advisor finding r4)
    skipper = ChangeFeedConsumer(t, str(tmp_path / "skip_ckpt"),
                                 start_version=1)
    with pytest.raises(ChangeFeedRetentionError, match="re-bootstrap"):
        skipper.poll()

    # non-zero start_version still inside retention: plain diff, no
    # bootstrap — only the vacuumed case is an error
    recent = ChangeFeedConsumer(t, str(tmp_path / "recent_ckpt"),
                                start_version=3)
    b3 = recent.poll()
    assert (b3.from_version, b3.to_version) == (3, 4)
    assert {r["_change"] for r in b3.df.collect()} == {"I"}
