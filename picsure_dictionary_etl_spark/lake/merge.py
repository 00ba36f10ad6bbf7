"""MERGE INTO for LakeTable — the CDC core.

Semantics (the Iceberg statement this implements, and what the engine
would run verbatim on a cluster with Iceberg extensions)::

    MERGE INTO target t
    USING (SELECT <LWW winners per key>) s
    ON  t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
    WHEN MATCHED AND s.op = 'D' AND s.lsn > t.lsn THEN DELETE
    WHEN MATCHED AND s.lsn > t.lsn               THEN UPDATE SET *
    WHEN NOT MATCHED AND s.op <> 'D'             THEN INSERT *

Reference parity: natural-key array-batch upsert D1
(``concept/ConceptService.java:180-211``), LWW-vs-first-wins dedup D2
(``loading/ColumnMetaTreeBuilder.java:52-77`` — the engine standardizes
on last-writer-wins by max LSN), delete path H4
(``concept/ConceptController.java:119-143``).

Two physical strategies (Iceberg's copy-on-write vs merge-on-read):

* **cow** — read the touched buckets, re-reduce union(target, winners),
  rewrite those buckets. Best read performance; write cost is
  proportional to touched-bucket size. Right for low-frequency batch
  loads.
* **mor** (default for the streaming runner) — append the LWW-reduced
  winner rows (including 'D' tombstones) as per-bucket *delta files*;
  reads resolve LWW across base+delta files; buckets whose file count
  exceeds ``compact_threshold`` are compacted (LWW rewrite, tombstones
  dropped) inside the same commit. Write cost is proportional to the
  *batch*, not the table — the sustained-throughput design for a
  10^10-event replay. Compaction is amortized O(table/threshold).

Common stages (all JVM-side codegen; zero Python on the hot path):

1. **Batch LWW reduce** — ``groupBy(keys).agg(max_by(struct(payload), lsn))``
   (sort-based aggregate: struct buffers aren't hash-mutable, but still
   no window/row_number full-sort-and-rank). Two shuffle shapes, picked
   by ``combine_first``: single-shuffle bucket-first (default), or
   map-side-combine-first when skew salting engages — the partial
   aggregate then collapses hot-key storms *before* the shuffle.
2. **Bucket pruning** — winners' distinct ``xxhash64(bucket_by) % n``
   decides which buckets are touched; everything else carries over.
3. **Atomic commit** with watermark/batch-id properties (exactly-once).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

from picsure_dictionary_etl_spark.lake.table import (
    BUCKET_COL,
    LakeTable,
    Snapshot,
    bucket_expr,
)

OP_COL = "_op"
LSN_COL = "_lsn"
OP_INSERT, OP_UPDATE, OP_DELETE = "I", "U", "D"


@dataclass
class MergeResult:
    snapshot: Snapshot
    metrics: dict[str, Any]


DEL_LSN_COL = "_del_lsn"
PU_COL = "_pu"  # marks a row as a partial-update (field-wise) delta
SYSTEM_COLS = {LSN_COL, OP_COL, DEL_LSN_COL, PU_COL}


def _payload_cols(snap: Snapshot) -> list[str]:
    """Table columns that aren't key or system columns."""
    system = {*SYSTEM_COLS, *snap.key_cols}
    return [f.name for f in snap.schema.fields if f.name not in system]


def _system_extras(snap: Snapshot) -> list[str]:
    """System columns beyond (_op, _lsn) present in this table's schema —
    non-empty only for tables that received field-wise MOR deltas."""
    names = {f.name for f in snap.schema.fields}
    return [c for c in (DEL_LSN_COL, PU_COL) if c in names]


def lww_winners(
    source: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key last-writer-wins reduce by max LSN.

    ``max_by`` over a struct = one aggregate (SortAggregate — struct
    buffers are sort-based, still no window rank) generalizing the
    reference's first-wins ``putIfAbsent``
    (``ColumnMetaTreeBuilder.java:52-77``). When the caller does NOT
    pre-partition the input, Catalyst plans the partial aggregate on
    the map side — the hot-key-storm absorber ``merge_into`` engages
    via ``combine_first``. Output: carry + keys + payload + _op + _lsn.

    ``carry_cols`` are key-functional columns (e.g. the bucket id)
    added to the groupBy so an existing partitioning on them satisfies
    the aggregate's distribution — Catalyst then skips the exchange.

    Ties on ``_lsn`` (a source stamping one LSN per multi-statement
    transaction) break deterministically by a payload hash
    (:func:`_lsn_order`), so replay/resume reproduces the identical
    winner regardless of shuffle encounter order. Equal-LSN events must
    arrive in the SAME batch — the watermark guard treats an LSN at or
    below the committed watermark as already applied (the source must
    not split a transaction across batch boundaries, the standard CDC
    batching contract).
    """
    carry = carry_cols or []
    winner = F.max_by(
        F.struct(*payload_cols, OP_COL), _lsn_order(payload_cols)
    ).alias("_w")
    out = source.groupBy(*carry, *key_cols).agg(winner, F.max(LSN_COL).alias(LSN_COL))
    return out.select(*carry, *key_cols,
                      *[F.col(f"_w.{c}").alias(c) for c in payload_cols],
                      F.col(f"_w.{OP_COL}").alias(OP_COL), LSN_COL)


def _lsn_order(payload_cols: list[str]) -> F.Column:
    """Deterministic LWW ordering key: (lsn, payload hash). The hash
    term only matters on equal-LSN ties, where it picks the same winner
    on every run/replay — content-determined, never encounter-order."""
    return F.struct(
        F.col(LSN_COL).alias("l"),
        F.xxhash64(*payload_cols, OP_COL).alias("t"),
    )


def resolve_live(
    df: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    policy: str = "row",
    schema=None,
) -> DataFrame:
    """Merge-on-read resolution: LWW across base+delta rows, tombstones
    dropped. Idempotent on already-resolved (cow/compacted) data.

    Dispatch: if the rows carry the ``_pu`` marker column the table has
    (or had) field-wise deltas, and resolution runs the MIXED field-wise
    reduce — full rows (``_pu`` null/false: compacted bases, row-policy
    deltas) specify *every* field at their LSN, nulls included, while
    partial rows contribute only the fields they specified.

    Specification at READ time is always null-based (coalesce): the
    blank-vs-null rule is a BATCH-REDUCE-time policy — a
    ``blank_preserve`` batch nulls its blanks before they're ever
    stored, so a blank string found in a stored partial delta was
    SPECIFIED by a coalesce batch and must stay specified even if the
    table's latest batch policy is blank_preserve (otherwise an older
    value resurrects over the committed blank). ``policy`` stays in the
    signature for callers that thread table properties through; it no
    longer alters the read-time rule."""
    if PU_COL in df.columns:
        out = lww_winners_fieldwise(
            df, key_cols, payload_cols,
            policy="coalesce",
            schema=schema, full_row_col=PU_COL,
        )
        return out.filter(F.col(OP_COL) != OP_DELETE).drop(DEL_LSN_COL)
    return lww_winners(df, key_cols, payload_cols).filter(F.col(OP_COL) != OP_DELETE)


def _specified(c: F.Column, dtype, policy: str) -> F.Column:
    """Is this source field 'provided'? ``coalesce`` (D7): non-null.
    ``blank_preserve`` (D6): non-null and non-blank for strings — the
    reference's ``defaultIfBlank``/``isNotBlank`` update guards
    (``facet/FacetLoaderService.java:168-174,285-286``). Blank means
    ALL-whitespace (Java ``isBlank``), not just spaces — ``F.trim``
    strips only ' ', so tab/newline-only strings need the regex."""
    from pyspark.sql import types as T

    if policy == "blank_preserve" and isinstance(dtype, T.StringType):
        return c.isNotNull() & (F.regexp_replace(c, r"\s", "") != "")
    return c.isNotNull()


def lww_winners_fieldwise(
    source: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    carry_cols: list[str] | None = None,
    policy: str = "coalesce",
    schema=None,
    full_row_col: str | None = None,
) -> DataFrame:
    """Per-key FIELD-WISE last-specified-writer-wins reduce — the partial
    -update (D6/D7) generalization of :func:`lww_winners`.

    Each payload column independently takes its value from the latest
    event that *specified* it (see :func:`_specified`), but only if that
    event came after the key's latest delete — a tombstone resets every
    field, so pre-delete values can't leak into a reinserted row.
    Unspecified-everywhere fields come out null (preserved against the
    target by the COW resolve, which unions the full target rows in).

    Still ONE map-side-combinable groupBy: per column a
    ``max_by(struct(lsn, value), specified ? lsn : null)`` aggregate
    (Spark's max_by ignores null orderings), plus the delete-boundary
    max. Output carries ``_del_lsn`` so a second reduce over
    union(target, winners) keeps respecting the boundary.

    ``full_row_col`` names a boolean column marking rows as partial
    (true) vs FULL (null/false — compacted bases, row-policy deltas,
    COW targets). Full rows specify *every* field at their LSN — nulls
    included — so a committed null can never be resurrected by an older
    version's non-null value, and mixed row-policy/field-wise histories
    resolve correctly in ONE aggregate (the MOR field-wise read path
    and the COW re-reduce both use this).

    Reference parity: selective-field upsert D7
    (``consent/ConsentController.java:170-189`` — ``Optional.ifPresent``
    setters) and blank-preserving upsert D6
    (``facet/FacetLoaderService.java:168-174``).
    """
    carry = carry_cols or []
    has_del_in = DEL_LSN_COL in source.columns
    is_full = (
        ~F.coalesce(F.col(full_row_col), F.lit(False)) if full_row_col else None
    )
    lsn_ord = _lsn_order(payload_cols)  # deterministic equal-LSN tie-break
    aggs = []
    for c in payload_cols:
        dtype = schema[c].dataType if schema is not None else None
        spec = _specified(F.col(c), dtype, policy)
        order = F.when(spec, lsn_ord)
        if is_full is not None:
            order = F.when(is_full, lsn_ord).otherwise(order)
        aggs.append(
            F.max_by(
                F.struct(F.col(LSN_COL).alias("l"), F.col(c).alias("v")),
                order,
            ).alias(f"_w_{c}")
        )
    del_in = (
        F.greatest(
            F.when(F.col(OP_COL) == OP_DELETE, F.col(LSN_COL)), F.col(DEL_LSN_COL)
        )
        if has_del_in
        else F.when(F.col(OP_COL) == OP_DELETE, F.col(LSN_COL))
    )
    aggs.append(F.max(del_in).alias(DEL_LSN_COL))
    aggs.append(F.max_by(F.col(OP_COL), lsn_ord).alias(OP_COL))
    aggs.append(F.max(LSN_COL).alias(LSN_COL))
    g = source.groupBy(*carry, *key_cols).agg(*aggs)
    live_field = lambda c: F.when(  # noqa: E731
        F.col(DEL_LSN_COL).isNull() | (F.col(f"_w_{c}.l") > F.col(DEL_LSN_COL)),
        F.col(f"_w_{c}.v"),
    )
    return g.select(
        *carry,
        *key_cols,
        *[live_field(c).alias(c) for c in payload_cols],
        F.col(OP_COL),
        F.col(LSN_COL),
        F.col(DEL_LSN_COL),
    )


def merge_into(
    table: LakeTable,
    source: DataFrame,
    batch_id: str,
    mode: str = "mor",
    compact_threshold: int = 8,
    salt_partitions: int | None = None,
    extra_lineage: dict[str, Any] | None = None,
    watermark_lsn: int | None = None,
    post_reduce_transform=None,
    update_policy: str = "row",
    matched_only: bool = False,
    combine_first: bool | None = None,
    compact_target_bytes: int = 64 * 1024 * 1024,
) -> MergeResult:
    """Apply one change batch with exactly-once semantics.

    ``source`` must contain the table's key columns, payload columns
    (missing ones null-filled), ``_op`` ('I'/'U'/'D') and ``_lsn``.

    Redelivered ``batch_id``s are committed no-ops; events at or below
    the committed watermark are dropped (already part of the applied
    prefix — prevents stale inserts resurrecting physical deletes).

    ``update_policy`` selects the UPDATE SET semantics:

    * ``"row"`` (default) — whole-row LWW, ``UPDATE SET *``.
    * ``"coalesce"`` (D7) — per-column ``coalesce(s.col, t.col)``:
      null source fields preserve the target value (partial-update
      events; ``consent/ConsentController.java:170-189``).
    * ``"blank_preserve"`` (D6) — like coalesce, but blank ('' or
      whitespace) string fields also preserve the target
      (``facet/FacetLoaderService.java:168-174`` ``defaultIfBlank``).

    Non-row policies run in EITHER physical mode. Under ``mor`` the
    field-wise winner rows append as per-bucket deltas tagged
    ``_pu=true`` and carrying ``_del_lsn`` (the table schema evolves
    once, additively, to hold both system columns) — O(batch) writes,
    the sustained-throughput shape for a 10^10-event partial-update
    stream; reads and compaction resolve with the MIXED field-wise
    reduce (see :func:`lww_winners_fieldwise`). Under ``cow`` the
    touched buckets re-reduce field-wise at write time. Either way the
    policy cannot express "set field to null" — inherent to the
    semantics, same as the reference's ``Optional``-guarded setters.
    The latest non-row policy is recorded as the table property
    ``update_policy`` and governs read-time resolution.

    ``matched_only`` (D11): only keys LIVE in the target are touched —
    unmatched (or deleted) source keys are dropped, never inserted or
    resurrected (the reference's update-only endpoints return 404
    instead of creating). Forces COW (needs the target key set at
    write time).

    ``combine_first`` picks the reduce's shuffle shape; ``None`` (auto)
    = True iff salting is engaged:

    * False — ONE shuffle: repartition raw events on ``_bucket``, the
      (bucket, keys) aggregate runs exchange-free, the write reuses the
      partitioning. Cheapest when keys are well-spread (the common
      case), but a hot-KEY event storm lands whole on one reduce task
      (max_by lowers to SortAggregate — struct buffers are sort-based —
      and an explicit repartition leaves no map-side combine).
    * True — partial-aggregate FIRST on the input partitions (a storm
      of duplicates for one key collapses map-side to one row per input
      partition), then Catalyst's (bucket, keys) exchange carries only
      winners, and the write repartitions winners onto (bucket, salt).
      Two shuffles, but both skew-proof and the second is winner-sized.
    """
    # ONE manifest read serves the whole merge (single-writer
    # discipline: it cannot change underneath us) — the applied-batch
    # check, watermark, schema, and the final commit all derive from
    # this snapshot instead of five VERSION+manifest round trips.
    snap = table.current()
    if batch_id in set(snap.properties.get("applied_batches", [])):
        return MergeResult(snap, {"batch_id": batch_id, "skipped_duplicate_batch": True})

    if update_policy not in ("row", "coalesce", "blank_preserve"):
        raise ValueError(f"unknown update_policy {update_policy!r}")
    if matched_only:
        mode = "cow"
    if update_policy != "row" and mode == "mor":
        # field-wise deltas persist the delete boundary and the partial
        # marker; additive, metadata-only, idempotent
        from pyspark.sql import types as T

        snap_cols = {f.name for f in snap.schema.fields}
        need = [
            f
            for f in (
                T.StructField(DEL_LSN_COL, T.LongType(), True),
                T.StructField(PU_COL, T.BooleanType(), True),
            )
            if f.name not in snap_cols
        ]
        if need:
            snap = table.evolve_schema(need)
    keys = snap.key_cols
    payload = _payload_cols(snap)
    # read-time resolution policy: the latest non-row policy sticks
    resolve_policy = (
        update_policy
        if update_policy != "row"
        else snap.properties.get("update_policy", "row")
    )

    src_cols = set(source.columns)
    aligned = source.select(
        *keys,
        *[
            (F.col(c) if c in src_cols else F.lit(None).cast(snap.schema[c].dataType)).alias(c)
            for c in payload
        ],
        F.col(OP_COL),
        F.col(LSN_COL).cast("long"),
    )

    wm_prev = int(snap.properties.get("watermark_lsn", -1))
    if wm_prev >= 0:
        aligned = aligned.filter(F.col(LSN_COL) > F.lit(wm_prev))

    obs = Observation(f"merge-{batch_id}")
    aligned = aligned.observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.when(F.col(OP_COL) == OP_DELETE, 1).otherwise(0)).alias("deletes_in"),
        F.min(LSN_COL).alias("min_lsn"),
        F.max(LSN_COL).alias("max_lsn"),
    )

    if combine_first is None:
        combine_first = bool(salt_partitions)

    # Single-shuffle plan (combine_first=False): repartition once on the
    # bucket id, then group by (_bucket, keys) — HashPartitioning(_bucket)
    # satisfies the aggregate's ClusteredDistribution(_bucket, keys), so
    # the LWW reduce runs exchange-free and the per-bucket write reuses
    # the same partitioning. combine_first=True skips the explicit
    # repartition so Catalyst plans a map-side partial aggregate before
    # its own exchange (hot-key storm absorption; see docstring).
    bucketed = aligned.withColumn(
        BUCKET_COL, bucket_expr(snap.bucket_by, snap.bucket_count)
    )
    if not combine_first:
        bucketed = bucketed.repartition(F.col(BUCKET_COL))
    if update_policy == "row":
        winners = lww_winners(bucketed, keys, payload, carry_cols=[BUCKET_COL])
        if post_reduce_transform is not None:
            # Normalization is per-row pure and key/LSN-preserving, so
            # it commutes with whole-ROW LWW — running it on winners
            # (not raw events) cuts the vectorized-UDF volume by the
            # duplicate factor.
            winners = post_reduce_transform(winners)
    else:
        # Field-wise reduces do NOT commute with normalization: a field
        # the normalizer maps to null (sentinels, control-char-only
        # text) must read as null BEFORE specification is decided, or
        # the winner stores a value-then-nulled field as 'unspecified'
        # and shadows an earlier specified value. Normalize the raw
        # events here and pay the duplicate factor — partial-update
        # streams are update-heavy, not duplicate-heavy.
        src = (
            post_reduce_transform(bucketed)
            if post_reduce_transform is not None
            else bucketed
        )
        winners = lww_winners_fieldwise(
            src, keys, payload, carry_cols=[BUCKET_COL],
            policy=update_policy, schema=snap.schema,
        ).withColumn(PU_COL, F.lit(True))

    # conflict-count lineage, piggybacked on the write job (no extra
    # action): winners = distinct keys surviving the in-batch LWW
    # reduce; conflicts = superseded duplicates the reduce suppressed
    wobs = Observation(f"winners-{batch_id}")
    winners = winners.observe(wobs, F.count(F.lit(1)).alias("winners"))

    salt = [F.pmod(F.xxhash64(*keys), F.lit(salt_partitions))] if salt_partitions else None
    version = snap.version + 1

    sizes_hint: dict[str, int] = {}
    if mode == "cow":
        appends, replaces, compacted = _cow_write(
            table, snap, winners, keys, payload, salt, version,
            update_policy=update_policy, matched_only=matched_only,
            resolve_policy=resolve_policy,
        )
    elif mode == "mor":
        appends, replaces, compacted, sizes_hint = _mor_write(
            table, snap, winners, keys, payload, salt, version, compact_threshold,
            write_repartition=bool(salt) or combine_first,
            resolve_policy=resolve_policy,
            compact_target_bytes=compact_target_bytes,
        )
    else:
        raise ValueError(f"unknown merge mode {mode!r}")

    changed = sorted({int(b) for b in (*appends, *replaces)})
    if not changed:
        props = table.exactly_once_props(
            batch_id,
            watermark_lsn if watermark_lsn is not None else wm_prev,
            prev_properties=snap.properties,
        )
        snap2 = table.commit(
            {}, {}, props, {"batch_id": batch_id, "empty_batch": True}, prev=snap
        )
        return MergeResult(snap2, {"batch_id": batch_id, "rows_in": 0})

    if update_policy != "row":
        extra_lineage = {**(extra_lineage or {}), "update_policy": update_policy}

    m = {k: (int(v) if v is not None else None) for k, v in obs.get.items()}
    winners_n = int(wobs.get["winners"] or 0)
    written = {**appends, **replaces}
    per_bucket = _bucket_row_counts(table, written)
    metrics: dict[str, Any] = {
        "batch_id": batch_id,
        "mode": mode,
        "buckets_touched": len(changed),
        "buckets_compacted": compacted if mode == "mor" else changed,
        "buckets_total": snap.bucket_count,
        "rows_written": sum(per_bucket.values()) if per_bucket else winners_n,
        "per_bucket_rows": per_bucket,
        "winners": winners_n,
        "lww_conflicts": max(0, (m.get("rows_in") or 0) - winners_n),
        **m,
        **(extra_lineage or {}),
    }
    # explicit None checks: a legitimate max_lsn of 0 must still advance
    # the watermark from its initial -1
    max_lsn = m.get("max_lsn")
    if watermark_lsn is not None:
        wm = watermark_lsn
    elif max_lsn is not None:
        wm = max_lsn
    else:
        wm = wm_prev
    props = table.exactly_once_props(batch_id, wm, prev_properties=snap.properties)
    if update_policy != "row":
        props["update_policy"] = update_policy
    snap2 = table.commit(
        appends, replaces, props, metrics, prev=snap, file_sizes_hint=sizes_hint
    )
    return MergeResult(snap2, metrics)


def _read_raw(table, snap, keys, payload, rel_files=None, bucket_ids=None, df=None):
    """Raw (unresolved) table rows with every system column the schema
    carries — ``_del_lsn``/``_pu`` null-fill on pre-evolution files.
    ``df`` lets a caller supply an already-pruned scan (point lookups)
    and reuse just the system-column projection."""
    extras = _system_extras(snap)
    if df is None:
        df = (
            table._read_files(snap, rel_files)
            if rel_files is not None
            else table.read_buckets(bucket_ids, snap)
        )
    return df.select(
        *keys, *payload, F.col(OP_COL), F.col(LSN_COL).cast("long"),
        *[F.col(c) for c in extras],
    )


def _cow_write(
    table, snap, winners, keys, payload, salt, version,
    update_policy="row", matched_only=False, resolve_policy="row",
):
    """Copy-on-write: union touched buckets with winners, re-reduce,
    rewrite those buckets.

    Touched buckets must be known up front (they decide which target
    files join the union), so COW pays one extra batch pass: persist
    winners, collect the distinct bucket set (≤ bucket_count rows), then
    rewrite. Returns ({}, replaces, changed).

    The re-reduce is the MIXED field-wise reduce whenever this batch is
    partial OR the target carries field-wise history (``_pu`` in
    schema): target rows enter as FULL rows — raw MOR versions of a key
    row-resolve among themselves by LSN, so a field a newer row-policy
    update set to null can never be resurrected by an older version's
    value. ``matched_only`` semi-joins winners against the target's
    LIVE key set, so deleted keys are not resurrected and unmatched
    rows never insert."""
    winners = winners.persist()
    changed = sorted(r[0] for r in winners.select(BUCKET_COL).distinct().collect())
    if not changed:
        winners.unpersist()
        return {}, {}, []
    target = _read_raw(table, snap, keys, payload, bucket_ids=changed)
    src = winners.drop(BUCKET_COL)
    if matched_only:
        live_keys = resolve_live(
            target, keys, payload, policy=resolve_policy, schema=snap.schema
        ).select(*keys)
        src = src.join(live_keys, keys, "left_semi")
    fieldwise = update_policy != "row" or PU_COL in target.columns
    if fieldwise:
        # align both sides on the full system-column set; resolve_live
        # then dispatches to the mixed reduce (PU_COL present) — the
        # same code path MOR reads and compaction use
        for c, dtype in ((DEL_LSN_COL, "long"), (PU_COL, "boolean")):
            if c not in target.columns:
                target = target.withColumn(c, F.lit(None).cast(dtype))
            if c not in src.columns:
                src = src.withColumn(
                    c,
                    F.lit(update_policy != "row" if c == PU_COL else None).cast(dtype),
                )
    combined = target.unionByName(src)
    live = resolve_live(
        combined, keys, payload, policy=resolve_policy, schema=snap.schema
    )
    live = live.withColumn(BUCKET_COL, bucket_expr(snap.bucket_by, snap.bucket_count))
    # every CHANGED bucket must be replaced even when it resolved to
    # ZERO live rows (a batch that deletes a bucket's last keys): the
    # dynamic-partition writer emits no dir for an empty bucket, and a
    # missing `replaces` entry would keep the old files — the delete
    # would silently vanish
    replaces = {str(b): [] for b in changed}
    replaces.update(
        table.write_data_files(live, version, write_partitions=salt, sort_cols=keys)
    )
    winners.unpersist()
    return {}, replaces, changed


def _should_compact(
    n_files: int,
    threshold: int,
    base_bytes: int | None,
    delta_bytes: int | None,
    target_bytes: int,
) -> bool:
    """Count + bytes compaction trigger for one bucket.

    A pure count trigger mis-handles mixed delta sizes at 10^10-event
    scale in both directions: it lets a few LARGE deltas sit unmerged
    (read amplification) until the count fires, and it rewrites a
    large healthy base because N TINY deltas landed (write
    amplification — absorbing 1% of the bytes re-writes 100%). Rules,
    sizes permitting (``None`` sizes = stat unavailable → pure count
    behavior):

    * below the count threshold, compact early iff the accumulated
      delta bytes alone exceed ``target_bytes`` — they are already a
      full output file's worth of read amp;
    * at the count threshold, DEFER iff the base exceeds
      ``target_bytes`` and the deltas are under 2% of it — bounded by a
      hard cap of 4× the count threshold so deferral can't starve
      compaction (read amp stays O(threshold) files).
    """
    if n_files <= threshold:
        return delta_bytes is not None and delta_bytes > target_bytes
    if (
        base_bytes
        and delta_bytes is not None
        and n_files <= 4 * threshold
        and base_bytes > target_bytes
        and delta_bytes < 0.02 * base_bytes
    ):
        return False
    return True


def _bucket_file_bytes(
    table, rel_files: list[str], snap=None, stat_cache: dict | None = None
) -> int | None:
    """Total bytes of a file set. Committed files resolve from the
    manifest's ``file_sizes`` (recorded at commit time — METADATA, zero
    filesystem round trips); only files the manifest doesn't know yet
    (this batch's just-written deltas, pre-upgrade manifests) fall back
    to a data-plane stat (POSIX stat locally, FileStatus on Hadoop
    roots), memoized into ``stat_cache`` so each new file is statted at
    most ONCE per commit (the cache is then handed to ``commit()`` so
    it never re-stats them either). Returns None when a fallback stat
    fails — the trigger then degrades to pure count."""
    known = snap.file_sizes if snap is not None else {}
    cache = stat_cache if stat_cache is not None else {}
    try:
        total = 0
        for f in rel_files:
            if f in known:
                total += known[f]
            elif f in cache:
                total += cache[f]
            else:
                s = int(table.fs.size(os.path.join(table.root, f)))
                cache[f] = s
                total += s
        return total
    except Exception:
        return None


def _mor_write(
    table, snap, winners, keys, payload, salt, version, threshold,
    write_repartition=False, resolve_policy="row",
    compact_target_bytes: int = 64 * 1024 * 1024,
):
    """Merge-on-read: ONE pass over the batch — winner rows (including
    'D' tombstones, and ``_pu``-tagged field-wise partials) stream
    straight into per-bucket delta files via the dynamic-partition
    writer; the touched-bucket set falls out of the write result (no
    pruning pre-pass, no cache). Buckets whose file count then exceeds
    the threshold are compacted from the just-written files in a
    second, amortized-rare job; compaction output is fully-resolved
    FULL rows (the ``_pu``/``_del_lsn`` history collapses).

    Returns (appends, replaces, compacted_bucket_ids, new_file_sizes) —
    the last is the trigger's memoized stat cache, handed to
    ``commit()`` so no new file is ever statted twice."""
    appends = table.write_data_files(
        winners, version, write_partitions=salt, subdir="delta",
        repartition=write_repartition,
    )

    to_compact = []
    new_sizes: dict[str, int] = {}
    for b in appends:
        existing = snap.files.get(b, [])
        n = len(existing) + len(appends[b])
        if n > 4 * threshold:
            to_compact.append(int(b))  # forced by the cap: skip byte math
            continue
        if n == 1 and not existing:
            # one fresh file: merging is a no-op and early-compacting
            # would double the initial load's write amplification
            continue
        # sizes: committed files from the manifest (metadata-only),
        # just-written deltas via one memoized stat each — never a HEAD
        # sweep over the table's existing files. Fresh buckets are NOT
        # exempt: a big initial load (salted multi-file deltas over the
        # early-bytes target) compacts immediately — resolved, sorted,
        # tombstone-free — instead of serving raw deltas until the
        # count threshold catches up.
        base = [f for f in existing if "/delta/" not in f]
        delta = [f for f in existing if "/delta/" in f] + list(appends[b])
        if _should_compact(
            n,
            threshold,
            _bucket_file_bytes(table, base, snap, new_sizes),
            _bucket_file_bytes(table, delta, snap, new_sizes),
            compact_target_bytes,
        ):
            to_compact.append(int(b))
    replaces: dict[str, list[str]] = {}
    if to_compact:
        # existing snapshot files + the fresh deltas for those buckets
        rel_files = [f for b in to_compact for f in snap.files.get(str(b), [])]
        rel_files += [f for b in to_compact for f in appends[str(b)]]
        base = _read_raw(table, snap, keys, payload, rel_files=rel_files)
        live = (
            resolve_live(base, keys, payload, policy=resolve_policy, schema=snap.schema)
            .withColumn(BUCKET_COL, bucket_expr(snap.bucket_by, snap.bucket_count))
        )
        # same zero-live-rows guard as the COW path: a compacted bucket
        # whose keys all died must swap to an EMPTY file list, not keep
        # its pre-compaction files
        replaces = {str(b): [] for b in to_compact}
        replaces.update(
            table.write_data_files(
                live, version, write_partitions=salt, subdir="base", sort_cols=keys
            )
        )
        for b in to_compact:
            # superseded deltas become unreferenced files (GC'able)
            appends.pop(str(b), None)
        # superseded deltas' entries in new_sizes are harmless: commit()
        # prunes sizes to the referenced file set
    return appends, replaces, to_compact, new_sizes


def optimize(
    table: LakeTable,
    compact_threshold: int = 8,
    compact_target_bytes: int = 64 * 1024 * 1024,
    buckets: list[int] | None = None,
) -> "Snapshot | None":
    """Standalone bucket compaction — the Delta ``OPTIMIZE`` analog.

    ``merge_into`` compacts inline, but only buckets IT touches; a
    table fed by the streaming sink (append-only deltas, never
    compacts) or one that stopped ingesting accumulates per-bucket
    delta files forever. ``optimize`` selects buckets by the SAME
    count+bytes trigger the merge path uses (:func:`_should_compact` —
    metadata-only: counts from the manifest file lists, bytes from the
    manifest's recorded ``file_sizes``), resolves their live state
    (policy-aware, tombstones collapse), and rewrites each as a
    key-sorted base in ONE Spark job over only those buckets' files.
    Zero-live-row buckets swap to explicit empty file lists (the
    ``replaces`` guard). Returns the new snapshot, or None when no
    bucket qualifies — a no-op decision that costs zero data IO.

    Compaction changes no live row: ``table_changes`` across the
    boundary is empty (the CDF planner sees changed file LISTS, the
    value diff is empty — tested). ``buckets`` restricts the candidate
    set (operational partial runs on huge tables)."""
    snap = table.current()
    keys, payload = snap.key_cols, _payload_cols(snap)
    cand = (
        {str(b) for b in buckets} & set(snap.files)
        if buckets is not None
        else set(snap.files)
    )
    cache: dict[str, int] = {}
    to_compact: list[int] = []
    for b in sorted(cand, key=int):
        files = snap.files[b]
        n = len(files)
        if n <= 1:
            continue  # a single base: merging is a no-op
        if n > 4 * compact_threshold:
            to_compact.append(int(b))  # forced by the cap: skip byte math
            continue
        base = [f for f in files if "/delta/" not in f]
        delta = [f for f in files if "/delta/" in f]
        if _should_compact(
            n,
            compact_threshold,
            _bucket_file_bytes(table, base, snap, cache),
            _bucket_file_bytes(table, delta, snap, cache),
            compact_target_bytes,
        ):
            to_compact.append(int(b))
    if not to_compact:
        return None
    rel_files = [f for b in to_compact for f in snap.files[str(b)]]
    raw = _read_raw(table, snap, keys, payload, rel_files=rel_files)
    live = resolve_live(
        raw, keys, payload,
        policy=snap.properties.get("update_policy", "row"), schema=snap.schema,
    ).withColumn(BUCKET_COL, bucket_expr(snap.bucket_by, snap.bucket_count))
    version = snap.version + 1
    replaces = {str(b): [] for b in to_compact}
    replaces.update(
        table.write_data_files(live, version, subdir="base", sort_cols=keys)
    )
    return table.commit(
        {}, replaces, None,
        {
            # retry-stable id (same rule as rebucket): a crashed claim's
            # data dirs are attempt-unique, so only the id lets the
            # retry take the claim over instead of dying forever
            "batch_id": f"optimize-v{version}",
            "optimize": {"buckets": to_compact},
        },
        prev=snap,
    )


def rebucket(table: LakeTable, new_bucket_count: int) -> "Snapshot":
    """Change the table's bucket layout — the operational escape hatch
    for a bucket_count chosen at create time that the data outgrew
    (32 buckets at 10^8 rows is right; at 10^10 each bucket is 300x too
    fat for a single compaction task).

    One-time O(table) rewrite, exactly like Iceberg's
    ``rewrite_data_files`` after a partition-spec change: resolve the
    live state (policy-aware), re-hash under the new count, write
    key-sorted bases, and commit a snapshot that REPLACES every old
    bucket (explicit ``[]`` entries — the empty-bucket guard — so no
    stale file list survives) with the new layout. Exactly-once
    bookkeeping (watermark, applied batches) carries through untouched;
    merges after the commit read the new ``bucket_count`` from the
    snapshot, so nothing else changes. Rebucketing changes no live row:
    ``table_changes`` across the boundary is empty (tested)."""
    snap = table.current()
    if new_bucket_count == snap.bucket_count:
        return snap
    if new_bucket_count < 1:
        raise ValueError(f"bucket_count must be >= 1, got {new_bucket_count}")
    keys, payload = snap.key_cols, _payload_cols(snap)
    raw = _read_raw(table, snap, keys, payload, rel_files=snap.all_files())
    live = resolve_live(
        raw, keys, payload,
        policy=snap.properties.get("update_policy", "row"), schema=snap.schema,
    ).withColumn(BUCKET_COL, bucket_expr(snap.bucket_by, new_bucket_count))
    version = snap.version + 1
    replaces = {b: [] for b in snap.files}
    replaces.update(
        table.write_data_files(live, version, subdir="base", sort_cols=keys)
    )
    return table.commit(
        {}, replaces, None,
        {
            # retry-stable batch id: a rebucket killed between claim and
            # pointer swap leaves a claim whose data dirs are
            # attempt-unique, so full-JSON intent equality can never
            # match — without this id the retry (and every later
            # commit) would die on ConcurrentCommitError forever
            "batch_id": f"rebucket-{snap.bucket_count}-{new_bucket_count}-v{version}",
            "rebucket": {"from": snap.bucket_count, "to": new_bucket_count},
        },
        prev=snap, bucket_count=new_bucket_count,
    )


def table_changes(
    table: LakeTable, from_version: int, to_version: int
) -> DataFrame:
    """Change data feed between two snapshots (the Iceberg/Delta CDF
    analog): one row per key whose live state differs, classified
    ``_change ∈ I/U/D``, carrying the new row for I/U and the old key
    for D. Downstream consumers chain incremental pipelines off this
    instead of re-reading the table.

    D rows carry the DELETED row's last live ``_lsn`` (the preimage,
    Delta-style) — the tombstone's own LSN is not in the live state.
    Consequence for consumers folding the feed into a materialized
    state by max-LSN per key: "update at LSN L, then delete" across
    two spans emits a U and a D both stamped L, so equal-``_lsn`` ties
    must resolve in favor of D. That rule is always correct here: the
    watermark guard means no later event can carry an LSN ≤ a row it
    follows, so an equal-LSN D is necessarily the logically-later
    change. (Exercised end to end by BENCH/stream_soak.py.)

    Plan shape — O(change), not O(table): data files are immutable and
    keys can never move buckets (bucket id is a pure hash of the
    bucket_by columns and bucket_count is commit-invariant), so a
    bucket's resolved live state can only differ between two versions
    if its manifest FILE LIST differs. The changed-bucket set therefore
    falls out of a metadata-only manifest diff; both sides then resolve
    and full-outer-join ONLY those buckets' files. A commit that touched
    1 of 1024 buckets on a 10^9-row table diffs 1 bucket, not the table.
    Unchanged buckets are no-ops by construction and are never read.
    Additive schema evolution is change-free for untouched buckets: the
    added column reads null on BOTH sides of the diff. The one
    resolution input that isn't per-bucket is the table's update_policy
    property — if it differs between the versions the same bytes may
    resolve differently, so that (rare, config-level) case falls back
    to diffing every bucket."""
    snap_from = table.snapshot(from_version)
    snap_to = table.snapshot(to_version)
    keys = snap_to.key_cols
    payload = _payload_cols(snap_to)

    pol_from = snap_from.properties.get("update_policy", "row")
    pol_to = snap_to.properties.get("update_policy", "row")
    same_layout = (
        snap_from.bucket_count == snap_to.bucket_count
        and snap_from.bucket_by == snap_to.bucket_by
    )
    if pol_from == pol_to and same_layout:
        changed = sorted(
            b
            for b in set(snap_from.files) | set(snap_to.files)
            if snap_from.files.get(b) != snap_to.files.get(b)
        )
    else:
        # resolution policy or bucket layout differs across the span
        # (rebucket writes all-new files so the metadata diff would
        # already flag everything — this guard makes it an invariant,
        # not a coincidence)
        changed = sorted(set(snap_from.files) | set(snap_to.files))

    def live(snap, policy: str) -> DataFrame:
        names = {f.name for f in snap.schema.fields}
        present = [c for c in payload if c in names]
        rel = [f for b in changed for f in snap.files.get(b, [])]
        df = _read_raw(table, snap, keys, present, rel_files=rel)
        # columns added by later (additive) schema evolution read as
        # null in the older snapshot — diff-able by definition
        for c in payload:
            if c not in names:
                df = df.withColumn(c, F.lit(None).cast(snap_to.schema[c].dataType))
        return resolve_live(df, keys, payload, policy=policy, schema=snap_to.schema)

    return state_diff(live(snap_from, pol_from), live(snap_to, pol_to), keys, payload)


def state_diff(
    old: DataFrame, new: DataFrame, keys: list[str], payload: list[str]
) -> DataFrame:
    """Classify the difference between two resolved live states (one
    row per key, ``_lsn`` carried): one full outer join on the keys,
    ``_change ∈ I/U/D`` from null-sides and a per-row payload-hash
    comparison — no window, no collect. The reusable half of
    :func:`table_changes` (also exposed as a driver-oracled query)."""

    def digest(col, dt) -> "F.Column":
        # one 32-char md5 per value, '-' for null (md5 hex never
        # contains '-', so the concatenation parses unambiguously).
        # BINARY hashes its bytes directly: cast("string") decodes as
        # UTF-8 with replacement chars, so two different non-UTF-8
        # payloads could collapse to one string and a real update
        # would classify as unchanged. ARRAYS digest element-wise via
        # one HOF fold: cast("string") renders array('a, b') and
        # array('a','b') both as '[a, b]' — a REAL update between them
        # would classify as unchanged (same ambiguity class as the
        # separator scheme below). Element digests are fixed-width, so
        # the join can't shift content across element boundaries;
        # empty array (md5 of '') stays distinct from null array
        # ('-'). STRUCTS digest field-wise, null struct distinct from
        # struct-of-nulls.
        if isinstance(dt, T.BinaryType):
            return F.coalesce(F.md5(col), F.lit("-"))
        if isinstance(dt, T.ArrayType):
            folded = F.array_join(
                F.transform(col, lambda x: digest(x, dt.elementType)), ""
            )
            return F.coalesce(F.md5(folded), F.lit("-"))
        if isinstance(dt, T.StructType):
            parts = [digest(col.getField(f.name), f.dataType) for f in dt.fields]
            return F.when(col.isNull(), F.lit("-")).otherwise(
                F.md5(F.concat(*parts))
            )
        return F.coalesce(F.md5(col.cast("string")), F.lit("-"))

    def hashed(df: DataFrame, side: str) -> DataFrame:
        # per-column md5s concatenated (fixed width): unambiguous — a
        # separator/sentinel scheme over raw values lets adjacent
        # columns shift content across the boundary ('a\x01b','c' vs
        # 'a','b\x01c') and classify a real update as unchanged.
        types = {f.name: f.dataType for f in df.schema.fields}
        h = F.md5(F.concat(*[digest(F.col(c), types[c]) for c in payload]))
        return df.select(
            *[F.col(k).alias(f"{side}_{k}") for k in keys],
            *[F.col(c).alias(f"{side}_{c}") for c in payload],
            F.col(LSN_COL).alias(f"{side}_lsn"),
            h.alias(f"{side}_hash"),
        )

    old, new = hashed(old, "o"), hashed(new, "n")
    cond = [old[f"o_{k}"] == new[f"n_{k}"] for k in keys]
    joined = old.join(new, cond, "full_outer")
    change = (
        F.when(F.col(f"o_{keys[0]}").isNull(), F.lit("I"))
        .when(F.col(f"n_{keys[0]}").isNull(), F.lit("D"))
        .when(F.col("o_hash") != F.col("n_hash"), F.lit("U"))
    )
    return (
        joined.withColumn("_change", change)
        .filter(F.col("_change").isNotNull())
        .select(
            "_change",
            *[F.coalesce(F.col(f"n_{k}"), F.col(f"o_{k}")).alias(k) for k in keys],
            *[F.col(f"n_{c}").alias(c) for c in payload],
            F.coalesce(F.col("n_lsn"), F.col("o_lsn")).alias(LSN_COL),
        )
    )


def materialize_feed(
    feed: DataFrame, keys: list[str], payload: list[str]
) -> DataFrame:
    """Fold a (possibly multi-span) change feed back into live state —
    the consumer-side inverse of :func:`table_changes`: per key the
    highest-``_lsn`` change wins, with equal-``_lsn`` ties broken in
    favor of D (the preimage rule documented on ``table_changes`` —
    update-then-delete across spans emits U and D at the SAME LSN);
    D winners drop the key.

    Library form of the fold so downstream consumers don't hand-roll
    the tie-break (BENCH/stream_soak.py re-derives it independently in
    DuckDB as the soak's oracle). One hash-shaped aggregate keyed on
    the table keys — no window, no collect; at cluster scale this is a
    single shuffle on the same keys the table is bucketed by."""
    is_d = (F.col("_change") == F.lit("D")).cast("int")
    order = F.struct(F.col(LSN_COL), is_d.alias("_is_d"))
    win = feed.groupBy(*keys).agg(
        F.max_by(
            F.struct(F.col("_change"), *[F.col(c) for c in payload], F.col(LSN_COL)),
            order,
        ).alias("_w")
    )
    return (
        win.filter(F.col("_w._change") != F.lit("D"))
        .select(
            *keys,
            *[F.col(f"_w.{c}").alias(c) for c in payload],
            F.col(f"_w.{LSN_COL}").alias(LSN_COL),
        )
    )


def iceberg_merge_sql(
    target: str,
    source: str,
    key_cols: list[str],
    payload_cols: list[str],
    update_policy: str = "row",
    matched_only: bool = False,
    string_cols: set[str] | None = None,
) -> str:
    """The exact Iceberg ``MERGE INTO`` statement this module's merge
    implements — the drop-in equivalent on a cluster with Iceberg
    extensions (the integration seam documented in the module
    docstring). ``source`` must be the LWW-reduced winners view (one row
    per key, ``lww_winners`` / ``lww_winners_fieldwise`` output).

    Policies render as per-column UPDATE SET lists: ``coalesce`` (D7)
    -> ``coalesce(s.c, t.c)``; ``blank_preserve`` (D6) ->
    ``coalesce(nullif(trim(s.c), ''), t.c)`` for ``string_cols``.
    ``matched_only`` (D11) drops the NOT MATCHED clause."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    if update_policy == "row":
        set_clause = "UPDATE SET *"
    else:
        strings = string_cols or set()
        parts = []
        for c in payload_cols:
            if update_policy == "blank_preserve" and c in strings:
                # blank = ALL-whitespace; the kept source value stays
                # verbatim (no trim), matching the engine's semantics
                parts.append(
                    f"t.{c} = CASE WHEN s.{c} IS NULL "
                    f"OR regexp_replace(s.{c}, '\\\\s', '', 'g') = '' "
                    f"THEN t.{c} ELSE s.{c} END"
                )
            else:
                parts.append(f"t.{c} = coalesce(s.{c}, t.{c})")
        parts += [f"t.{LSN_COL} = s.{LSN_COL}", f"t.{OP_COL} = s.{OP_COL}"]
        set_clause = "UPDATE SET " + ", ".join(parts)
    lines = [
        f"MERGE INTO {target} t",
        f"USING {source} s",
        f"ON {on}",
        f"WHEN MATCHED AND s.{OP_COL} = 'D' AND s.{LSN_COL} > t.{LSN_COL} THEN DELETE",
        f"WHEN MATCHED AND s.{LSN_COL} > t.{LSN_COL} THEN {set_clause}",
    ]
    if not matched_only:
        lines.append(f"WHEN NOT MATCHED AND s.{OP_COL} <> 'D' THEN INSERT *")
    return "\n".join(lines)


def _bucket_row_counts(table: LakeTable, bucket_files: dict[str, list[str]]) -> dict[str, int]:
    """Per-partition rows-applied lineage, read from Parquet footers —
    metadata-only, no extra Spark job. URI roots (Hadoop data plane)
    skip the footer reads and return {} — lineage then falls back to
    the in-plan winner count and auto-salt's per-bucket signal is
    unavailable (documented in RunnerConfig)."""
    from picsure_dictionary_etl_spark.lake.fs import is_uri

    if is_uri(table.root):
        return {}
    import pyarrow.parquet as pq

    counts: dict[str, int] = {}
    for b, files in bucket_files.items():
        counts[b] = sum(
            pq.ParquetFile(os.path.join(table.root, f)).metadata.num_rows for f in files
        )
    return counts
