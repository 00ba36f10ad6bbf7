"""Streaming-sink throughput A/B: ``writeStream.format("lake")`` vs the
engine's ``merge_into`` path on the SAME event slices.

What it measures and proves:

- sustained events/sec through the native sink (arrow-batch executor
  write + per-epoch manifest commit), with the JVM-side ``with_bucket``
  fast path — the number that tells you what the no-LWW-reduce
  append-only path costs/buys vs a full merge per epoch;
- exact final-state equality between the sink-fed table and the
  merge-fed table (resolved live states, two-way exceptAll) — the
  sink's read-time-LWW semantics converge to the merge's write-time
  LWW reduce on identical input;
- file amplification: the sink appends raw rows (no winner reduce),
  so its table carries more delta files/rows pre-compaction — the
  report records both tables' file/row counts and the post-
  ``optimize()`` collapse.

Usage: python BENCH/sink_bench.py [--events 2000000] [--epochs 8]
Writes BENCH/sink_bench_results.json and prints a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

DRIVER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from picsure_dictionary_etl_spark.session import get_spark
from picsure_dictionary_etl_spark.cdc.generator import change_events
from picsure_dictionary_etl_spark.cdc.envelope import (
    TRANSCRIPT_KEY, change_event_schema, transcript_table_schema,
)
from picsure_dictionary_etl_spark.lake.table import LakeTable
from picsure_dictionary_etl_spark.lake.merge import (
    merge_into, optimize, resolve_live,
)
from picsure_dictionary_etl_spark.streaming.lake_sink import (
    LakeTableSinkDataSource, with_bucket,
)

N = {events}
EPOCHS = {epochs}
REPART = {repartition}
BASE = {base!r}
PAYLOAD = ["role", "text", "tool", "ts"]

spark = get_spark("sink-bench", master="local[32]", shuffle_partitions=32)
spark.dataSource.register(LakeTableSinkDataSource)

# one deterministic event set, written as EPOCHS parquet slices
src = os.path.join(BASE, "src")
ev = change_events(spark, N, n_convs=max(64, N // 2000), delete_ratio=0.05,
                   hot_fraction=0.2)
step = (N + EPOCHS - 1) // EPOCHS
slices = []
for e in range(EPOCHS):
    d = os.path.join(src, f"epoch={{e}}")
    ev.filter((ev._lsn >= e * step) & (ev._lsn < (e + 1) * step)) \
      .write.mode("overwrite").parquet(d)
    slices.append(d)

# --- path A: native streaming sink (one availableNow pass per epoch,
# one shared checkpoint — the epoch cadence a real micro-batch stream
# would have) ---------------------------------------------------------
sink_root = os.path.join(BASE, "t_sink")
LakeTable.create(spark, sink_root, schema=transcript_table_schema(),
                 key_cols=TRANSCRIPT_KEY, bucket_by=["conv_id"],
                 bucket_count=32)
seen = os.path.join(BASE, "seen")  # grow-in-place dir for the file source
os.makedirs(seen)
ckpt = os.path.join(BASE, "ck")
t0 = time.time()
for e, d in enumerate(slices):
    for fn in os.listdir(d):
        if fn.endswith(".parquet"):
            os.link(os.path.join(d, fn), os.path.join(seen, f"e{{e}}-{{fn}}"))
    df = with_bucket(
        spark.readStream.schema(change_event_schema()).parquet(seen),
        sink_root, repartition={repartition})
    q = (df.writeStream.format("lake").option("path", sink_root)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
sink_s = time.time() - t0

# --- path B: engine merge per epoch (the foreachBatch shape) ---------
merge_root = os.path.join(BASE, "t_merge")
LakeTable.create(spark, merge_root, schema=transcript_table_schema(),
                 key_cols=TRANSCRIPT_KEY, bucket_by=["conv_id"],
                 bucket_count=32)
tm = LakeTable.load(spark, merge_root)
t0 = time.time()
for e, d in enumerate(slices):
    merge_into(tm, spark.read.schema(change_event_schema()).parquet(d),
               f"epoch-{{e}}")
merge_s = time.time() - t0

# --- equality + amplification ----------------------------------------
ts = LakeTable.load(spark, sink_root)
live_s = resolve_live(ts.read(), TRANSCRIPT_KEY, PAYLOAD).select(
    "conv_id", "turn_idx", "role", "text", "tool", "ts", "_lsn")
live_m = resolve_live(tm.read(), TRANSCRIPT_KEY, PAYLOAD).select(
    "conv_id", "turn_idx", "role", "text", "tool", "ts", "_lsn")
only_s = live_s.exceptAll(live_m).count()
only_m = live_m.exceptAll(live_s).count()
rows = live_s.count()
files_sink = sum(len(f) for f in ts.current().files.values())
files_merge = sum(len(f) for f in tm.current().files.values())
t0 = time.time()
snap = optimize(ts, compact_threshold=2)
opt_s = time.time() - t0
files_opt = sum(len(f) for f in snap.files.values()) if snap else files_sink

print("RESULT " + json.dumps({{
    "events": N, "epochs": EPOCHS, "repartition": REPART,
    "sink_sec": round(sink_s, 2),
    "sink_ev_per_s": round(N / sink_s),
    "merge_sec": round(merge_s, 2),
    "merge_ev_per_s": round(N / merge_s),
    "final_rows": rows,
    "state_equal": only_s == 0 and only_m == 0,
    "files_sink": files_sink, "files_merge": files_merge,
    "files_after_optimize": files_opt,
    "optimize_sec": round(opt_s, 2),
}}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--repartition", action="store_true",
                    help="hash-partition on _bucket before the sink "
                         "(O(buckets) files per epoch instead of "
                         "O(tasks x buckets))")
    args = ap.parse_args()
    with tempfile.TemporaryDirectory(prefix="sink_bench_") as base:
        code = DRIVER.format(repo=REPO, events=args.events,
                             epochs=args.epochs, base=base,
                             repartition=args.repartition)
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            sys.stderr.write(out.stdout[-4000:] + "\n" + out.stderr[-4000:])
            raise SystemExit("driver produced no RESULT line")
        res = json.loads(line[-1][len("RESULT "):])
    suffix = "_repartition" if args.repartition else ""
    path = os.path.join(HERE, f"sink_bench_results{suffix}.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))
    if not res["state_equal"]:
        raise SystemExit("FINAL STATES DIVERGED — sink != merge")


if __name__ == "__main__":
    main()
