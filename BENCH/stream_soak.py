"""Streaming-consumer soak: a sustained CDC replay (producer) interleaved
with a PACED `lake_cdf` Structured-Streaming consumer, then an exact
final-state reconstruction check.

What it proves, at sustained multi-batch scale:
- the `lake_cdf` source survives a long producer run across MANY
  checkpointed availableNow passes (Spark's offset log is the only
  consumer state — no hand-rolled ack loop);
- `maxversionsperbatch` pacing holds end to end (every offset-log step
  advances by at most the cap) while losing nothing;
- the streamed change rows are SUFFICIENT: replaying them per key by
  max-LSN reproduces the table's final live state bit-for-bit (DuckDB
  equality over every payload column), i.e. a downstream consumer that
  only ever saw the feed ends at the same state as the table itself.

Usage: python BENCH/stream_soak.py [--events 4000000] [--batches 8]
                                   [--pace 2]
Writes BENCH/stream_soak_results.json and prints a summary.

The whole run executes in ONE subprocess (producer and consumer share
the Spark session the way a real deployment shares a cluster); the
reconstruction check runs in DuckDB, independent of Spark.
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
import glob, json, os, re, sys, time
sys.path.insert(0, {repo!r})
import duckdb
from picsure_dictionary_etl_spark.session import get_spark
from picsure_dictionary_etl_spark.cdc.generator import change_events
from picsure_dictionary_etl_spark.cdc.runner import CdcRunner, RunnerConfig
from picsure_dictionary_etl_spark.lake.table import LakeTable
from picsure_dictionary_etl_spark.streaming.cdf_source import (
    LakeChangeFeedDataSource,
)

spark = get_spark("stream-soak", master="local[32]", shuffle_partitions=32)
spark.dataSource.register(LakeChangeFeedDataSource)

root = {root!r}
ckpt, sink = {ckpt!r}, {sink!r}
n_events, n_batches, pace = {n_events}, {n_batches}, {pace}

events_path = {events!r}
change_events(spark, n_events, n_convs=n_events // 200, delete_ratio=0.05,
              hot_fraction=0.2, malformed_ratio=0.01
              ).write.mode("overwrite").parquet(events_path)
events = spark.read.parquet(events_path)

r = CdcRunner(spark, RunnerConfig(table_root=root, bucket_count=16,
                                  auto_salt=True))
step = (n_events + n_batches - 1) // n_batches


def consume_until_current(limit_passes=64):
    '''availableNow passes (one micro-batch each for a Python source)
    until the checkpoint catches the table's current version.'''
    t = LakeTable.load(spark, root)
    cur = t.current_version()
    passes = 0
    while passes < limit_passes:
        q = (spark.readStream.format("lake_cdf").option("path", root)
             .option("maxversionsperbatch", str(pace)).load()
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        passes += 1
        offs = sorted(int(x) for x in os.listdir(os.path.join(ckpt, "offsets"))
                      if x.isdigit())
        last = open(os.path.join(ckpt, "offsets", str(offs[-1]))).read()
        m = re.search(r'"version":\s*(\d+)', last)
        if m and int(m.group(1)) >= cur:
            return passes
    raise RuntimeError("consumer did not catch up within pass limit")


lo = 0
total_passes = 0
t_consume = 0.0
t0 = time.time()
for b in range(n_batches):
    hi = min(n_events, lo + step)
    r.replay(events, lsn_step=step, max_lsn=hi)
    tc = time.time()
    total_passes += consume_until_current()
    t_consume += time.time() - tc
    lo = hi
wall = time.time() - t0

# pacing held: every offsets-log step advanced by at most `pace`
ends = []
for f in sorted(int(x) for x in os.listdir(os.path.join(ckpt, "offsets"))
                if x.isdigit()):
    m = re.search(r'"version":\s*(\d+)',
                  open(os.path.join(ckpt, "offsets", str(f))).read())
    if m:
        ends.append(int(m.group(1)))
paced_ok = all(b - a <= pace for a, b in zip(ends, ends[1:]))

# final-state reconstruction purely from the streamed change rows
files = [f for f in glob.glob(os.path.join(sink, "*.parquet"))
         if os.path.getsize(f) > 0]
state_dir = {state_dir!r}
r.state().write.mode("overwrite").parquet(state_dir)
con = duckdb.connect()
con.execute(
    "CREATE VIEW feed AS SELECT * FROM read_parquet(" + repr(files) + ")")
con.execute("CREATE VIEW tbl AS SELECT * FROM read_parquet('"
            + state_dir + "/*.parquet')")
CANON = ("conv_id || '|' || turn_idx || '|' || coalesce(role,'@N') || '|' || "
         "coalesce(text,'@N') || '|' || coalesce(tool,'@N') || '|' || "
         "coalesce(CAST(epoch_us(ts) AS VARCHAR),'@N')")
# Fold rule: per key, highest _lsn wins; on EQUAL _lsn the D row wins.
# A D change row carries the deleted row's last live _lsn (the
# preimage, Delta-style), so "update at lsn L, then delete" emits a U
# and a D both at L — and the watermark guard makes the D always the
# logically-later one at equal LSN (documented on table_changes).
recon_hash, recon_rows = con.execute(
    "WITH last AS (SELECT *, row_number() OVER "
    "  (PARTITION BY conv_id, turn_idx "
    "   ORDER BY _lsn DESC, (_change = 'D') DESC) rn FROM feed), "
    "live AS (SELECT * FROM last WHERE rn = 1 AND _change <> 'D') "
    "SELECT coalesce(CAST(sum(('0x' || substring(md5(" + CANON + "),1,15))"
    "::BIGINT) AS VARCHAR), 'empty'), count(*) FROM live").fetchone()
tbl_hash, tbl_rows = con.execute(
    "SELECT coalesce(CAST(sum(('0x' || substring(md5(" + CANON + "),1,15))"
    "::BIGINT) AS VARCHAR), 'empty'), count(*) FROM tbl").fetchone()
feed_rows = con.execute("SELECT count(*) FROM feed").fetchone()[0]

print("RESULT " + json.dumps({{
    "events": n_events, "batches": n_batches, "pace": pace,
    "wall_sec": round(wall, 2),
    "producer_events_per_sec": round(n_events / max(wall - t_consume, 1e-9), 1),
    "consumer_passes": total_passes,
    "consumer_wall_sec": round(t_consume, 2),
    "feed_rows": feed_rows,
    "feed_rows_per_sec": round(feed_rows / max(t_consume, 1e-9), 1),
    "offset_ends": ends, "paced_ok": paced_ok,
    "final_state_rows": tbl_rows, "reconstructed_rows": recon_rows,
    "state_equal": bool(recon_hash == tbl_hash and recon_rows == tbl_rows),
}}), flush=True)
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--pace", type=int, default=2)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory(prefix="stream_soak_") as tmp:
        code = DRIVER.format(
            repo=REPO, root=os.path.join(tmp, "table"),
            ckpt=os.path.join(tmp, "ckpt"), sink=os.path.join(tmp, "sink"),
            events=os.path.join(tmp, "events"),
            state_dir=os.path.join(tmp, "state"),
            n_events=args.events, n_batches=args.batches, pace=args.pace)
        out = subprocess.run([sys.executable, "-c", code], text=True,
                             capture_output=True, check=False)
        result = None
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                result = json.loads(line[len("RESULT "):])
        if result is None:
            sys.stderr.write(out.stdout[-4000:] + "\n" + out.stderr[-4000:])
            raise SystemExit("stream soak produced no RESULT line")
        with open(os.path.join(HERE, "stream_soak_results.json"), "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result, indent=2))
        if not (result["state_equal"] and result["paced_ok"]):
            raise SystemExit("stream soak FAILED")


if __name__ == "__main__":
    main()
