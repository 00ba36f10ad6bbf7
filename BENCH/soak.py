"""Sustained-throughput soak: replay a large staged change stream in
micro-batches on local[32], record per-batch lineage throughput, and
verify the final table EXACTLY equals an independent DuckDB LWW oracle
over the staged events (the north rule's final-state-equality check at
scale). No crash injection — that's BENCH/chaos.py; this measures the
steady state: no batch-over-batch degradation, disk O(live state).

Usage: python BENCH/soak.py [--events 64000000] [--batches 8]
Writes BENCH/soak_results.json and prints a summary.
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

STAGE = r"""
import sys
sys.path.insert(0, {repo!r})
from picsure_dictionary_etl_spark.session import get_spark
from picsure_dictionary_etl_spark.cdc.generator import change_events
spark = get_spark("soak-stage", master="local[32]", shuffle_partitions=32)
change_events(spark, {n_events}, n_convs={n_events} // 200, delete_ratio=0.05,
              hot_fraction=0.2, malformed_ratio=0.01
              ).write.mode("overwrite").parquet({events!r})
"""

RUN = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from picsure_dictionary_etl_spark.session import get_spark
from picsure_dictionary_etl_spark.cdc.runner import CdcRunner, RunnerConfig
spark = get_spark("soak", master="local[32]", shuffle_partitions=32)
events = spark.read.parquet({events!r})
r = CdcRunner(spark, RunnerConfig(table_root={root!r}, bucket_count=32,
                                  auto_salt=True, vacuum_every=4,
                                  lineage_path={lineage!r}))
# JIT warmup on a small out-of-band replay, then the measured run
warm = CdcRunner(spark, RunnerConfig(table_root={root!r} + "-warm", bucket_count=8))
warm.replay(events.limit(200000), lsn_step=200000)
t0 = time.time()
r.replay(events, lsn_step={step})
wall = time.time() - t0
print("RUN " + json.dumps({{"wall_sec": round(wall, 2),
                            "events_per_sec": round({n_events} / wall, 1)}}),
      flush=True)
"""

CHECK = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
import duckdb
from picsure_dictionary_etl_spark.session import get_spark
from picsure_dictionary_etl_spark.cdc.runner import CdcRunner, RunnerConfig
spark = get_spark("soak-check", master="local[32]", shuffle_partitions=32)
r = CdcRunner(spark, RunnerConfig(table_root={root!r}, bucket_count=32))
n = r.state().count()
want = duckdb.sql('''
WITH valid AS (
  SELECT * FROM '{events}/*.parquet'
  WHERE conv_id IS NOT NULL AND lower(trim(conv_id)) <> 'null' AND trim(conv_id) <> ''
    AND turn_idx IS NOT NULL AND turn_idx >= 0 AND _lsn IS NOT NULL AND _op IN ('I','U','D')
), w AS (SELECT conv_id, turn_idx, arg_max(_op, _lsn) op FROM valid GROUP BY 1,2)
SELECT count(*) FROM w WHERE op <> 'D' ''').fetchone()[0]
disk = 0
for dp, _d, fs in os.walk({root!r}):
    disk += sum(os.path.getsize(os.path.join(dp, f)) for f in fs)
print("CHECK " + json.dumps({{"engine_rows": n, "oracle_rows": want,
                              "match": n == want,
                              "disk_mb": round(disk / 1e6, 1)}}), flush=True)
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=64_000_000)
    ap.add_argument("--batches", type=int, default=8)
    args = ap.parse_args()

    wd = tempfile.mkdtemp(prefix="soak_")
    events, root = os.path.join(wd, "events"), os.path.join(wd, "table")
    lineage = os.path.join(wd, "lineage.jsonl")
    step = args.events // args.batches

    def run(code: str) -> str:
        p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, check=True)
        return p.stdout

    run(STAGE.format(repo=REPO, n_events=args.events, events=events))
    out = run(RUN.format(repo=REPO, events=events, root=root,
                         lineage=lineage, step=step, n_events=args.events))
    run_res = json.loads(next(
        l for l in out.splitlines() if l.startswith("RUN "))[4:])
    out = run(CHECK.format(repo=REPO, events=events, root=root))
    check_res = json.loads(next(
        l for l in out.splitlines() if l.startswith("CHECK "))[6:])

    batches = []
    with open(lineage, encoding="utf-8") as f:
        for line in f:
            d = json.loads(line)
            if "rows_per_sec" in d:
                batches.append({k: d.get(k) for k in
                                ("version", "rows_in", "winners",
                                 "rows_per_sec", "commit_seconds")})
    summary = {
        "events": args.events, "batches": args.batches, **run_res,
        **check_res, "per_batch": batches,
    }
    with open(os.path.join(HERE, "soak_results.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "per_batch"},
                     indent=2))
    import shutil

    shutil.rmtree(wd, ignore_errors=True)
    assert check_res["match"], "final state diverged from the oracle"


if __name__ == "__main__":
    main()
