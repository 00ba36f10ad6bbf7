"""Pinned per-query re-measure harness (measurement hygiene for
per-query bench anomalies — e.g. the round-2 flatten-trio 10x swing on
byte-identical code and data).

Protocol: one subprocess taskset-pinned to a fixed core set, JIT warmup
run per query (untimed), then R timed rounds visiting the queries
ROUND-ROBIN (so a slow host phase hits all of them, not one), reporting
per-query best/median/max. A pure-CPU control (π-ish summation) runs
before and after to quantify host steal during the window.

Usage: python BENCH/pinned_queries.py [--queries a,b,c] [--rounds 5]
       [--cores 0-7] [--sf-dir /root/testdata/sf0.1]
Writes BENCH/pinned_queries_results.json and prints a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from picsure_dictionary_etl_spark.session import get_spark
import __spark_entry__ as entry

names = {names!r}
rounds = {rounds}
sf_dir = {sf_dir!r}

def cpu_control():
    t0 = time.monotonic()
    s = 0.0
    for i in range(1, 4_000_000):
        s += 1.0 / (i * i)
    return time.monotonic() - t0

ctl_before = cpu_control()
spark = get_spark("pinned-q", master="local[{cpus}]", shuffle_partitions=32)
qs = entry.queries()
for n in names:            # untimed JIT warmup, one pass
    qs[n](spark, sf_dir).count()
times = {{n: [] for n in names}}
for r in range(rounds):    # round-robin so host phases hit all queries
    for n in names:
        t0 = time.monotonic()
        qs[n](spark, sf_dir).count()
        times[n].append(round(time.monotonic() - t0, 3))
ctl_after = cpu_control()
print("RESULT " + json.dumps(
    {{"times": times, "cpu_control_sec": [round(ctl_before, 3), round(ctl_after, 3)]}}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="flatten_categorical,flatten_continuous,first_wins_pick")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--cores", default="0-7")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    names = args.queries.split(",")

    code = WORKER.format(
        repo=REPO, names=names, rounds=args.rounds, sf_dir=args.sf_dir, cpus=args.cpus
    )
    out = subprocess.run(
        ["taskset", "-c", args.cores, sys.executable, "-c", code],
        capture_output=True, text=True, check=True,
    )
    line = next(l for l in out.stdout.splitlines() if l.startswith("RESULT "))
    res = json.loads(line[len("RESULT "):])
    summary = {
        "queries": {
            n: {
                "best": min(ts),
                "median": sorted(ts)[len(ts) // 2],
                "max": max(ts),
                "all": ts,
            }
            for n, ts in res["times"].items()
        },
        "cpu_control_sec": res["cpu_control_sec"],
        "cores": args.cores,
        "rounds": args.rounds,
        "sf_dir": args.sf_dir,
    }
    with open(os.path.join(HERE, "pinned_queries_results.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
