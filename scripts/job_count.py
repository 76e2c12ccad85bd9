"""Count Spark JOBS a registry query costs end-to-end (build + count).

Usage: python scripts/job_count.py [sf_dir] query [query ...]

Eager builders (trainer loops, checkpoint pins) run jobs during
DataFrame CONSTRUCTION, which per-frame explain output never shows —
this probe is the evidence for optimizations whose win is "fewer
jobs", not a final-plan diff: it tags a job group around the full
fn(spark, sf_dir) + .count() and reports how many jobs the group ran.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(root, "__spark_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from rust_graph_db_spark import get_spark

    spark = get_spark("job_count")
    qs = entry.queries()
    sc = spark.sparkContext
    for name in names:
        group = f"jc_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        print(f"{name}: {len(jobs)} jobs, {dt:.2f}s, {n} rows")


if __name__ == "__main__":
    main()
