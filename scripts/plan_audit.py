"""Physical-plan audit for the headline queries: for each, print the
scan-level evidence (PushedFilters / PartitionFilters / ReadSchema),
exchange count, and whole-stage-codegen span count.

Usage: python scripts/plan_audit.py [sf_dir] [query ...]

This is the reproducible form of the plan claims in SCALE.md — run it
after changing an operator to confirm the plan still has the shape you
want (filters reaching parquet, no stray exchanges, wide codegen spans)
instead of trusting wall-clock, which is ±40% noise on this VM.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(root, "__spark_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from rust_graph_db_spark import get_spark

    spark = get_spark("plan_audit")
    qs = entry.queries()
    if not names:
        names = [n for n in qs]

    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:                      # noqa: BLE001
            print(f"== {name}: ERROR {e}")
            continue
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        part = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        schemas = re.findall(r"ReadSchema: (\S+)", plan)
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        # NOTE: under AQE the formatted plan is pre-execution, so
        # WholeStageCodegen spans usually show as 0 here; exchange
        # counts, pushdown and join strategy are the durable signals.
        n_codegen = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
        n_bnlj = len(re.findall(r"BroadcastNestedLoopJoin", plan))
        n_cart = len(re.findall(r"CartesianProduct", plan))
        print(f"== {name}")
        print(f"   exchanges={n_exchange} codegen_spans={n_codegen} "
              f"nested_loop={n_bnlj} cartesian={n_cart}")
        for s in schemas[:4]:
            print(f"   ReadSchema {s[:100]}")
        for p in [x for x in pushed if x][:4]:
            print(f"   PushedFilters [{p[:100]}]")
        for p in [x for x in part if x][:4]:
            print(f"   PartitionFilters [{p[:100]}]")


if __name__ == "__main__":
    main()
