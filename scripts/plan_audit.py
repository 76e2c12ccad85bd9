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

    import contextlib
    import io

    for name in names:
        # ONE build per query, under AQE off: the static formatted plan
        # shows the same exchanges/pushdown/scan evidence, and
        # explain("codegen") on the same frame reports the WholeStage
        # span count AQE's pre-execution plan hides. A single build
        # matters because some builders run eager jobs (checkpoint
        # loops) or commit to a store — they must not run twice per
        # audit row.
        aqe_was = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            buf2 = io.StringIO()
            with contextlib.redirect_stdout(buf2):
                df.explain("codegen")
            m = re.search(r"Found (\d+) WholeStageCodegen", buf2.getvalue())
            n_codegen = int(m.group(1)) if m else -1
        except Exception as e:                      # noqa: BLE001
            print(f"== {name}: ERROR {e}")
            continue
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        part = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        schemas = re.findall(r"ReadSchema: (\S+)", plan)
        n_exchange = len(set(re.findall(r"\((\d+)\) Exchange", plan)))
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

    _audit_bucketed_store(spark, sf_dir)


def _audit_bucketed_store(spark, sf_dir: str) -> None:
    """Reproduce the SCALE.md §1 bucketed-store claim: the expand join
    off a `save_graph(buckets=N)` snapshot is Exchange-free, and the
    full 1-hop Cypher plan drops from 4 Exchanges (unbucketed, no
    broadcast) to 1 — the structural minimum for the V⋈E⋈V chain,
    whose intermediate must be re-keyed from src to dst."""
    import contextlib
    import io
    import re
    import tempfile

    from rust_graph_db_spark.graphs import knows_graph
    from rust_graph_db_spark.storage import load_graph, save_graph

    def n_ex(df) -> int:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return len(set(re.findall(r"\((\d+)\) Exchange", buf.getvalue())))

    g = knows_graph(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="plan_audit_store_") + "/store"
    save_graph(g, root, buckets=8)
    gb = load_graph(spark, root)
    q = ("MATCH (a:Person)-[r:KNOWS]->(b:Person) WHERE r.since = 2021 "
         "RETURN a.name AS an, b.name AS bn")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        v, e = gb.vertex_frame("Person"), gb.edge_frame("KNOWS")
        print("== bucketed_store (save_graph(buckets=8) -> load_graph)")
        print(f"   raw expand join exchanges={n_ex(e.join(v, e['src'] == v['id']))}"
              " (bucketed SMJ; 0 = co-located)")
        print(f"   1-hop cypher exchanges: bucketed={n_ex(gb.cypher(q))} "
              f"unbucketed={n_ex(g.cypher(q))}")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


if __name__ == "__main__":
    main()
