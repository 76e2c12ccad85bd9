"""Dump `.explain("formatted")` for registry queries to files.

Usage: python scripts/dump_plans.py <out_dir> <suffix> [sf_dir] [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (suffix is
"before" / "after" for the optimization-round evidence trail). AQE is
disabled for the dump so the static plan shows the real Exchange
placement instead of one opaque AdaptiveSparkPlan node.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = rest[0] if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.01"
    names = rest[1:] if rest and os.path.isdir(rest[0]) else rest

    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(root, "__spark_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from rust_graph_db_spark import get_spark

    spark = get_spark("dump_plans")
    qs = entry.queries()
    if not names:
        names = list(qs)
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as e:                      # noqa: BLE001
            print(f"== {name}: ERROR {e}")
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")


if __name__ == "__main__":
    main()
