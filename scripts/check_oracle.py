"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 through Spark AND its
``oracle_sql()`` through DuckDB, then compares row count, schema width,
and an order-insensitive value hash (columns sorted by name, rows sorted,
floats rounded). Mirrors what CORRECTNESS_r{N}.json records.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Oracles valid only below a vertex/scale bound, by design: g18's
# default flips to the Brandes-Pich SAMPLED estimator above 4096
# vertices (graph_algos size gate), while its oracle is the exact
# closed form — matching is the contract at the driver's sf0.01, not
# beyond. x7's integer-exact revenue stays order-independent only
# while the per-nation sum of ~1e9-sized integer products fits in
# 2^53 (~9e6 lineitems/nation ≈ SF 35; bounded at 10 with margin).
# Maps query -> max sf_dir suffix the oracle is exact at.
SF_BOUNDED = {"g18_betweenness": 0.01, "x7_revenue_by_nation": 10}


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr = shortest round-trip representation: bit-level strict,
        # at least as strict as the driver's canonicalizer. r3 (list
        # cells) and r4 (c6 midpoint at the 7th significant digit) both
        # slipped past the former "%.6g" while the driver caught them —
        # local green must PREDICT driver green, so over-strict beats
        # over-permissive.
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py")
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from rust_graph_db_spark import get_spark
    spark = get_spark("check-oracle")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    import os
    import re as _re

    # Strict parse: the LAST path component must be exactly sf<number>
    # (e.g. /root/testdata/sf0.1). Anything else -> None + a visible
    # warning, so SF_BOUNDED never silently mis-fires on exotic paths.
    m = _re.fullmatch(r"sf(\d+(?:\.\d+)?)",
                      os.path.basename(sf_dir.rstrip("/")))
    sf_val = float(m.group(1)) if m else None
    if sf_val is None and SF_BOUNDED:
        print(f"WARNING: cannot parse scale factor from {sf_dir!r}; "
              f"SF_BOUNDED skips disabled — {sorted(SF_BOUNDED)} may "
              "report spurious mismatches above their bounds")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if (name in SF_BOUNDED and sf_val is not None
                and sf_val > SF_BOUNDED[name]):
            print(f"skip {name}: oracle exact only at sf <= "
                  f"{SF_BOUNDED[name]} (see SF_BOUNDED)")
            continue
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(rows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs {len(orows)}")
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols {sorted(cols)} vs {sorted(ocols)}")
        else:
            hs, ho = value_hash(rows, cols), value_hash(orows, ocols)
            if hs != ho:
                problems.append(f"hash {hs} vs {ho}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
            # sample diff: first rows present on only one side (each
            # side rendered in ITS OWN name-sorted column order)
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            ss = {"|".join(_norm(r[i]) for i in order) for r in rows}
            oo = {"|".join(_norm(r[i]) for i in oorder) for r in orows}
            for side, only_rows in (("spark", ss - oo),
                                    ("oracle", oo - ss)):
                for ln in sorted(only_rows)[:3]:
                    print(f"  only-{side}: {ln}")
        else:
            print(f"ok {name}: {len(rows)} rows")
    print(f"\n{len(failures)} failures" + (": " + ", ".join(failures)
                                           if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
