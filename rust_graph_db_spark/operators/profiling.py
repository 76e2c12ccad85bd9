"""Dataset profiling: per-column statistics in one aggregation pass.

The data-quality summary a pipeline runs before training on a new
corpus drop (the deequ/TFDV shape) — extension operator, the reference
has no statistics surface. One wide ``agg`` computes every metric, so
the corpus is scanned ONCE regardless of column count; the result is
columns × metrics (tiny). ``exact=False`` (default) uses HLL++ for
distinct counts — the 100 TB path; ``exact=True`` is the oracle path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile(df: DataFrame, columns=None, exact: bool = False,
            mean_decimals: int = 6) -> DataFrame:
    """Per-column profile: ``(column, n_rows, nulls, distinct, vmin,
    vmax, mean)``. ``vmin``/``vmax`` are stringified (mixed types in one
    output column); ``mean`` is NULL for non-numeric columns. Complex
    columns (arrays/maps/structs/binary) report counts only.
    """
    if columns is not None:
        missing = set(columns) - {f_.name for f_ in df.schema.fields}
        if missing:
            raise ValueError(f"profile: unknown columns {sorted(missing)}")
    fields = [f_ for f_ in df.schema.fields
              if columns is None or f_.name in set(columns)]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for f_ in fields:
        c, name = F.col(f_.name), f_.name
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"_nul_{name}"))
        simple = not isinstance(
            f_.dataType, (T.ArrayType, T.MapType, T.StructType,
                          T.BinaryType))
        if simple:
            d = (F.count_distinct(c) if exact
                 else F.approx_count_distinct(c))
            aggs.append(d.alias(f"_dst_{name}"))
            aggs.append(F.min(c).cast("string").alias(f"_min_{name}"))
            aggs.append(F.max(c).cast("string").alias(f"_max_{name}"))
        else:
            aggs.append(F.lit(None).cast("long").alias(f"_dst_{name}"))
            aggs.append(F.lit(None).cast("string").alias(f"_min_{name}"))
            aggs.append(F.lit(None).cast("string").alias(f"_max_{name}"))
        if isinstance(f_.dataType, (T.FloatType, T.DoubleType,
                                    T.DecimalType)):
            # Float sums are order-sensitive; round to absorb last-ulp
            # differences between summation orders / engines.
            aggs.append(F.round(F.avg(c), mean_decimals)
                        .alias(f"_avg_{name}"))
        elif isinstance(f_.dataType, _NUMERIC):
            # avg() of an integer column is a bit-identical quotient of
            # exact integer aggregates in every engine — rounding it
            # (decimal HALF_UP in Spark vs binary-double in DuckDB)
            # splits systematically at exact decimal midpoints, so the
            # value is emitted unrounded (see SURVEY §2.12 harness
            # quirk; same class as the g22 closeness fix).
            aggs.append(F.avg(c).alias(f"_avg_{name}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"_avg_{name}"))
    row = df.agg(*aggs).first()
    out = [(f_.name, int(row["_n"]), int(row[f"_nul_{f_.name}"]),
            row[f"_dst_{f_.name}"], row[f"_min_{f_.name}"],
            row[f"_max_{f_.name}"], row[f"_avg_{f_.name}"])
           for f_ in fields]
    return df.sparkSession.createDataFrame(
        out, "column STRING, n_rows BIGINT, nulls BIGINT, distinct BIGINT, "
             "vmin STRING, vmax STRING, mean DOUBLE")
