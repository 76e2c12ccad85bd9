"""Cross-engine deterministic hashing.

``xxhash64`` is the fast JVM-side hash for production paths, but it
has no DuckDB equivalent, so every operator that needs an oracle-
replayable hash uses THIS construction instead:

    md5_long(key) = int(md5(key)[:15 hex chars], 16)

a positive 60-bit BIGINT computable bit-identically in

- Spark:  ``conv(substring(md5(key), 1, 15), 16, 10)`` (this helper),
- DuckDB: ``('0x' || substr(md5(key), 1, 15))::BIGINT``.

(DuckDB's ``md5_number_lower`` is little-endian and does NOT match a
big-endian hex parse — avoid it.) Consumers: the md5 walk modes
(``graph_algos._walk_choice_hash``), MIS priorities
(``graph_algos.maximal_independent_set``), DSIR feature buckets and
Gumbel uniforms (``operators/dsir.py``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DuckDB twin of :func:`md5_long`, for oracle docstrings/builders:
#: ``('0x' || substr(md5(<key>), 1, 15))::BIGINT``
MD5_LONG_SQL = "('0x' || substr(md5({key}), 1, 15))::BIGINT"


def md5_long(key: Column) -> Column:
    """60-bit positive BIGINT hash of a string column — the
    oracle-replayable deterministic hash (see module docstring)."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def md5_key(*parts) -> Column:
    """Canonical colon-joined hash key: every part cast to string and
    joined with ':' — both engines render ints identically, so
    ``md5_key(F.lit(7), col)`` equals DuckDB ``'7:' || col``."""
    return F.concat_ws(":", *[p.cast("string") for p in parts])
