"""Multi-dimensional data layout: Z-order (Morton) clustering.

Why this exists at 100 TB: parquet scans prune on per-row-group
min/max statistics. Sorting a table by ONE column makes that column's
ranges tight but leaves every other column's ranges spanning the whole
domain - a filter on the second column prunes nothing. Interleaving
the bits of two (or more) columns into a single Morton key and sorting
by IT gives every participating column locally-bounded ranges in every
file, so a conjunctive filter on ANY subset of the dimensions skips
most row groups. This is the same layout trick Delta Lake's OPTIMIZE
ZORDER BY applies; here it is plain ``repartitionByRange`` + a bit-
interleave expression, no table format required.

The key is computed with built-in integer expressions (shiftright /
% / *) - JVM-codegen'd, no UDF - and is dropped before the write, so
the files carry only user columns.

Reference scope note: the reference's only layout decision is two
single-column MSSQL indexes (``DDL Final.sql:230-231``); Z-order is
the columnar-scan-era generalization of "index the two columns you
filter on".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(cols: list[Column | str], bits: int = 12) -> Column:
    """Morton key: interleave the low ``bits`` bits of each column.

    Columns must be non-negative integers (callers bucket/offset
    first); values >= 2**bits wrap via modulo, which only weakens
    clustering for outliers - never correctness, since the key is a
    layout hint, not data. With ``d`` columns the key uses
    ``d * bits`` bits; keep that under 63.
    """
    ncols = [F.col(c) if isinstance(c, str) else c for c in cols]
    if len(ncols) * bits > 63:
        raise ValueError("interleaved key would exceed 63 bits")
    z = F.lit(0).cast("long")
    for ci, col in enumerate(ncols):
        v = col.cast("long") % (2**bits)
        for b in range(bits):
            bit = F.shiftright(v, b) % 2
            z = z + bit * (2 ** (b * len(ncols) + ci))
    return z


def zorder_sql(cols: list[str], bits: int = 12) -> str:
    """DuckDB-SQL twin of :func:`zorder_key`, term-for-term (integer
    shifts and adds only), so an oracle can restate the exact key."""
    terms = []
    for ci, c in enumerate(cols):
        v = f"(CAST({c} AS BIGINT) % {2**bits})"
        for b in range(bits):
            terms.append(
                f"((({v} // {2**b}) % 2) * {2 ** (b * len(cols) + ci)})"
            )
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[Column | str],
    bits: int = 12,
    num_files: int = 8,
) -> None:
    """Write ``df`` clustered on the Morton key of ``cols``.

    ``repartitionByRange`` on the key gives each output file a
    contiguous Morton range (a small hyper-rectangle soup rather than
    a full-domain slice), and the within-partition sort tightens
    row-group stats inside each file. Readers need nothing special:
    plain min/max pruning on the ORIGINAL columns now works for
    filters on any clustered dimension.
    """
    keyed = df.withColumn("__z", zorder_key(cols, bits))
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
