"""Partitioned fact-scale MERGE: only touched partitions are read and
rewritten; untouched partition files stay byte-identical on disk."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from formula1_etl_analytics_project_spark.sources.sinks import (
    upsert_parquet_partitioned,
    write_parquet,
)


def _files(path: str, part: str) -> dict[str, float]:
    out = {}
    for f in glob.glob(os.path.join(path, part, "*.parquet")):
        out[f] = os.path.getmtime(f)
    return out


def test_partitioned_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, "A" if i < 50 else "B", float(i)) for i in range(100)],
        ["k", "part", "v"],
    )
    path = str(tmp_path / "snap")
    write_parquet(base, path, partition_by=["part"])

    before_a = _files(path, "part=A")
    before_b = _files(path, "part=B")
    assert before_a and before_b

    # incoming touches only partition A: update k=10, insert k=1000
    incoming = spark.createDataFrame(
        [(10, "A", 999.0), (1000, "A", 111.0)], ["k", "part", "v"]
    )
    upsert_parquet_partitioned(spark, incoming, path, keys=["k"], partition_col="part")

    after = spark.read.parquet(path)
    assert after.count() == 101
    got = {r["k"]: r["v"] for r in after.filter(F.col("k").isin(10, 1000, 60)).collect()}
    assert got == {10: 999.0, 1000: 111.0, 60: 60.0}
    # partition B files untouched (same paths, same mtimes)
    assert _files(path, "part=B") == before_b
    # partition A rewritten
    assert _files(path, "part=A") != before_a


def test_partitioned_upsert_detects_cross_partition_key_move(spark, tmp_path):
    """ADVICE r02: an incoming row whose key exists under a DIFFERENT
    partition value would be silently duplicated by dynamic overwrite
    (the old partition is never rewritten). The default check must
    refuse the batch before any write."""
    import pytest

    base = spark.createDataFrame(
        [(1, "A", 1.0), (2, "B", 2.0)], ["k", "part", "v"]
    )
    path = str(tmp_path / "snap3")
    write_parquet(base, path, partition_by=["part"])
    moved = spark.createDataFrame([(2, "A", 9.0)], ["k", "part", "v"])
    with pytest.raises(ValueError, match="across partitions"):
        upsert_parquet_partitioned(
            spark, moved, path, keys=["k"], partition_col="part"
        )
    # nothing was written: snapshot unchanged
    rows = {r["k"]: (r["part"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert rows == {1: ("A", 1.0), 2: ("B", 2.0)}
    # opt-out path still writes (caller owns the invariant)
    upsert_parquet_partitioned(
        spark, moved, path, keys=["k"], partition_col="part",
        check_moved_keys=False,
    )
    assert spark.read.parquet(path).count() == 3  # the documented dup
    # partition_col inside keys: a "moved" key is a new key - no check,
    # no raise, straight merge
    base2 = str(tmp_path / "snap4")
    write_parquet(base, base2, partition_by=["part"])
    upsert_parquet_partitioned(
        spark, moved, base2, keys=["k", "part"], partition_col="part"
    )
    assert spark.read.parquet(base2).count() == 3


def test_partitioned_upsert_keep_last_on_duplicate_incoming(spark, tmp_path):
    base = spark.createDataFrame([(1, "A", 1.0, 0)], ["k", "part", "v", "seq"])
    path = str(tmp_path / "snap2")
    write_parquet(base, path, partition_by=["part"])
    incoming = spark.createDataFrame(
        [(1, "A", 5.0, 1), (1, "A", 7.0, 2)], ["k", "part", "v", "seq"]
    )
    upsert_parquet_partitioned(
        spark, incoming, path, keys=["k"], partition_col="part", order_col="seq"
    )
    rows = spark.read.parquet(path).collect()
    assert len(rows) == 1 and rows[0]["v"] == 7.0
