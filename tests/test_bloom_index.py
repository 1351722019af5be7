"""Per-partition key Bloom index (operators/bloom_index.py): the scale
path for the partitioned upsert's moved-key check (VERDICT r03 task 8).

Covers: filter build/probe correctness (no false negatives ever — a
Bloom filter's hard guarantee), the FPP bound on honest inserts, the
end-to-end bloom-mode upsert (accepts partition-stable batches, rejects
movers with the same ValueError as the exact check), incremental index
maintenance via dynamic partition overwrite, and the plan property that
a clean probe never touches the data table.
"""

from __future__ import annotations

import glob
import os

import pytest

from formula1_etl_analytics_project_spark.operators import bloom_index as bi
from formula1_etl_analytics_project_spark.sources.sinks import (
    upsert_parquet_partitioned,
    write_parquet,
)


def _mk_table(spark, tmp_path, n=300):
    """keys 0..n-1 split across three partitions by modulo."""
    base = spark.createDataFrame(
        [(i, ["A", "B", "C"][i % 3], float(i)) for i in range(n)],
        ["k", "part", "v"],
    )
    path = str(tmp_path / "snap")
    write_parquet(base, path, partition_by=["part"])
    return path


def test_bloom_params_sizing():
    nbits, nhashes = bi.bloom_params(1000, fpp=0.001)
    assert nbits % 64 == 0
    assert 10 * 1000 < nbits < 20 * 1000  # ~14.4 bits/key at 0.1%
    assert 5 <= nhashes <= 14
    with pytest.raises(ValueError):
        bi.bloom_params(0)
    with pytest.raises(ValueError):
        bi.bloom_params(100, fpp=1.5)


def test_probe_has_no_false_negatives_and_bounded_false_positives(
    spark, tmp_path
):
    path = _mk_table(spark, tmp_path)
    bi.build_key_bloom_index(
        spark, path, ["k"], "part", expected_keys_per_partition=100, fpp=0.01
    )
    # every existing key claimed under a DIFFERENT partition must be
    # found (no false negatives): keys 0,3,6,... live in A; claim in B
    movers = spark.createDataFrame(
        [(i, "B", -1.0) for i in range(0, 300, 3)], ["k", "part", "v"]
    )
    found = bi.probe_moved_keys(spark, path, movers, ["k"], "part")
    got = {(r["k"], r["suspect_partition"]) for r in found.collect()}
    assert {(i, "A") for i in range(0, 300, 3)} <= got
    # honest brand-new keys: exact verification stage clears every
    # Bloom false positive, so the confirmed set is EMPTY
    inserts = spark.createDataFrame(
        [(i, "A", 1.0) for i in range(10_000, 10_200)], ["k", "part", "v"]
    )
    assert bi.probe_moved_keys(spark, path, inserts, ["k"], "part").count() == 0
    # same-partition updates are not moves
    updates = spark.createDataFrame(
        [(i, ["A", "B", "C"][i % 3], 2.0) for i in range(0, 300, 7)],
        ["k", "part", "v"],
    )
    assert bi.probe_moved_keys(spark, path, updates, ["k"], "part").count() == 0


def test_bloom_mode_upsert_accepts_stable_and_rejects_movers(spark, tmp_path):
    path = _mk_table(spark, tmp_path)
    bi.build_key_bloom_index(
        spark, path, ["k"], "part", expected_keys_per_partition=100
    )
    # stable batch: update k=0 in place + insert new key into A
    ok = spark.createDataFrame(
        [(0, "A", 9.0), (5000, "A", 1.0)], ["k", "part", "v"]
    )
    upsert_parquet_partitioned(
        spark, ok, path, keys=["k"], partition_col="part",
        check_moved_keys="bloom",
    )
    snap = spark.read.parquet(path)
    assert snap.filter("k = 0").head()["v"] == 9.0
    assert snap.filter("k = 5000").count() == 1
    # mover: k=1 lives in B, incoming claims C -> same ValueError as
    # the exact check
    mover = spark.createDataFrame([(1, "C", -1.0)], ["k", "part", "v"])
    with pytest.raises(ValueError, match="moves key"):
        upsert_parquet_partitioned(
            spark, mover, path, keys=["k"], partition_col="part",
            check_moved_keys="bloom",
        )
    # mover WITHIN the scanned partitions is caught by the exact leg:
    # batch touches B and C; k=1 (lives in B) claimed under C
    mover2 = spark.createDataFrame(
        [(1, "C", -1.0), (2, "C", 2.0)], ["k", "part", "v"]
    )
    with pytest.raises(ValueError, match="moves key"):
        upsert_parquet_partitioned(
            spark, mover2, path, keys=["k"], partition_col="part",
            check_moved_keys="bloom",
        )


def test_bloom_mode_requires_index(spark, tmp_path):
    path = _mk_table(spark, tmp_path)
    batch = spark.createDataFrame([(0, "A", 9.0)], ["k", "part", "v"])
    with pytest.raises(FileNotFoundError, match="build_key_bloom_index"):
        upsert_parquet_partitioned(
            spark, batch, path, keys=["k"], partition_col="part",
            check_moved_keys="bloom",
        )


def test_index_update_rewrites_only_touched_partitions(spark, tmp_path):
    path = _mk_table(spark, tmp_path)
    bi.build_key_bloom_index(
        spark, path, ["k"], "part", expected_keys_per_partition=100
    )

    def _mtimes(part):
        return {
            f: os.path.getmtime(f)
            for f in glob.glob(
                os.path.join(path, bi.BLOOM_DIR, f"part={part}", "*.parquet")
            )
        }

    before_b, before_c = _mtimes("B"), _mtimes("C")
    assert before_b and before_c
    batch = spark.createDataFrame([(6000, "A", 1.0)], ["k", "part", "v"])
    upsert_parquet_partitioned(
        spark, batch, path, keys=["k"], partition_col="part",
        check_moved_keys="bloom",
    )
    assert _mtimes("B") == before_b, "untouched partition filter rewritten"
    assert _mtimes("C") == before_c
    # the refreshed A-filter must know the new key: claiming 6000
    # under B is now a detected move
    mover = spark.createDataFrame([(6000, "B", -1.0)], ["k", "part", "v"])
    with pytest.raises(ValueError, match="moves key"):
        upsert_parquet_partitioned(
            spark, mover, path, keys=["k"], partition_col="part",
            check_moved_keys="bloom",
        )


def test_clean_probe_plan_never_scans_the_data_table(spark, tmp_path):
    """The point of the index: a batch of honest inserts whose probe
    comes back all-negative must decide WITHOUT reading the data table
    (the exact check's full key-projection scan is exactly what the
    index removes). Clean probes skip stage 4, so the only parquet
    reads are the sidecar's."""
    path = _mk_table(spark, tmp_path)
    bi.build_key_bloom_index(
        spark, path, ["k"], "part", expected_keys_per_partition=100, fpp=0.001
    )
    inserts = spark.createDataFrame(
        [(i, "A", 1.0) for i in range(20_000, 20_050)], ["k", "part", "v"]
    )
    result = bi.probe_moved_keys(spark, path, inserts, ["k"], "part")
    assert result.count() == 0
    plan = result._jdf.queryExecution().executedPlan().toString()
    # location strings truncate in toString(), so distinguish scans by
    # ReadSchema: the sidecar reads (word_idx, word); a data-table scan
    # would read the key column k. Every parquet scan in a clean probe
    # must be a sidecar scan.
    import re

    schemas = re.findall(r"ReadSchema: (struct<[^>]*>)", plan)
    assert any("word" in s for s in schemas), (
        f"expected sidecar parquet scans in:\n{plan[:2000]}"
    )
    for s in schemas:
        # struct<> = a partition-values-only scan (no data columns);
        # any scan reading the key column k is the data table
        assert "k:" not in s, (
            f"all-negative probe read the data table ({s}):\n{plan[:2000]}"
        )
