"""Round-7 catalog entries: the remaining large-scale-pipeline
primitives — degree-oriented distributed triangle counting (graph
analytics beyond the iterative PageRank surface), the hashing-trick
featurizer (vocabulary-free text vectorization), a mergeable-sketch
rollup gate (HLL re-aggregation, the store-sketches-not-raw pattern),
sliding-window distinct counts via contribution explode (the
decomposable form of a non-decomposable aggregate), and an
order-insensitive table fingerprint (replication / backfill
validation).

Every entry follows the portability rules from plans/catalog.py:
md5 for hashes (identical across engines, unlike murmur3 ``hash()``),
integer / decimal arithmetic for cross-engine bit-exactness, unique
tiebreaks under every LIMIT.

Importing this module registers everything into catalog.CATALOG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from formula1_etl_analytics_project_spark.functions.text import (
    hashed_feature,
    normalize,
    tokens,
)
from formula1_etl_analytics_project_spark.operators.aggregates import (
    table_fingerprint,
)
from formula1_etl_analytics_project_spark.operators.graph import triangle_counts
from formula1_etl_analytics_project_spark.plans.catalog import _register
from formula1_etl_analytics_project_spark.sources.readers import read_table

# ===========================================================================
# Triangle counting (degree-oriented wedge closing)
# ===========================================================================

_TRIANGLE_SQL = """
WITH inst AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pr AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM inst a JOIN inst b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), edges AS (
  SELECT u, v FROM pr GROUP BY u, v HAVING COUNT(*) >= 2
), tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
), nodes AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node, COUNT(*) AS n_triangles FROM nodes GROUP BY node
"""


@_register("triangle_count", _TRIANGLE_SQL, tags=("analytics", "graph"), bench=True)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the co-purchase graph (parts
    linked when they appear in >= 2 common orders — the >=2 support
    threshold is what keeps the graph sparse as data grows: singleton
    co-occurrences dominate the pair space at scale but carry no
    affinity signal).

    The pair expansion reuses the aggregated-basket shape of
    ``supplier_cooccurrence`` (quadratic only within one order,
    bounded by the per-order line count); the triangle enumeration is
    ``operators.graph.triangle_counts`` — edges oriented
    low-(degree,id) -> high, wedge self-join on the apex, closed
    against the oriented edge list, so each triangle is found exactly
    once and per-node wedge fan-out is O(sqrt(m)) even under hub
    skew. The oracle restates it as the textbook ordered 3-way
    self-join, which is only affordable because the oracle runs at
    test scale; the oriented form is the one that survives 100 TB.
    """
    li = read_table(spark, sf_dir, "lineitem", spread=True)
    sets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ps",
                    lambda x, i: F.transform(
                        F.slice(
                            "ps", i + 2, F.greatest(F.size("ps") - i - 1, F.lit(0))
                        ),
                        lambda y: F.struct(x.alias("u"), y.alias("v")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.u", "p.v")
    edges = (
        pairs.groupBy("u", "v")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    return triangle_counts(edges)


# ===========================================================================
# Hashing-trick featurizer (vocabulary-free text vectorization)
# ===========================================================================

_FEATURE_HASH_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(list_filter(string_split(
           lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
           x -> x <> '')) AS tok
  FROM documents
), feats AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS feat_idx,
         COUNT(*) AS cnt
  FROM toks GROUP BY doc_id, feat_idx
)
SELECT doc_id,
       COUNT(*) AS nnz,
       list(feat_idx ORDER BY feat_idx) AS idxs,
       list(cnt ORDER BY feat_idx) AS vals
FROM feats GROUP BY doc_id
"""


@_register("feature_hashing", _FEATURE_HASH_SQL, tags=("text", "ml"))
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bag-of-words: each doc becomes a 64-dim sparse
    count vector (parallel ``idxs``/``vals`` arrays sorted by index)
    with the feature index a pure md5 function of the token —
    ``functions.text.hashed_feature``.

    This is the featurizer that scales: NO vocabulary pass, no
    driver-side dictionary, no broadcast — a 100 TB corpus
    vectorizes in one narrow projection + one (doc_id, idx) hash-agg,
    where a vocab-indexed pipeline needs a global distinct + join
    first and a hot vocabulary breaks the broadcast. Collisions are
    the accepted trade (dim=64 keeps them visible at test scale; a
    real run uses 2^18+).
    """
    docs = read_table(spark, sf_dir, "documents", spread=True)
    feats = (
        docs.select("doc_id", F.explode(tokens(normalize("text"))).alias("tok"))
        .select("doc_id", hashed_feature("tok", 64))
        .groupBy("doc_id", "feat_idx")
        .agg(F.count("*").alias("cnt"))
    )
    packed = feats.groupBy("doc_id").agg(
        F.count("*").alias("nnz"),
        F.array_sort(F.collect_list(F.struct("feat_idx", "cnt"))).alias("s"),
    )
    return packed.select(
        "doc_id",
        "nnz",
        F.transform("s", lambda x: x.getField("feat_idx")).alias("idxs"),
        F.transform("s", lambda x: x.getField("cnt")).alias("vals"),
    )


# ===========================================================================
# Mergeable-sketch rollup gate (HLL re-aggregation)
# ===========================================================================

_SKETCH_GATE_SQL = """
SELECT CAST(NULL AS VARCHAR) AS event_type,
       CAST(NULL AS VARCHAR) AS kind,
       CAST(NULL AS DOUBLE) AS exact_val,
       CAST(NULL AS DOUBLE) AS approx_val
WHERE FALSE
"""


@_register("sketch_rollup_gate", _SKETCH_GATE_SQL, tags=("agg", "approx"))
def q_sketch_rollup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy + mergeability gate for Datasketches HLL: per
    (event_type, day) sketches of user_id are hll_union_agg'd up to
    event_type and must (a) estimate within 10% of the exact distinct
    count and (b) match the direct whole-column sketch EXACTLY —
    HLL registers merge by max, so union-of-daily and
    sketch-of-everything are the same sketch, bit for bit. Violating
    groups are emitted; the expected — and asserted — result is
    empty.

    Property (b) is the one that matters at 100 TB: it licenses
    storing one tiny sketch per partition/day and answering any
    rollup (week, month, all-time, ad-hoc segment union) by merging
    sketches — never rescanning raw data. approx_count_distinct
    gives an estimate but NOT a persistable, re-mergeable state;
    the sketch column is the warehouse pattern.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    rolled = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("rolled_nd")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_nd"),
        F.countDistinct("user_id").alias("exact_nd"),
    )
    g = rolled.join(direct, "event_type")
    acc_bad = g.where(
        F.abs(F.col("rolled_nd") - F.col("exact_nd"))
        > 0.10 * F.col("exact_nd")
    ).select(
        "event_type",
        F.lit("ndv_err").alias("kind"),
        F.col("exact_nd").cast("double").alias("exact_val"),
        F.col("rolled_nd").cast("double").alias("approx_val"),
    )
    merge_bad = g.where(F.col("rolled_nd") != F.col("direct_nd")).select(
        "event_type",
        F.lit("rollup_mismatch").alias("kind"),
        F.col("direct_nd").cast("double").alias("exact_val"),
        F.col("rolled_nd").cast("double").alias("approx_val"),
    )
    return acc_bad.unionByName(merge_bad)


# ===========================================================================
# Sliding-window distinct counts (contribution explode)
# ===========================================================================

_SLIDING_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), days AS (
  SELECT DISTINCT d FROM ud
), contrib AS (
  SELECT ud.user_id, ud.d + CAST(g.i AS INTEGER) AS win_day
  FROM ud CROSS JOIN generate_series(0, 6) AS g(i)
)
SELECT win_day, COUNT(DISTINCT user_id) AS n_users_7d
FROM contrib
WHERE win_day IN (SELECT d FROM days)
GROUP BY win_day
"""


@_register("sliding_distinct_users", _SLIDING_SQL, tags=("window", "agg"))
def q_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day. COUNT(DISTINCT) over a
    sliding frame does NOT decompose — a window-function RANGE frame
    cannot partial-aggregate and a naive approach rescans the fact 7x.
    The decomposable form: reduce to distinct (user, day) pairs first
    (one shuffle, map-side combinable), explode each pair into the
    <= 7 window days it contributes to, then one count-distinct per
    window day. The fact table is scanned ONCE; the explode happens
    on the already-collapsed pair set, which is bounded by
    users x days, not by event volume — at 100 TB of events the pair
    set is orders of magnitude smaller than the raw scan. Window days
    are clipped to days observed in the data (semi-join), so leading
    edges past the last event date are not emitted.
    """
    ev = read_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    days = ud.select("d").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "d",
    ).select("user_id", F.date_add("d", F.col("i")).alias("win_day"))
    return (
        contrib.join(days.withColumnRenamed("d", "win_day"), "win_day", "semi")
        .groupBy("win_day")
        .agg(F.countDistinct("user_id").alias("n_users_7d"))
    )


# ===========================================================================
# Order-insensitive table fingerprint (replication validation)
# ===========================================================================

_CHECKSUM_SQL = r"""
WITH canon AS (
  SELECT concat_ws('|',
    coalesce(CAST(o_orderkey AS VARCHAR), '\N'),
    coalesce(CAST(o_custkey AS VARCHAR), '\N'),
    coalesce(o_orderstatus, '\N'),
    coalesce(CAST(CAST(o_totalprice AS DECIMAL(30,4)) AS VARCHAR), '\N'),
    coalesce(strftime(o_orderdate, '%Y-%m-%d'), '\N'),
    coalesce(o_orderpriority, '\N')) AS r
  FROM orders
), h AS (
  SELECT ('0x' || substr(md5(r), 1, 15))::BIGINT AS h FROM canon
)
SELECT 'orders' AS table_name,
       COUNT(*) AS n_rows,
       CAST(SUM(h) AS VARCHAR) AS hash_sum,
       bit_xor(h) AS hash_xor
FROM h
"""


@_register("table_checksum", _CHECKSUM_SQL, tags=("ops", "agg"))
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive fingerprint of the orders table —
    ``operators.aggregates.table_fingerprint``. The canonical row
    rendering (explicit null sentinel, decimal-cast doubles,
    date_format'd timestamps) is the portable part: the DuckDB oracle
    rebuilds the identical bytes, so sum and xor of the md5-derived
    60-bit row hashes agree bit-for-bit. At 100 TB this validates a
    backfill or cross-region copy with one 4-column row per table and
    a single commutative aggregation — no sort, no row transfer, any
    parallelism.
    """
    o = read_table(spark, sf_dir, "orders")
    canon = o.select(
        F.col("o_orderkey").cast("string").alias("c1"),
        F.col("o_custkey").cast("string").alias("c2"),
        F.col("o_orderstatus").alias("c3"),
        F.col("o_totalprice").cast("decimal(30,4)").cast("string").alias("c4"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("c5"),
        F.col("o_orderpriority").alias("c6"),
    )
    return table_fingerprint(
        canon, ["c1", "c2", "c3", "c4", "c5", "c6"], "orders"
    )
