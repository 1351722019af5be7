"""Round-7 catalog entries: the remaining large-scale-pipeline
primitives, grouped by family —

* graph / similarity: degree-oriented distributed triangle counting
  (O(sqrt(m)) wedge fan-out), item-item co-occurrence cosine (the
  collaborative-filtering primitive);
* ML data prep: the vocabulary-free hashing-trick featurizer, the
  end-to-end embedding-curation pipeline (LSH near-dup drop ->
  int8 quantize -> hash split, chained);
* sketches: the HLL rollup gate (tolerance-bounded re-aggregation —
  see its docstring for the HIP/composite and merge-history findings
  the sf0.1 sweep surfaced) and its streaming micro-batch twin;
* windows / sequences: sliding-window distinct counts via
  contribution explode, weekly cohort retention (single scan, no
  join), the first-order Markov event-transition matrix, and
  inter-event gap percentiles;
* ops / data quality: the order-insensitive table fingerprint and
  its drill-down table-diff companion, MAD robust outliers, the
  Benford first-digit profile, equi-width histograms over broadcast
  bounds, per-source exact-dup-rate reporting, and RFM segmentation;
* search / frontier: trigram-indexed substring search (lossless
  index-intersection prefilter) and the bucket-pruned 2D skyline.

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
from formula1_etl_analytics_project_spark.operators.skyline import (
    pareto_frontier_2d,
)
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
       array_to_string(list(feat_idx ORDER BY feat_idx), ',') AS idxs,
       array_to_string(list(cnt ORDER BY feat_idx), ',') AS vals
FROM feats GROUP BY doc_id
"""


@_register("feature_hashing", _FEATURE_HASH_SQL, tags=("text", "ml"))
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bag-of-words: each doc becomes a 64-dim sparse
    count vector (parallel ``idxs``/``vals`` comma-joined STRINGS
    sorted by index — the driver's oracle comparator cannot sort
    list cells, so arrays never cross the output boundary; same
    idiom as `array_agg_orders`/`pq_codes`) with the feature index
    a pure md5 function of the token —
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
        F.array_join(
            F.transform(
                "s", lambda x: x.getField("feat_idx").cast("string")
            ),
            ",",
        ).alias("idxs"),
        F.array_join(
            F.transform("s", lambda x: x.getField("cnt").cast("string")),
            ",",
        ).alias("vals"),
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
    count and (b) agree within 5% with the union over a COMPLETELY
    DIFFERENT slicing of the same rows (user_id % 7 buckets) — the
    re-aggregation contract a sketch warehouse rests on: any
    partition-by-partition rollup answers like any other. Violating
    groups are emitted; the expected — and asserted — result is
    empty.

    Property (b) is the one that matters at 100 TB: it licenses
    storing one tiny sketch per partition/day and answering any
    rollup (week, month, all-time, ad-hoc segment union) by merging
    sketches — never rescanning raw data. approx_count_distinct
    gives an estimate but NOT a persistable, re-mergeable state;
    the sketch column is the warehouse pattern.

    Why both comparisons are TOLERANCE-based, not exact — two
    findings from running this gate at sf0.1 (both invisible at the
    driver's sf0.01 and in small unit tests, where every sketch sits
    in sparse mode and counts coupons exactly):
    * union-of-parts vs one directly-streamed sketch: a streamed
      sketch answers with the HIP estimator, a union must fall back
      to the composite estimator (HIP state is not mergeable) —
      identical registers, different estimator, different estimate.
    * union path vs union path over different slicings: the
      LIST→SET→HLL mode promotion depends on the MERGE HISTORY, not
      just the final coupon set, so one slicing can still be
      coupon-exact (1496) while another has gone dense (1488).
    Neither divergence exceeds the sketch's error bound — which is
    exactly the guarantee the format makes, and therefore what this
    gate enforces.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    rolled = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("rolled_nd")
    )
    by_bucket = ev.groupBy(
        "event_type", (F.col("user_id") % 7).alias("b")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    resliced = by_bucket.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("resliced_nd")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_nd")
    )
    g = rolled.join(resliced, "event_type").join(exact, "event_type")
    acc_bad = g.where(
        F.abs(F.col("rolled_nd") - F.col("exact_nd"))
        > 0.10 * F.col("exact_nd")
    ).select(
        "event_type",
        F.lit("ndv_err").alias("kind"),
        F.col("exact_nd").cast("double").alias("exact_val"),
        F.col("rolled_nd").cast("double").alias("approx_val"),
    )
    merge_bad = g.where(
        F.abs(F.col("rolled_nd") - F.col("resliced_nd"))
        > 0.05 * F.col("exact_nd")
    ).select(
        "event_type",
        F.lit("rollup_mismatch").alias("kind"),
        F.col("resliced_nd").cast("double").alias("exact_val"),
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
    are clipped to days observed in the data (semi-join against the
    day list — bounded by the CALENDAR, so that side broadcasts at
    any scale, unlike a per-user side). The day list derives from a
    second pass over the collapsed pair set; a deployment would
    persist the pair set (or maintain the day dimension as its own
    tiny table) so the fact is still scanned once.
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


# ===========================================================================
# 2D skyline / Pareto frontier (bucket-pruned)
# ===========================================================================

_SKYLINE_SQL = """
WITH pts AS (
  SELECT o_custkey,
         COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS spend
  FROM orders GROUP BY o_custkey
), flagged AS (
  SELECT o_custkey, n_orders, spend,
         MAX(spend) OVER (ORDER BY n_orders
           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
         MAX(spend) OVER (PARTITION BY n_orders) AS m2
  FROM pts
)
SELECT o_custkey, n_orders, CAST(spend AS DOUBLE) AS spend
FROM flagged
WHERE (m1 IS NULL OR m1 < spend) AND m2 <= spend
"""


@_register("skyline_customers", _SKYLINE_SQL, tags=("analytics",))
def q_skyline_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of customers: fewest orders for the most spend
    (not dominated by anyone with <= orders and >= spend, one
    strict). Spark has no skyline operator; the composition is
    ``operators.skyline.pareto_frontier_2d`` (property-tested against
    a brute-force dominance oracle), the scale answer:

    1. reduce the fact to one (x=n_orders, y=spend) point per key
       (ordinary hash-agg);
    2. LOSSLESS grid prune: bucket x (``x div 4``), take max(y) per
       bucket (a few-row aggregate, broadcast), and drop any point
       whose y is below the best y of a strictly-lower bucket — that
       dominator has strictly smaller x, so the drop is safe. The
       running bucket maximum is a window over B bucket rows, not
       over the data;
    3. exact dominance test on the tiny survivor set via two window
       maxima: m1 = best y at strictly smaller x (integer RANGE
       frame), m2 = best y at equal x. Survivors are on the frontier
       iff y > m1 and y = m2-max's value class (m2 <= y).

    The only global window runs over the pruned survivors (frontier
    candidates, ~O(skyline) rows), never the keyspace — at 100 TB
    the unpruned single-partition window would be the classic
    scale-killer this repo bans. The oracle restates the exact
    window dominance test WITHOUT the prune, proving the prune
    drops no frontier point.
    """
    o = read_table(spark, sf_dir, "orders")
    pts = o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(30,4)")).alias("spend"),
    )
    return pareto_frontier_2d(pts, "n_orders", "spend").select(
        "o_custkey", "n_orders", F.col("spend").cast("double").alias("spend")
    )


# ===========================================================================
# Table diff / reconciliation (CDC validation companion to table_checksum)
# ===========================================================================

_TABLE_DIFF_SQL = r"""
WITH a AS (
  SELECT o_orderkey AS k,
         md5(concat_ws('|',
           coalesce(o_orderstatus, '\N'),
           coalesce(CAST(CAST(o_totalprice AS DECIMAL(30,4)) AS VARCHAR), '\N'),
           coalesce(o_orderpriority, '\N'))) AS rh
  FROM orders
), b AS (
  SELECT o_orderkey AS k,
         md5(concat_ws('|',
           coalesce(o_orderstatus, '\N'),
           coalesce(CAST(CAST(
             o_totalprice + CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END
             AS DECIMAL(30,4)) AS VARCHAR), '\N'),
           coalesce(o_orderpriority, '\N'))) AS rh
  FROM orders WHERE o_orderkey % 89 <> 0
  UNION ALL
  SELECT -o_orderkey, md5('new') FROM orders WHERE o_orderkey % 101 = 0
), j AS (
  SELECT a.k AS ka, b.k AS kb, a.rh AS ra, b.rh AS rb
  FROM a FULL OUTER JOIN b ON a.k = b.k
)
SELECT CASE WHEN ka IS NULL THEN 'added'
            WHEN kb IS NULL THEN 'removed'
            WHEN ra <> rb THEN 'changed'
            ELSE 'unchanged' END AS class,
       COUNT(*) AS n
FROM j GROUP BY 1
"""


@_register("table_diff", _TABLE_DIFF_SQL, tags=("ops",))
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: classify every key across two table
    versions as added / removed / changed / unchanged and count each
    class — the drill-down companion to ``table_checksum`` (checksum
    says THAT copies diverge; diff says WHERE). Version B is a
    deterministic mutation of orders (drop keys %89, bump price on
    %97, insert negated keys %101), so both engines derive identical
    inputs with no fixture.

    Shape at 100 TB: rows collapse to (key, md5(row)) projections
    FIRST, so the full-outer join — the only shuffle — moves 2x16
    bytes per row instead of whole rows, and the class counts are
    map-side combinable. This is the pattern for validating a CDC
    pipeline's output against a source snapshot without moving
    either table.
    """
    o = read_table(spark, sf_dir, "orders")

    def rh(price_col):
        return F.md5(
            F.concat_ws(
                "|",
                F.coalesce(F.col("o_orderstatus"), F.lit("\\N")),
                F.coalesce(
                    price_col.cast("decimal(30,4)").cast("string"), F.lit("\\N")
                ),
                F.coalesce(F.col("o_orderpriority"), F.lit("\\N")),
            )
        )

    a = o.select(F.col("o_orderkey").alias("k"), rh(F.col("o_totalprice")).alias("rh"))
    b_upd = o.where(F.col("o_orderkey") % 89 != 0).select(
        F.col("o_orderkey").alias("k"),
        rh(
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 97 == 0, 1).otherwise(0)
        ).alias("rh"),
    )
    b_new = o.where(F.col("o_orderkey") % 101 == 0).select(
        (-F.col("o_orderkey")).alias("k"), F.md5(F.lit("new")).alias("rh")
    )
    b = b_upd.unionByName(b_new)
    j = a.withColumnsRenamed({"k": "ka", "rh": "ra"}).join(
        b.withColumnsRenamed({"k": "kb", "rh": "rb"}),
        F.col("ka") == F.col("kb"),
        "full_outer",
    )
    cls = (
        F.when(F.col("ka").isNull(), "added")
        .when(F.col("kb").isNull(), "removed")
        .when(F.col("ra") != F.col("rb"), "changed")
        .otherwise("unchanged")
    )
    return j.groupBy(cls.alias("class")).agg(F.count("*").alias("n"))


# ===========================================================================
# Robust outliers (median absolute deviation)
# ===========================================================================

_MAD_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events WHERE value IS NOT NULL GROUP BY event_type
), dev AS (
  SELECT e.event_type, e.value, m.med,
         abs(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
  WHERE e.value IS NOT NULL
), mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev
  GROUP BY event_type
)
SELECT d.event_type,
       ROUND(MAX(d.med), 6) AS med,
       ROUND(MAX(m.mad), 6) AS mad,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
         AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""


@_register("mad_outliers", _MAD_SQL, tags=("analytics", "stats"))
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per event type via median absolute
    deviation (|x - median| > 3 * 1.4826 * MAD). The z-score entry
    (``zscore_outliers``) breaks down exactly when outliers matter —
    mean and stddev are themselves dragged by the outliers — so the
    robust pair is the production data-quality gate.

    Two grouped exact medians (holistic, so each is one sort-based
    agg over its group) with a broadcast-joinable per-group median
    table in between; group count is bounded by event-type
    cardinality, so the per-group state never concentrates on one
    task. At 100 TB swap ``percentile`` for ``approx_percentile``
    and this plan is unchanged — ``approx_agg_gate`` bounds that
    substitution's error.
    """
    ev = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * 1.4826 * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


# ===========================================================================
# Cohort retention (weekly)
# ===========================================================================

_COHORT_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
  FROM events
), first_w AS (
  SELECT user_id, MIN(w) AS cohort_week FROM uw GROUP BY user_id
)
SELECT f.cohort_week,
       CAST(datediff('day', f.cohort_week, uw.w) / 7 AS BIGINT)
         AS week_offset,
       COUNT(DISTINCT uw.user_id) AS n_users
FROM uw JOIN first_w f USING (user_id)
GROUP BY 1, 2
"""


@_register("cohort_retention", _COHORT_SQL, tags=("analytics",))
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-active
    week, counted distinct in every later week they return
    (week_offset 0 = the cohort's own size). The product-analytics
    staple Spark has no operator for.

    Scale shape — ONE scan, NO join: the raw stream collapses
    straight to one row per user holding its distinct active-week
    set (``collect_set`` after a map-side partial, state bounded by
    the calendar, not event volume), the cohort week falls out as
    ``array_min`` of that set, and exploding the set yields exactly
    one row per (user, active week) — so the final (cohort, offset)
    count needs no DISTINCT. The naive formulation (distinct pairs,
    separate per-user MIN, join back) was measured to scan events
    TWICE and join on a side that only broadcasts at test scale;
    this form is what survives when neither side is small.
    """
    ev = read_table(spark, sf_dir, "events")
    per_user = (
        ev.select(
            "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
        )
        .groupBy("user_id")
        .agg(F.collect_set("w").alias("ws"))
    )
    return (
        per_user.select(
            F.array_min("ws").alias("cohort_week"),
            F.explode("ws").alias("w"),
        )
        .groupBy(
            "cohort_week",
            (F.datediff("w", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


# ===========================================================================
# Item-item cosine similarity (collaborative-filtering primitive)
# ===========================================================================

_ITEM_COSINE_SQL = """
WITH inst AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT l_partkey, COUNT(*) AS cnt FROM inst GROUP BY l_partkey
), co AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS co
  FROM inst a JOIN inst b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT co.u, co.v,
       ROUND(co.co / sqrt(na.cnt * nb.cnt), 9) AS cosine
FROM co JOIN n na ON na.l_partkey = co.u
        JOIN n nb ON nb.l_partkey = co.v
ORDER BY cosine DESC, co.u, co.v
LIMIT 20
"""


@_register("item_cosine_sim", _ITEM_COSINE_SQL, tags=("analytics", "ml"))
def q_item_cosine_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar part pairs by co-occurrence cosine
    (co(a,b) / sqrt(n(a) * n(b))) — the item-item collaborative
    filtering primitive, on the same >=2-support co-purchase pairs as
    ``triangle_count``.

    Scale shape: the pair space is generated from aggregated baskets
    (quadratic only within an order, never a basket-table self-join
    at fact scale), per-item totals are one hash-agg, and both
    normalizing joins hit a table bounded by ITEM cardinality —
    broadcastable for any realistic catalog. Top-20 lowers to
    TakeOrderedAndProject (per-partition partial top-k, no global
    sort); ties break on the unique (u, v) pair key so the LIMIT is
    deterministic cross-engine.
    """
    li = read_table(spark, sf_dir, "lineitem", spread=True)
    inst = li.select("l_orderkey", "l_partkey").distinct()
    n = inst.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    sets = (
        inst.groupBy("l_orderkey")
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
    co = (
        pairs.groupBy("u", "v")
        .agg(F.count("*").alias("co"))
        .filter(F.col("co") >= 2)
    )
    na = n.withColumnsRenamed({"l_partkey": "u", "cnt": "na"})
    nb = n.withColumnsRenamed({"l_partkey": "v", "cnt": "nb"})
    return (
        co.join(F.broadcast(na), "u")
        .join(F.broadcast(nb), "v")
        .select(
            "u",
            "v",
            F.round(
                F.col("co") / F.sqrt(F.col("na") * F.col("nb")), 9
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "u", "v")
        .limit(20)
    )


# ===========================================================================
# Equi-width histogram (two-pass bounds + broadcast)
# ===========================================================================

_HISTOGRAM_SQL = """
WITH b AS (
  SELECT min(value) AS lo, max(value) AS hi
  FROM events WHERE value IS NOT NULL
)
SELECT event_type,
       CAST(least(9, floor((value - lo) * 10 / (hi - lo))) AS BIGINT)
         AS bin,
       COUNT(*) AS n
FROM events, b
WHERE value IS NOT NULL
GROUP BY 1, 2
"""


@_register("value_histogram", _HISTOGRAM_SQL, tags=("analytics", "stats"))
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type 10-bin equi-width histogram of ``value`` over
    GLOBAL bounds (so bins are comparable across groups). The
    distributed histogram shape: pass 1 is a 2-value min/max
    aggregate, broadcast back as a 1-row bound table; pass 2 bins
    map-side and counts with an ordinary combinable hash-agg — the
    fact is scanned twice but shuffled once, and the shuffle carries
    (type, bin) pairs, never values. The bin expression evaluates in
    the identical IEEE-double operation order on both engines, so
    boundary assignment is bit-reproducible.
    """
    ev = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.least(
                F.lit(9),
                F.floor(
                    (F.col("value") - F.col("lo")) * 10 / (F.col("hi") - F.col("lo"))
                ),
            )
            .cast("bigint")
            .alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("n"))
    )


# ===========================================================================
# End-to-end embedding corpus curation (LSH dedup -> quantize -> split)
# ===========================================================================

from formula1_etl_analytics_project_spark.plans.catalog import (  # noqa: E402
    _SQL_DOT,
    _sql_cosine,
)

_EMB_CURATION_SQL = f"""
WITH hp AS (
  SELECT vec_id AS hp_id, embedding AS hp_vec
  FROM embeddings ORDER BY vec_id LIMIT 4
), bk AS (
  SELECT e.vec_id,
         string_agg(
           CASE WHEN {_SQL_DOT.format(a='e.embedding', b='hp.hp_vec')} >= 0
                THEN '1' ELSE '0' END, ''
           ORDER BY hp.hp_id) AS bucket
  FROM embeddings e CROSS JOIN hp
  GROUP BY e.vec_id
), b AS (
  SELECT e.vec_id, e.embedding, bk.bucket
  FROM embeddings e JOIN bk USING (vec_id)
), dropped AS (
  SELECT DISTINCT r.vec_id
  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
  WHERE ROUND({_sql_cosine('l.embedding', 'r.embedding')}, 6) >= 0.4
), scaled AS (
  SELECT b.vec_id, b.embedding,
         list_max(list_transform(b.embedding,
           x -> abs(CAST(x AS DOUBLE)))) AS scale
  FROM b
), labeled AS (
  SELECT s.vec_id,
         s.vec_id IN (SELECT vec_id FROM dropped) AS is_dup,
         CASE WHEN strpos('0123456789abcdef',
                substr(md5(CAST(s.vec_id AS VARCHAR)), 1, 1)) - 1 < 13
              THEN 'train'
              WHEN strpos('0123456789abcdef',
                substr(md5(CAST(s.vec_id AS VARCHAR)), 1, 1)) - 1 < 14
              THEN 'val' ELSE 'test' END AS split,
         list_reduce(list_transform(generate_series(1, len(s.embedding)),
           i -> CAST(round(CAST(s.embedding[i] AS DOUBLE) * 127.0 / s.scale)
                AS BIGINT)),
           (x, y) -> x + y) AS q_sum
  FROM scaled s
)
SELECT split,
       CAST(SUM(CASE WHEN is_dup THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN is_dup THEN 0 ELSE q_sum END) AS BIGINT)
         AS q_sum_total
FROM labeled
GROUP BY split
"""


@_register(
    "embedding_curation_pipeline", _EMB_CURATION_SQL, tags=("vector", "etl")
)
def q_embedding_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end embedding-corpus curation, the vector twin of
    ``corpus_clean_pipeline``: LSH-bucketed near-dup drop (a vector
    is dropped when a lower-id vector in its bucket has cosine >=
    0.4 — deterministic keep-lowest policy), int8 quantization of
    the survivors (pinned via the exact q_sum per split), and the
    md5-nibble train/val/test assignment — three stages CHAINED so
    stage-interaction bugs (dedup changing split balance, quantizing
    dropped rows) can't hide behind per-stage checks.

    Scale shape: the only self-join is within LSH buckets (the 2^4
    buckets bound candidates exactly as in ``embedding_neardup``'s
    cells), the drop set joins back as a broadcast-size anti-join,
    quantization is a narrow per-row array op, and the split label
    is a pure hash function — no stage adds driver state or an
    unbounded shuffle.
    """
    from formula1_etl_analytics_project_spark.functions.vectors import cosine
    from formula1_etl_analytics_project_spark.operators.similarity import (
        lsh_bucket,
    )

    emb = read_table(spark, sf_dir, "embeddings", spread=True)
    hp = (
        emb.orderBy("vec_id")
        .limit(4)
        .select(F.col("vec_id").alias("hp_id"), F.col("embedding").alias("hp_vec"))
    )
    b = lsh_bucket(emb, hp).select("vec_id", "embedding", "bucket")
    left = b.select(
        F.col("vec_id").alias("lid"),
        F.col("embedding").alias("lvec"),
        "bucket",
    )
    right = b.select(
        F.col("vec_id").alias("rid"),
        F.col("embedding").alias("rvec"),
        "bucket",
    )
    dropped = (
        left.join(right, "bucket")
        .where(F.col("lid") < F.col("rid"))
        .where(F.round(cosine("lvec", "rvec"), 6) >= 0.4)
        .select(F.col("rid").alias("vec_id"))
        .distinct()
    )
    nib = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1),
        )
        - 1
    )
    split = F.when(nib < 13, "train").when(nib < 14, "val").otherwise("test")
    dv = F.transform("embedding", lambda v: F.abs(v.cast("double")))
    qv = F.transform(
        "embedding",
        lambda v: F.round(v.cast("double") * 127.0 / F.array_max(dv)).cast(
            "long"
        ),
    )
    labeled = b.join(
        dropped.withColumn("is_dup", F.lit(True)), "vec_id", "left"
    ).select(
        split.alias("split"),
        F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        F.aggregate(qv, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "q_sum"
        ),
    )
    return labeled.groupBy("split").agg(
        F.sum(F.when(F.col("is_dup"), 0).otherwise(1)).alias("n_kept"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dropped"),
        F.sum(F.when(F.col("is_dup"), 0).otherwise(F.col("q_sum"))).alias(
            "q_sum_total"
        ),
    )


# ===========================================================================
# Trigram-indexed substring search (index-intersection vs scan)
# ===========================================================================

_TRIGRAM_QUERY = "slow small filter"

_TRIGRAM_SQL = r"""
SELECT doc_id
FROM documents
WHERE lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
      LIKE '%slow small filter%'
"""


@_register("trigram_search", _TRIGRAM_SQL, tags=("text", "index"))
def q_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring search through a character-trigram inverted index:
    docs whose normalized text contains the (fixed, deterministic)
    query phrase. The index path — explode each doc's DISTINCT
    trigrams, keep only postings for the query's trigrams, candidate
    = doc containing ALL of them, then verify with one ``instr`` on
    the candidates — is how LIKE '%...%' becomes affordable at
    100 TB: the full scan happens ONCE at index build, every search
    after that touches |query trigrams| posting lists plus a
    candidate set the intersection has already made tiny. The oracle
    is the plain LIKE scan, which proves the index path loses no
    match (trigram intersection is a lossless prefilter: any doc
    containing the phrase contains every one of its trigrams).
    """
    q = " ".join(_TRIGRAM_QUERY.lower().split())
    qtris = sorted({q[i : i + 3] for i in range(len(q) - 2)})
    docs = read_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", normalize("text").alias("n")
    )
    index = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(length(n) - 2, 1)),"
                    " i -> substring(n, i, 3))"
                )
            )
        ).alias("tri"),
    )
    cands = (
        index.where(F.col("tri").isin(qtris))
        .groupBy("doc_id")
        .agg(F.countDistinct("tri").alias("k"))
        .where(F.col("k") == len(qtris))
        .select("doc_id")
    )
    return (
        docs.join(cands, "doc_id", "semi")
        .where(F.instr("n", q) > 0)
        .select("doc_id")
    )


# ===========================================================================
# Benford first-digit profile (data-quality forensics)
# ===========================================================================

_BENFORD_SQL = """
WITH digits AS (
  SELECT CAST(floor(o_totalprice /
           power(10, floor(log10(o_totalprice)))) AS BIGINT) AS d
  FROM orders WHERE o_totalprice > 0
), tot AS (SELECT COUNT(*) AS n_total FROM digits)
SELECT d,
       COUNT(*) AS n,
       ROUND(COUNT(*) / CAST(MAX(t.n_total) AS DOUBLE), 6) AS obs_freq,
       ROUND(log10(1.0 + 1.0 / d), 6) AS benford_freq
FROM digits, tot t
GROUP BY d
"""


@_register("benford_digit_check", _BENFORD_SQL, tags=("ops", "stats"))
def q_benford_digit_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit profile of o_totalprice against the
    Benford expectation log10(1 + 1/d) — the classic forensic /
    data-quality screen for fabricated or truncated numeric columns
    (TPC-H prices are NOT Benford-distributed, and the output shows
    exactly how: the profile is the signal, not a pass/fail).

    Digit extraction is numeric (floor(x / 10^floor(log10 x))), never
    string formatting — identical IEEE evaluation on both engines —
    and the whole check is one narrow projection plus a 9-group
    hash-agg with the total broadcast back: per-column cost at 100 TB
    is one scan, which is why Benford screens are routinely run over
    every numeric column of an ingest batch.
    """
    o = read_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digits = o.select(
        F.floor(
            F.col("o_totalprice")
            / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
        )
        .cast("bigint")
        .alias("d")
    )
    tot = digits.agg(F.count("*").alias("n_total"))
    return (
        digits.crossJoin(F.broadcast(tot))
        .groupBy("d")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.count("*") / F.max("n_total").cast("double"), 6
            ).alias("obs_freq"),
            F.round(F.log10(1.0 + 1.0 / F.col("d")), 6).alias("benford_freq"),
        )
    )


# ===========================================================================
# Streaming mergeable-sketch aggregation (HLL under micro-batching)
# ===========================================================================

_STREAM_SKETCH_SQL = """
SELECT CAST(NULL AS TIMESTAMP) AS window_start,
       CAST(NULL AS VARCHAR) AS event_type,
       CAST(NULL AS DOUBLE) AS exact_nd,
       CAST(NULL AS DOUBLE) AS approx_nd
WHERE FALSE
"""


@_register("stream_sketch_distinct", _STREAM_SKETCH_SQL, tags=("streaming", "approx"))
def q_stream_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per (hour, event_type) computed by a
    REAL Structured Streaming run — events staged as files, consumed
    with maxFilesPerTrigger=1 so the HLL state is built and merged
    across several micro-batches — gated within 10% of the exact
    batch distinct count per group; violations are emitted and the
    expected result is empty.

    This is the streaming face of ``sketch_rollup_gate``: sketches
    are the ONLY exact-memory-bounded way to track distincts in an
    unbounded stream (exact per-window distinct state grows with
    NDV), and micro-batch merging exercises precisely the
    partial-state union the batch gate proves tolerant. Complete
    output mode + a far watermark keeps every window comparable to
    the batch twin, as in ``stream_windowed_counts``.
    """
    import os
    import uuid

    from formula1_etl_analytics_project_spark.plans.catalog_ext import (
        _stage_dir,
    )
    from formula1_etl_analytics_project_spark.schemas import TESTDATA_SCHEMAS

    stage = _stage_dir(sf_dir, "stream", "events")
    marker = os.path.join(stage, "_SUCCESS")
    if not os.path.exists(marker):
        read_table(spark, sf_dir, "events").repartition(4).write.mode(
            "overwrite"
        ).parquet(stage)
    stream = (
        spark.readStream.schema(TESTDATA_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    agg = (
        stream.withWatermark("ts", "10 years")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx_nd"))
    )
    name = f"sk_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = spark.sql(
        f"SELECT win.start AS window_start, event_type, approx_nd FROM {name}"
    )
    exact = (
        read_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.countDistinct("user_id").alias("exact_nd"))
    )
    j = streamed.join(exact, ["window_start", "event_type"], "full_outer")
    return j.where(
        F.col("exact_nd").isNull()
        | F.col("approx_nd").isNull()
        | (
            F.abs(F.col("approx_nd") - F.col("exact_nd"))
            > 0.10 * F.col("exact_nd")
        )
    ).select(
        "window_start",
        "event_type",
        F.col("exact_nd").cast("double").alias("exact_nd"),
        F.col("approx_nd").cast("double").alias("approx_nd"),
    )


# ===========================================================================
# Sequential patterns: next-event transition matrix + inter-event gaps
# ===========================================================================

_TRANSITIONS_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), pairs AS (
  SELECT event_type AS from_type, next_type AS to_type
  FROM ordered WHERE next_type IS NOT NULL
), tot AS (
  SELECT from_type, COUNT(*) AS n_from FROM pairs GROUP BY from_type
)
SELECT p.from_type, p.to_type,
       COUNT(*) AS n,
       ROUND(COUNT(*) / CAST(MAX(t.n_from) AS DOUBLE), 6) AS prob
FROM pairs p JOIN tot t USING (from_type)
GROUP BY p.from_type, p.to_type
"""


@_register("event_transitions", _TRANSITIONS_SQL, tags=("analytics", "sequence"))
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), with counts. The
    sequence-mining primitive behind session modeling and
    next-action prediction features.

    One window (lag/lead) partitioned on user_id — a single shuffle
    with per-user state only, totally ordered by (ts, event_id) so
    simultaneous events break ties deterministically — then a
    (from, to) hash-agg and a broadcast-size row-total join. Event
    volume passes through exactly one exchange; the matrix itself is
    |types|^2 rows whatever the data size.
    """
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
    )
    tot = pairs.groupBy("from_type").agg(F.count("*").alias("n_from"))
    return (
        pairs.join(F.broadcast(tot), "from_type")
        .groupBy("from_type", "to_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.count("*") / F.max("n_from").cast("double"), 6
            ).alias("prob"),
        )
    )


_GAPS_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts,
         LEAD(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM events
), gaps AS (
  SELECT event_type,
         date_diff('microsecond', ts, next_ts) / 1000000.0 AS gap_s
  FROM ordered WHERE next_ts IS NOT NULL
)
SELECT event_type,
       COUNT(*) AS n,
       ROUND(quantile_cont(gap_s, 0.5), 6) AS median_gap_s,
       ROUND(quantile_cont(gap_s, 0.95), 6) AS p95_gap_s
FROM gaps GROUP BY event_type
"""


@_register("inter_event_gaps", _GAPS_SQL, tags=("analytics", "sequence"))
def q_inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-next-event percentiles per event type (median and p95
    seconds until the same USER's next action) — the dwell-time
    signal behind session-timeout tuning (``sessionize``'s gap
    parameter is exactly a quantile of this distribution) and
    engagement scoring.

    Same single user_id window as ``event_transitions`` (the two
    entries share their shuffle shape; a combined pipeline would
    compute both off one exchange), gaps in exact microseconds
    rescaled to seconds, then a per-type exact percentile — holistic,
    but grouped by the bounded event-type key, so per-group sort
    state never concentrates.
    """
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "event_type",
            "ts",
            F.lead("ts").over(w).alias("next_ts"),
        )
        .where(F.col("next_ts").isNotNull())
        .select(
            "event_type",
            (
                (F.unix_micros("next_ts") - F.unix_micros("ts")) / 1000000.0
            ).alias("gap_s"),
        )
    )
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 6).alias("median_gap_s"),
        F.round(F.expr("percentile(gap_s, 0.95)"), 6).alias("p95_gap_s"),
    )


# ===========================================================================
# RFM segmentation (recency / frequency / monetary)
# ===========================================================================

_RFM_SQL = """
WITH mx AS (
  SELECT MAX(o_orderdate) AS max_d FROM orders
), per_cust AS (
  SELECT o_custkey,
         datediff('day', MAX(o_orderdate), MAX(mx.max_d)) AS recency_d,
         COUNT(*) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS monetary
  FROM orders, mx
  GROUP BY o_custkey
), seg AS (
  SELECT CASE WHEN recency_d <= 365 THEN 'active' ELSE 'lapsed' END
           || '/' ||
         CASE WHEN frequency >= 15 THEN 'frequent' ELSE 'occasional' END
           || '/' ||
         CASE WHEN monetary >= 1500000 THEN 'high' ELSE 'low' END AS segment,
         monetary
  FROM per_cust
)
SELECT segment, COUNT(*) AS n_customers,
       CAST(SUM(monetary) AS DOUBLE) AS total_monetary
FROM seg GROUP BY segment
"""


@_register("rfm_segments", _RFM_SQL, tags=("analytics",))
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order,
    anchored to the dataset's max date so the entry is deterministic),
    frequency (order count), monetary (exact decimal spend), bucketed
    by fixed thresholds into 8 named segments.

    One hash-agg per customer, a 1-row max-date aggregate broadcast
    in, and a tiny segment rollup — the whole segmentation is two
    shuffles at any scale, and the per-customer aggregate is the same
    collapse every downstream marketing/ML feature would reuse.
    Thresholds are fixed (not quantiles) so segment membership is a
    pure row function; the quantile-based variant is
    ``ntile_spend_quartiles``.
    """
    o = read_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("max_d"))
    per_cust = (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("max_d"), F.max("o_orderdate")).alias("recency_d"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(30,4)")).alias("monetary"),
        )
    )
    segment = F.concat_ws(
        "/",
        F.when(F.col("recency_d") <= 365, "active").otherwise("lapsed"),
        F.when(F.col("frequency") >= 15, "frequent").otherwise("occasional"),
        F.when(F.col("monetary") >= 1500000, "high").otherwise("low"),
    )
    return (
        per_cust.select(segment.alias("segment"), "monetary")
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("monetary").cast("double").alias("total_monetary"),
        )
    )


# ===========================================================================
# Dedup-rate report by source (corpus health dashboard)
# ===========================================================================

_DUP_RATE_SQL = r"""
WITH fp AS (
  SELECT source,
         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT f) AS n_distinct,
       ROUND(1.0 - COUNT(DISTINCT f) / CAST(COUNT(*) AS DOUBLE), 6)
         AS dup_rate
FROM fp GROUP BY source
"""


@_register("dup_rate_by_source", _DUP_RATE_SQL, tags=("text", "dedup", "ops"))
def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per source — the corpus-health metric a
    curation pipeline reports after every ingest (a source whose
    dup_rate jumps is re-crawling itself). Fingerprints are the
    normalized-text md5 (``functions.text.fingerprint``); the
    per-source COUNT(DISTINCT) is the two-level Catalyst expansion
    over (source, fingerprint) — fine here because source cardinality
    is small and fingerprints spread; the skew-proof form for a hot
    key is ``skew_distinct_count``.
    """
    from formula1_etl_analytics_project_spark.functions.text import fingerprint

    docs = read_table(spark, sf_dir, "documents", spread=True)
    fp = docs.select("source", fingerprint("text").alias("f"))
    return fp.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("f").alias("n_distinct"),
        F.round(
            1.0 - F.countDistinct("f") / F.count("*").cast("double"), 6
        ).alias("dup_rate"),
    )


# ===========================================================================
# CUSUM changepoint detection (time-series monitoring)
# ===========================================================================

_CUSUM_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DECIMAL(30,6)) AS v
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
), m AS (
  SELECT event_type,
         CAST(AVG(v) AS DECIMAL(30,6)) AS mean_v
  FROM daily GROUP BY event_type
), cusum AS (
  SELECT d.event_type, d.d,
         SUM(d.v - m.mean_v) OVER (
           PARTITION BY d.event_type ORDER BY d.d) AS c
  FROM daily d JOIN m USING (event_type)
)
SELECT event_type, d AS changepoint_day,
       CAST(ROUND(c, 6) AS DOUBLE) AS cusum_peak
FROM (
  SELECT event_type, d, c,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY abs(c) DESC, d) AS rn
  FROM cusum)
WHERE rn = 1
"""


@_register("cusum_changepoint", _CUSUM_SQL, tags=("analytics", "timeseries"))
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint screen per event type: the day where the
    cumulative sum of (daily total - series mean) peaks in absolute
    value — the standard single-changepoint estimator for a level
    shift, and the monitoring primitive behind 'when did this metric
    start drifting'.

    All arithmetic is DECIMAL end-to-end (daily sums, the mean, the
    running CUSUM), so the cumulative window — normally the first
    place float non-associativity bites — is bit-identical at any
    partitioning and across engines. Shapes: one (type, day) hash-agg
    collapses the stream (days x types rows thereafter), a broadcast
    mean join, a per-type ordered window, and an argmax via
    row_number with the day as tiebreak.
    """
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.col("value").cast("decimal(30,6)"))
        .cast("decimal(30,6)")
        .alias("v")
    )
    m = daily.groupBy("event_type").agg(
        F.avg("v").cast("decimal(30,6)").alias("mean_v")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    cusum = (
        daily.join(F.broadcast(m), "event_type")
        .select(
            "event_type",
            "d",
            F.sum(F.col("v") - F.col("mean_v")).over(w).alias("c"),
        )
    )
    rn = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("c")).desc(), "d"
    )
    return (
        cusum.withColumn("rn", F.row_number().over(rn))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("d").alias("changepoint_day"),
            F.round("c", 6).cast("double").alias("cusum_peak"),
        )
    )


# ===========================================================================
# k-anonymity check (privacy gate over quasi-identifiers)
# ===========================================================================

_KANON_SQL = """
WITH qi AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         c_mktsegment
  FROM customer
), grps AS (
  SELECT c_nationkey, bal_band, c_mktsegment, COUNT(*) AS n
  FROM qi GROUP BY 1, 2, 3
)
SELECT c_nationkey, bal_band, c_mktsegment, n
FROM grps WHERE n < 5
"""


@_register("k_anonymity_check", _KANON_SQL, tags=("ops", "privacy"))
def q_k_anonymity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (nation,
    account-balance band, market segment): every equivalence class
    with fewer than k=5 members is a re-identification risk and is
    emitted for suppression or coarsening. The release-gate
    companion to ``pii_redact_docs`` (that entry removes direct
    identifiers; this one quantifies indirect ones).

    One hash-agg over the quasi-identifier tuple and a HAVING filter
    — the audit costs the same as any GROUP BY at 100 TB, which is
    the point: there is no excuse not to run it before every data
    release. Banding (floor/1000) is integer, so class membership is
    engine-exact.
    """
    c = read_table(spark, sf_dir, "customer")
    qi = c.select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        "c_mktsegment",
    )
    return (
        qi.groupBy("c_nationkey", "bal_band", "c_mktsegment")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") < 5)
    )


# ===========================================================================
# Join-key skew report (the "should I salt?" diagnostic)
# ===========================================================================

_SKEW_REPORT_SQL = """
WITH per_key AS (
  SELECT l_orderkey AS k, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey
), stats AS (
  SELECT COUNT(*) AS n_keys,
         SUM(n) AS n_rows,
         MAX(n) AS max_key_rows,
         CAST(quantile_cont(n, 0.99) AS DOUBLE) AS p99,
         CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_rows
  FROM per_key
)
SELECT 'lineitem.l_orderkey' AS key_name,
       n_keys, CAST(n_rows AS BIGINT) AS n_rows, max_key_rows,
       ROUND(p99, 6) AS p99_key_rows,
       ROUND(max_key_rows / mean_rows, 6) AS max_over_mean,
       ROUND(max_key_rows / CAST(n_rows AS DOUBLE), 9) AS top_key_share
FROM stats
"""


@_register("skew_report", _SKEW_REPORT_SQL, tags=("ops", "skew"))
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic for lineitem.l_orderkey: keys, rows,
    the hottest key's row count, the p99 per-key count, max/mean
    ratio, and the top key's share of all rows — the numbers that
    decide between doing nothing, trusting AQE's skew-join split, or
    salting (``skew_salted_join``). The repo's skew REMEDIES are
    plan-tested; this is the MEASUREMENT that tells an operator which
    one a 100 TB join needs, produced by one per-key hash-agg
    (map-side combinable) plus a single-row summary — cheap enough to
    run on every candidate join key before writing the pipeline.
    """
    li = read_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count("*").alias("n")
    )
    return per_key.agg(
        F.lit("lineitem.l_orderkey").alias("key_name"),
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        F.round(F.expr("percentile(n, 0.99)"), 6).alias("p99_key_rows"),
        F.round(
            F.max("n") / (F.sum("n").cast("double") / F.count("*")), 6
        ).alias("max_over_mean"),
        F.round(
            F.max("n").cast("double") / F.sum("n").cast("double"), 9
        ).alias("top_key_share"),
    )


# ===========================================================================
# Degree distribution + power-law exponent (graph characterization)
# ===========================================================================

_DEGREE_SQL = """
WITH deg AS (
  SELECT o_custkey, COUNT(*) AS k FROM orders GROUP BY o_custkey
), stats AS (
  SELECT COUNT(*) AS n_nodes,
         MIN(k) AS k_min,
         MAX(k) AS k_max,
         SUM(CAST(ROUND(ln(CAST(k AS DOUBLE) /
               (SELECT MIN(k) FROM deg)), 9) AS DECIMAL(20,9)))
           AS sum_log_ratio
  FROM deg
)
SELECT n_nodes, k_min, k_max,
       ROUND(1.0 + n_nodes / CAST(sum_log_ratio AS DOUBLE), 6)
         AS alpha_mle
FROM stats
"""


@_register("degree_powerlaw", _DEGREE_SQL, tags=("analytics", "graph"))
def q_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-degree distribution summary with the discrete
    power-law exponent MLE (alpha = 1 + n / sum ln(k / k_min),
    Clauset-Shalizi-Newman continuous approximation) — the
    characterization that tells you whether a graph NEEDS the
    skew-resistant operators (degree-oriented triangles, salted
    joins): alpha < 2.5 means hubs dominate and uniform-partition
    assumptions die.

    The non-associative float hazard (summing millions of ln terms)
    is neutralized by rounding each term to 9 decimals and summing
    as DECIMAL — the same exact-accumulation trick as the engine's
    double sums, here applied to a log-likelihood. One hash-agg for
    degrees, a broadcast scalar k_min, one summary row.
    """
    o = read_table(spark, sf_dir, "orders")
    deg = o.groupBy("o_custkey").agg(F.count("*").alias("k"))
    kmin = deg.agg(F.min("k").alias("k_min"))
    return (
        deg.crossJoin(F.broadcast(kmin))
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum(
                F.round(
                    F.log(F.col("k").cast("double") / F.col("k_min")), 9
                ).cast("decimal(20,9)")
            ).alias("slr"),
            F.first("k_min").alias("_km"),
        )
        .select(
            "n_nodes",
            F.col("_km").alias("k_min"),
            "k_max",
            F.round(
                1.0 + F.col("n_nodes") / F.col("slr").cast("double"), 6
            ).alias("alpha_mle"),
        )
    )


# ===========================================================================
# Day-of-week seasonality profile
# ===========================================================================

_SEASONALITY_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DECIMAL(30,6)) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), prof AS (
  SELECT event_type, isodow(d) AS dow,
         COUNT(*) AS n_days,
         CAST(AVG(v) AS DECIMAL(30,6)) AS dow_mean
  FROM daily GROUP BY 1, 2
), overall AS (
  SELECT event_type, CAST(AVG(v) AS DECIMAL(30,6)) AS overall_mean FROM daily GROUP BY 1
)
SELECT p.event_type, p.dow, p.n_days,
       CAST(p.dow_mean AS DOUBLE) AS dow_mean,
       ROUND(CAST(p.dow_mean AS DOUBLE) / CAST(o.overall_mean AS DOUBLE), 6)
         AS seasonal_index
FROM prof p JOIN overall o USING (event_type)
"""


@_register("dow_seasonality", _SEASONALITY_SQL, tags=("analytics", "timeseries"))
def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type: mean daily
    value by ISO weekday and its ratio to the series' overall daily
    mean (the multiplicative seasonal index used to deseasonalize
    metrics before alerting — Monday dips aren't incidents).

    Stream collapses to (type, day) decimal sums once; both the
    weekday profile and the overall mean derive from that days x
    types-sized intermediate, so raw event volume is scanned once.
    ISO weekday (Mon=1..Sun=7) is the cross-engine-stable weekday
    numbering (Spark's ``dayofweek`` is Sun=1, a portability trap).
    """
    ev = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.col("value").cast("decimal(30,6)"))
        .cast("decimal(30,6)")
        .alias("v")
    )
    prof = daily.groupBy(
        "event_type", F.expr("extract(dayofweek_iso FROM d)").alias("dow")
    ).agg(
        F.count("*").alias("n_days"),
        F.avg("v").cast("decimal(30,6)").alias("dow_mean"),
    )
    overall = daily.groupBy("event_type").agg(
        F.avg("v").cast("decimal(30,6)").alias("overall_mean")
    )
    return (
        prof.join(F.broadcast(overall), "event_type")
        .select(
            "event_type",
            "dow",
            "n_days",
            F.col("dow_mean").cast("double").alias("dow_mean"),
            F.round(
                F.col("dow_mean").cast("double")
                / F.col("overall_mean").cast("double"),
                6,
            ).alias("seasonal_index"),
        )
    )


# ===========================================================================
# A/B experiment analysis (two-proportion z-test)
# ===========================================================================

_AB_TEST_SQL = """
WITH users AS (
  SELECT user_id,
         user_id % 2 AS arm,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id
), arms AS (
  SELECT arm, COUNT(*) AS n_users, SUM(converted) AS n_conv
  FROM users GROUP BY arm
), wide AS (
  SELECT MAX(CASE WHEN arm = 0 THEN n_users END) AS n0,
         MAX(CASE WHEN arm = 0 THEN n_conv END) AS c0,
         MAX(CASE WHEN arm = 1 THEN n_users END) AS n1,
         MAX(CASE WHEN arm = 1 THEN n_conv END) AS c1
  FROM arms
)
SELECT n0, CAST(c0 AS BIGINT) AS c0, n1, CAST(c1 AS BIGINT) AS c1,
       ROUND(CAST(c0 AS DOUBLE) / n0, 6) AS rate0,
       ROUND(CAST(c1 AS DOUBLE) / n1, 6) AS rate1,
       CASE WHEN c0 + c1 > 0 AND c0 + c1 < n0 + n1 THEN
         ROUND(
           (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0) /
           sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
                (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
                (1.0 / n0 + 1.0 / n1)), 6)
       ELSE CAST(NULL AS DOUBLE) END AS z_score
FROM wide
"""


@_register("ab_test_ztest", _AB_TEST_SQL, tags=("analytics", "stats"))
def q_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic experiment split
    (arm = user_id % 2; a real assignment would be the md5-bucket
    split of ``train_val_test_split``): per-arm conversion to
    'purchase' and the pooled z statistic — the experimentation
    readout every growth pipeline ends in.

    Conversion collapses to one row per user FIRST (MAX over the
    flag, map-side combinable — a user converting 50 times counts
    once), then two arm rows, then one summary row: whatever the
    event volume, everything after the first aggregate is O(1). The
    z arithmetic is written in one canonical expression order so
    both engines evaluate identical IEEE operations, and the z score
    is NULL when every user (or none) converted — the pooled variance
    is zero there and the test is undefined, which tiny samples
    (sf0.001: 15 users, all converted) really do produce.
    """
    ev = read_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("arm"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    arms = users.groupBy("arm").agg(
        F.count("*").alias("n_users"), F.sum("converted").alias("n_conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("n_conv"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("n_conv"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pool = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    conv = F.col("c0") + F.col("c1")
    tot = F.col("n0") + F.col("n1")
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(p0, 6).alias("rate0"),
        F.round(p1, 6).alias("rate1"),
        F.when(
            (conv > 0) & (conv < tot),
            F.round(
                (p1 - p0)
                / F.sqrt(
                    pool
                    * (1 - pool)
                    * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
                ),
                6,
            ),
        ).alias("z_score"),
    )


# ===========================================================================
# Week-over-week growth
# ===========================================================================

_WOW_SQL = """
WITH weekly AS (
  SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS wk,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DECIMAL(30,6)) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, wk,
       CAST(v AS DOUBLE) AS total_value,
       ROUND(CAST(v AS DOUBLE) /
             CAST(LAG(v) OVER (PARTITION BY event_type ORDER BY wk)
                  AS DOUBLE) - 1, 6) AS wow_growth
FROM weekly
"""


@_register("wow_growth", _WOW_SQL, tags=("analytics", "timeseries"))
def q_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth rate of total value per event type — the
    lag-ratio reporting shape (MoM/YoY are the same plan with a
    different truncation). Decimal weekly sums collapse the stream
    first; the lag window partitions on the bounded event-type key,
    so its state is one prior row per group. NULL growth on each
    series' first week is the honest answer, not zero.
    """
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    weekly = ev.groupBy(
        "event_type", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).agg(
        F.sum(F.col("value").cast("decimal(30,6)"))
        .cast("decimal(30,6)")
        .alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("wk")
    return weekly.select(
        "event_type",
        "wk",
        F.col("v").cast("double").alias("total_value"),
        F.round(
            F.col("v").cast("double")
            / F.lag("v").over(w).cast("double")
            - 1,
            6,
        ).alias("wow_growth"),
    )
