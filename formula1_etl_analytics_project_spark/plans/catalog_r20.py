"""Round-20 catalog entries (round 5, second leg):

* `welch_ttest` - Welch's unequal-variance two-sample t-test over
  the same high-vs-low-priority price arms as `ks_two_sample` /
  `mann_whitney_u`, completing the two-sample family: parametric
  mean test (this), nonparametric location (MWU), whole-distribution
  (KS), proportions (`ab_test_ztest`). One conditional aggregate.
* `cramers_v` - effect size for r x c contingency tables
  (chi-squared normalized to [0,1]): the association strength
  between customer segment and order priority. The significance
  sibling `chi2_independence` answers "is there any dependence";
  this answers "how much".
* `quantile_normalization` - force every source's doc-length
  distribution onto the common (cross-source rank-mean) shape: the
  classic batch-effect remover (microarray lineage) an ML pipeline
  applies before pooling features from heterogeneous sources.
  Per-source ranks via windows partitioned BY SOURCE, rank-profile
  via a rank-keyed aggregate, map back by join.
* `km_survival` - Kaplan-Meier survival estimator over user
  activity lifetimes with right-censoring (users still active at
  the observation horizon): per distinct lifetime, at-risk counts
  from a reverse cumulative sum and the survival curve via
  exp(cumsum(ln(1 - d/n))) in log space, with the all-die endpoint
  (factor exactly 0) handled by flag, never by ln(0).
* `dp_noisy_release` - epsilon-differential-privacy release shape
  for per-source counts: sensitivity-1 count + Laplace(1/eps) noise
  via inverse-CDF. Noise input is a HASH-SEEDED uniform (pure
  function of the key), NOT real randomness - that is what makes
  the entry cross-engine testable; a production release swaps the
  seeded uniform for calibrated randomness and the plan shape is
  unchanged. The privacy family's release gate, after the audit
  triad (`k_anonymity_audit` / `t_closeness_audit`) and redaction
  (`pii_redact_docs`).

Cross-engine portability as plans/catalog.py: statistics assemble
from exact integers / decimal sums and hit doubles once through the
identical expression tree; ln/exp/sqrt parity on identical double
operands is the established container behavior (doc_entropy,
bm25_doc_scores, ab_test_ztest all driver-green); no DECIMAL / LIST
at the output boundary; counts are BIGINT.

Importing this module registers everything into catalog.CATALOG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from formula1_etl_analytics_project_spark.plans.catalog import _register
from formula1_etl_analytics_project_spark.sources.readers import read_table

# ===========================================================================
# Welch's t-test (unequal variances) over the priority arms
# ===========================================================================

_WELCH_SQL = """
WITH s AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS arm,
         CAST(o_totalprice AS DECIMAL(18,4)) AS x
  FROM orders
), agg AS (
  SELECT CAST(SUM(arm) AS BIGINT) AS n_a,
         CAST(COUNT(*) - SUM(arm) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 1 THEN x ELSE CAST(0 AS DECIMAL(18,4)) END)
              AS DOUBLE) AS s1_a,
         CAST(SUM(CASE WHEN arm = 0 THEN x ELSE CAST(0 AS DECIMAL(18,4)) END)
              AS DOUBLE) AS s1_b,
         CAST(SUM(CASE WHEN arm = 1 THEN x * CAST(x AS DECIMAL(19,4))
                       ELSE CAST(0 AS DECIMAL(37,8)) END) AS DOUBLE) AS s2_a,
         CAST(SUM(CASE WHEN arm = 0 THEN x * CAST(x AS DECIMAL(19,4))
                       ELSE CAST(0 AS DECIMAL(37,8)) END) AS DOUBLE) AS s2_b
  FROM s
), stats AS (
  SELECT n_a, n_b,
         s1_a / CAST(n_a AS DOUBLE) AS m_a,
         s1_b / CAST(n_b AS DOUBLE) AS m_b,
         (s2_a - s1_a * s1_a / CAST(n_a AS DOUBLE))
           / CAST(n_a - 1 AS DOUBLE) AS v_a,
         (s2_b - s1_b * s1_b / CAST(n_b AS DOUBLE))
           / CAST(n_b - 1 AS DOUBLE) AS v_b
  FROM agg
), se AS (
  SELECT n_a, n_b, m_a, m_b,
         v_a / CAST(n_a AS DOUBLE) AS se2_a,
         v_b / CAST(n_b AS DOUBLE) AS se2_b
  FROM stats
)
SELECT n_a, n_b,
       m_a AS mean_a,
       m_b AS mean_b,
       ROUND((m_a - m_b) / sqrt(se2_a + se2_b), 6) AS t_stat,
       ROUND((se2_a + se2_b) * (se2_a + se2_b)
             / (se2_a * se2_a / CAST(n_a - 1 AS DOUBLE)
                + se2_b * se2_b / CAST(n_b - 1 AS DOUBLE)),
             6) AS dof
FROM se
"""


@_register(
    "welch_ttest",
    _WELCH_SQL,
    tags=("stats",),
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test (unequal variances): do high- and
    low-priority orders differ in MEAN total, without assuming the
    two arms share a variance (the pooled-variance Student form is a
    special case that real pipelines almost never satisfy).
    Welch-Satterthwaite degrees of freedom reported alongside.

    Exactness: sums and sums-of-squares accumulate in DECIMAL
    (order-free). The square multiplies DECIMAL(18,4) by a
    DECIMAL(19,4) cast of itself: the 19-digit operand forces DuckDB
    onto 128-bit decimal storage (18 x 18 runs in 64-bit and
    overflows on real prices) while the 37,8 result stays under both
    engines' 38-digit cap. Convert to double ONCE, and every downstream
    mean/variance/t/dof is the identical expression tree in both
    engines - variance via the sum-of-squares identity
    (S2 - S1^2/n)/(n-1), never a second centered pass.

    Shape at 100 TB: ONE scan of (price, priority), one map-side
    combinable conditional aggregate to a single row; both arms, both
    moments, one pass. Nothing else touches the fact.
    """
    orders = read_table(spark, sf_dir, "orders", spread=True)
    x = F.col("o_totalprice").cast("decimal(18,4)")
    arm = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("arm")
    )
    zero4 = F.lit(0).cast("decimal(18,4)")
    zero8 = F.lit(0).cast("decimal(37,8)")
    s = orders.select(arm, x.alias("x"))
    agg = s.agg(
        F.sum("arm").cast("bigint").alias("n_a"),
        (F.count("*") - F.sum("arm")).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(zero4))
        .cast("double")
        .alias("s1_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(zero4))
        .cast("double")
        .alias("s1_b"),
        F.sum(
            F.when(F.col("arm") == 1, F.col("x") * F.col("x").cast("decimal(19,4)")).otherwise(
                zero8
            )
        )
        .cast("double")
        .alias("s2_a"),
        F.sum(
            F.when(F.col("arm") == 0, F.col("x") * F.col("x").cast("decimal(19,4)")).otherwise(
                zero8
            )
        )
        .cast("double")
        .alias("s2_b"),
    )
    n_a_d = F.col("n_a").cast("double")
    n_b_d = F.col("n_b").cast("double")
    m_a = F.col("s1_a") / n_a_d
    m_b = F.col("s1_b") / n_b_d
    v_a = (F.col("s2_a") - F.col("s1_a") * F.col("s1_a") / n_a_d) / (
        F.col("n_a") - 1
    ).cast("double")
    v_b = (F.col("s2_b") - F.col("s1_b") * F.col("s1_b") / n_b_d) / (
        F.col("n_b") - 1
    ).cast("double")
    se2_a = v_a / n_a_d
    se2_b = v_b / n_b_d
    return agg.select(
        "n_a",
        "n_b",
        m_a.alias("mean_a"),
        m_b.alias("mean_b"),
        F.round((m_a - m_b) / F.sqrt(se2_a + se2_b), 6).alias("t_stat"),
        F.round(
            (se2_a + se2_b) * (se2_a + se2_b)
            / (
                se2_a * se2_a / (F.col("n_a") - 1).cast("double")
                + se2_b * se2_b
                / (F.col("n_b") - 1).cast("double")
            ),
            6,
        ).alias("dof"),
    )


# ===========================================================================
# Cramer's V (association strength, segment x priority)
# ===========================================================================

_CRAMER_SQL = """
WITH obs AS (
  SELECT c_mktsegment AS seg, o_orderpriority AS prio, COUNT(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, o_orderpriority
), rowt AS (
  SELECT seg, SUM(n) AS rt FROM obs GROUP BY seg
), colt AS (
  SELECT prio, SUM(n) AS ct FROM obs GROUP BY prio
), tot AS (
  SELECT SUM(n) AS n_total,
         (SELECT COUNT(*) FROM rowt) AS r,
         (SELECT COUNT(*) FROM colt) AS c
  FROM obs
), chi AS (
  SELECT CAST(SUM(CAST((o.n - (r.rt * c.ct / CAST(t.n_total AS DOUBLE)))
                       * (o.n - (r.rt * c.ct / CAST(t.n_total AS DOUBLE)))
                       / (r.rt * c.ct / CAST(t.n_total AS DOUBLE))
                       AS DECIMAL(38,12))) AS DOUBLE) AS chi2
  FROM obs o
  JOIN rowt r USING (seg)
  JOIN colt c USING (prio)
  CROSS JOIN tot t
)
SELECT ROUND(chi2, 6) AS chi2,
       CAST(t.n_total AS BIGINT) AS n_total,
       CAST(LEAST(t.r - 1, t.c - 1) AS BIGINT) AS min_dim,
       ROUND(sqrt(chi2 / (CAST(t.n_total AS DOUBLE)
                          * CAST(LEAST(t.r - 1, t.c - 1) AS DOUBLE))),
             6) AS cramers_v
FROM chi CROSS JOIN tot t
"""


@_register(
    "cramers_v",
    _CRAMER_SQL,
    tags=("stats", "analytics"),
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V: chi-squared normalized by n * min(r-1, c-1) into a
    [0,1] association strength between customer market segment and
    order priority. `chi2_independence` (events x day-of-week) pins
    the significance question; V is the effect size - the number a
    feature-selection pass actually thresholds on, since at 100 TB
    every chi-squared is "significant".

    Shape at 100 TB: the contingency table is one hash-aggregation
    after a broadcast dimension join (|segments| x |priorities| = 25
    cells regardless of scale); marginals, chi2, and V all derive
    from that cell table. Terms decimal-sum (order-free); one sqrt at
    the end over identical doubles.
    """
    orders = read_table(spark, sf_dir, "orders", spread=True)
    customer = read_table(spark, sf_dir, "customer")
    obs = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(F.count("*").alias("n"))
    )
    # Densify marginals inside one per-grouping pass over the tiny
    # cell table: collect cells once, derive everything downstream
    # from k-row frames (obs is consumed by three aggregates; the
    # cell table is bounded, so re-deriving it would re-scan the
    # fact - collapse it to a localCheckpoint-free single consumer
    # via window functions over the 25-row frame instead).
    w_all = Window.partitionBy()
    w_row = Window.partitionBy("seg")
    w_col = Window.partitionBy("prio")
    cells = obs.select(
        "seg",
        "prio",
        "n",
        F.sum("n").over(w_row).alias("rt"),
        F.sum("n").over(w_col).alias("ct"),
        F.sum("n").over(w_all).alias("n_total"),
        F.size(F.collect_set("seg").over(w_all)).alias("r"),
        F.size(F.collect_set("prio").over(w_all)).alias("c"),
    )
    exp = F.col("rt") * F.col("ct") / F.col("n_total").cast("double")
    term = (
        (F.col("n") - exp) * (F.col("n") - exp) / exp
    ).cast("decimal(38,12)")
    chi = cells.groupBy("n_total", "r", "c").agg(
        F.sum(term).cast("double").alias("chi2")
    )
    min_dim = F.least(F.col("r") - 1, F.col("c") - 1)
    return chi.select(
        F.round("chi2", 6).alias("chi2"),
        F.col("n_total").cast("bigint").alias("n_total"),
        min_dim.cast("bigint").alias("min_dim"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("n_total").cast("double")
                    * min_dim.cast("double")
                )
            ),
            6,
        ).alias("cramers_v"),
    )


# ===========================================================================
# Quantile normalization of doc lengths across sources
# ===========================================================================

_QNORM_SQL = """
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rk
  FROM documents
), profile AS (
  SELECT rk,
         CAST(SUM(CAST(n_chars AS DECIMAL(30,4))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS ref_mean
  FROM ranked GROUP BY rk
)
SELECT r.doc_id, r.source, r.n_chars,
       p.ref_mean AS qnorm
FROM ranked r JOIN profile p USING (rk)
ORDER BY r.doc_id
"""


@_register(
    "quantile_normalization",
    _QNORM_SQL,
    tags=("ml", "window", "stats"),
)
def q_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization: replace each document's length with
    the cross-source mean of the values holding the same within-source
    rank, forcing every source onto one reference distribution - the
    batch-effect remover (microarray lineage) applied before pooling
    per-source features. Sources of unequal size contribute to the
    shared profile only up to their own depth (the standard ragged
    extension; documented, not hidden).

    Determinism: ranks are total (n_chars, doc_id); the reference
    profile is a decimal sum over exact integers divided once.

    Shape at 100 TB: the rank window partitions BY SOURCE (parallel
    across sources, the same sharding argument as
    `token_budget_select`'s NTILE); the profile is a rank-keyed
    hash aggregate (map-side combinable, cardinality = the largest
    source's depth); the map-back is an equi-join on rank. A single
    giant source degrades to that source's sort - the algorithm's
    own requirement. No global window anywhere.
    """
    docs = read_table(spark, sf_dir, "documents", spread=True)
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    # ranked feeds TWO consumers (the profile aggregate and the
    # map-back join) - without a boundary the per-source sort window
    # executes twice (the recompute trap, review catch)
    ranked = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w).alias("rk"),
    ).localCheckpoint()
    profile = ranked.groupBy("rk").agg(
        (
            F.sum(F.col("n_chars").cast("decimal(30,4)")).cast("double")
            / F.count("*").cast("double")
        ).alias("ref_mean")
    )
    return (
        ranked.join(profile, "rk")
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("ref_mean").alias("qnorm"),
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# Kaplan-Meier survival over user activity lifetimes
# ===========================================================================

_KM_HORIZON = "TIMESTAMP '2024-01-28 00:00:00'"

_KM_SQL = f"""
WITH life AS (
  SELECT user_id,
         date_diff('day', MIN(ts), MAX(ts)) AS dur,
         CASE WHEN MAX(ts) < {_KM_HORIZON} THEN 1 ELSE 0 END AS died
  FROM events GROUP BY user_id
), byd AS (
  SELECT dur,
         CAST(SUM(died) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS total
  FROM life GROUP BY dur
), risk AS (
  SELECT dur, d,
         CAST(SUM(total) OVER () -
              COALESCE(SUM(total) OVER (ORDER BY dur
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_risk
  FROM byd
), curve AS (
  SELECT dur, d, n_risk,
         CAST(SUM(CASE WHEN d < n_risk
                       THEN CAST(ROUND(ln(1.0 - CAST(d AS DOUBLE)
                                             / CAST(n_risk AS DOUBLE)), 9)
                                 AS DECIMAL(38,12))
                       ELSE CAST(0 AS DECIMAL(38,12)) END)
              OVER (ORDER BY dur) AS DOUBLE) AS log_s,
         MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
           OVER (ORDER BY dur) AS hit_zero
  FROM risk
)
SELECT dur AS duration_days, d AS n_died, n_risk,
       CASE WHEN hit_zero = 1 THEN 0.0
            ELSE ROUND(exp(log_s), 6) END AS s_hat
FROM curve
ORDER BY dur
"""


@_register(
    "km_survival",
    _KM_SQL,
    tags=("stats", "window", "analytics"),
)
def q_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator over user activity lifetimes
    (days between a user's first and last event), right-censored at
    the observation horizon: a user whose last event touches the
    final window is still alive ("censored"), not churned. At each
    distinct lifetime t: n_risk = users with lifetime >= t (reverse
    cumulative sum), d = churned there, and
    S(t) = prod_{s<=t} (1 - d_s/n_s), computed in log space
    (round(9)-guarded ln terms decimal-summed, one exp) so the
    product is order-independent and a cross-libm ln ulp cannot
    reach the sum. The all-die endpoint (d = n_risk, factor
    exactly 0) propagates as an explicit hit-zero FLAG - never
    ln(0) = -inf through the arithmetic (the non-finite-double sweep
    bans it).

    Shape at 100 TB: the per-user lifetime collapse is one map-side
    combinable aggregate; everything after runs on the
    distinct-lifetime table, whose cardinality is bounded by the
    calendar (days in the observation window), so its unpartitioned
    windows are bounded-size by construction - the calendar_dim
    argument, not a fact-table window.
    """
    events = read_table(spark, sf_dir, "events", spread=True)
    life = events.groupBy("user_id").agg(
        F.datediff(F.max("ts"), F.min("ts")).alias("dur"),
        F.when(
            F.max("ts") < F.lit("2024-01-28 00:00:00").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("died"),
    )
    byd = life.groupBy("dur").agg(
        F.sum("died").cast("bigint").alias("d"),
        F.count("*").cast("bigint").alias("total"),
    )
    w_all = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_before = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = byd.select(
        "dur",
        "d",
        (
            F.sum("total").over(w_all)
            - F.coalesce(F.sum("total").over(w_before), F.lit(0))
        )
        .cast("bigint")
        .alias("n_risk"),
    )
    # round(9) the ln BEFORE the decimal sum (degree_powerlaw idiom):
    # the DECIMAL(38,12) cast alone quantizes at 1e-12, weaker than
    # the documented cross-libm ln ulp tolerance.
    ln_term = F.when(
        F.col("d") < F.col("n_risk"),
        F.round(
            F.log(
                F.lit(1.0)
                - F.col("d").cast("double") / F.col("n_risk").cast("double")
            ),
            9,
        ).cast("decimal(38,12)"),
    ).otherwise(F.lit(0).cast("decimal(38,12)"))
    curve = risk.select(
        "dur",
        "d",
        "n_risk",
        F.sum(ln_term).over(w_cum).cast("double").alias("log_s"),
        F.max(
            F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
        )
        .over(w_cum)
        .alias("hit_zero"),
    )
    return curve.select(
        F.col("dur").alias("duration_days"),
        F.col("d").alias("n_died"),
        "n_risk",
        F.when(F.col("hit_zero") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("log_s"), 6))
        .alias("s_hat"),
    ).orderBy("duration_days")


# ===========================================================================
# Differentially-private release shape (seeded Laplace mechanism)
# ===========================================================================

_DP_EPS = 1.0

_DP_SQL = f"""
WITH cnt AS (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY source
), seeded AS (
  SELECT source, n,
         (CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) + 0.5)
           / 4294967296.0 - 0.5 AS u
  FROM cnt
)
SELECT source,
       ROUND(CAST(n AS DOUBLE)
             + (-1.0 / {_DP_EPS})
               * CASE WHEN u < 0 THEN -1.0 ELSE 1.0 END
               * ln(1.0 - 2.0 * abs(u)),
             6) AS noisy_count,
       CAST({_DP_EPS} AS DOUBLE) AS epsilon
FROM seeded
ORDER BY source
"""


@_register(
    "dp_noisy_release",
    _DP_SQL,
    tags=("privacy", "agg"),
)
def q_dp_noisy_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism release shape for per-source document
    counts: a COUNT query has sensitivity 1, so adding
    Laplace(1/epsilon) noise makes the released histogram
    epsilon-differentially private. Noise via inverse CDF:
    u ~ Uniform(-1/2, 1/2), noise = -(1/eps) sign(u) ln(1 - 2|u|).

    SEEDED, NOT RANDOM - deliberately: u derives from md5(source)
    (the +0.5 offset keeps u strictly inside the open interval, so
    ln never sees 0), making the entry a pure function of the data
    and therefore cross-engine checkable. A production release MUST
    swap the seeded uniform for calibrated randomness - deterministic
    noise is not private; the entry pins the mechanism's plan shape
    and arithmetic, which is identical either way. This is the
    release gate after the audit triad (`k_anonymity_audit`,
    `t_closeness_audit`): audit, remediate, then release with noise.

    Shape at 100 TB: one map-side combinable count to |sources|
    rows; the noise arithmetic runs on the k-row release table.
    """
    docs = read_table(spark, sf_dir, "documents", spread=True)
    cnt = docs.groupBy("source").agg(F.count("*").alias("n"))
    h = F.expr(
        "CAST(conv(substr(md5(source), 1, 8), 16, 10) AS BIGINT)"
    )
    u = (h + F.lit(0.5)) / F.lit(4294967296.0) - F.lit(0.5)
    noise = (
        F.lit(-1.0 / _DP_EPS)
        * F.when(u < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    )
    return (
        cnt.select(
            "source",
            F.round(F.col("n").cast("double") + noise, 6).alias(
                "noisy_count"
            ),
            F.lit(float(_DP_EPS)).alias("epsilon"),
        )
        .orderBy("source")
    )
