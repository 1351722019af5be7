"""Round-5 catalog entries: corpus-quality repetition signals
(Gopher-style filters), temperature-scaled domain mixing weights for
pretraining-data composition, and the positional-explode (ordinality)
surface.

Every entry follows the portability rules from plans/catalog.py:
integer arithmetic wherever possible, single-IEEE-op doubles from
identical expressions in both engines, round() only on final outputs,
md5 for hashes, unique-key tiebreaks under every LIMIT.

Importing this module registers everything into catalog.CATALOG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from formula1_etl_analytics_project_spark.functions.text import tokens
from formula1_etl_analytics_project_spark.plans.catalog import _register
from formula1_etl_analytics_project_spark.sources.readers import read_table

# ===========================================================================
# Repetition quality signals (Gopher-style corpus filters)
# ===========================================================================

_REPETITION_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(list_transform(
           list_filter(string_split_regex(trim(text), '\s+'),
                       x -> x <> ''),
           t -> lower(t))) AS w
  FROM documents
), wc AS (
  SELECT doc_id, w, COUNT(*) AS c, len(w) AS wlen
  FROM tok GROUP BY doc_id, w
), sig AS (
  SELECT doc_id,
         SUM(c) AS n_words,
         COUNT(*) AS n_distinct,
         MAX(c) AS top_c,
         SUM(wlen * c) AS n_word_chars
  FROM wc GROUP BY doc_id
)
SELECT doc_id, n_words, n_distinct,
       ROUND(CAST(top_c AS DOUBLE) / n_words, 6) AS top_word_frac,
       ROUND(CAST(n_words - n_distinct AS DOUBLE) / n_words, 6)
         AS dup_word_frac,
       ROUND(CAST(n_word_chars AS DOUBLE) / n_words, 6) AS mean_word_len,
       (CAST(top_c AS DOUBLE) / n_words > 0.1
        OR CAST(n_words - n_distinct AS DOUBLE) / n_words > 0.8)
         AS is_repetitive
FROM sig
"""


@_register(
    "repetition_signals",
    _REPETITION_SQL,
    tags=("text", "quality"),
    gate_priority=True,
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters - the signals a pretraining
    pipeline cuts boilerplate and degenerate pages on: per document,
    the most-frequent-word fraction, the duplicate-word fraction, and
    the mean word length, plus the combined keep/drop flag. Computed
    as explode -> hash-agg on (doc_id, word) -> hash-agg on doc_id:
    the word-level partial aggregate collapses the exploded rows
    MAP-SIDE before any shuffle, so the shuffle payload is the
    per-doc vocabulary, not the token stream - the property that
    keeps this one-pass at 100 TB. All ratios are int/int single
    IEEE divisions, bit-identical cross-engine; the flag compares
    those exact doubles, so the cut itself is reproducible. No UDF
    anywhere."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    tok = docs.select(
        "doc_id",
        F.explode(
            F.transform(tokens("text"), lambda t: F.lower(t))
        ).alias("w"),
    )
    wc = tok.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    sig = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_c"),
        F.sum(F.length("w") * F.col("c")).alias("n_word_chars"),
    )
    top_frac = F.col("top_c").cast("double") / F.col("n_words")
    dup_frac = (
        F.col("n_words") - F.col("n_distinct")
    ).cast("double") / F.col("n_words")
    return sig.select(
        "doc_id",
        "n_words",
        "n_distinct",
        F.round(top_frac, 6).alias("top_word_frac"),
        F.round(dup_frac, 6).alias("dup_word_frac"),
        F.round(
            F.col("n_word_chars").cast("double") / F.col("n_words"), 6
        ).alias("mean_word_len"),
        ((top_frac > 0.1) | (dup_frac > 0.8)).alias("is_repetitive"),
    )


# ===========================================================================
# Temperature-scaled domain mixing weights
# ===========================================================================

_MIX_SQL = r"""
WITH per_src AS (
  SELECT source,
         COUNT(*) AS n_docs,
         SUM(len(list_filter(string_split_regex(trim(text), '\s+'),
                             x -> x <> ''))) AS n_tokens,
         CAST(FLOOR(sqrt(COUNT(*)) * 1000000) AS BIGINT) AS sqrt_scaled
  FROM documents GROUP BY source
), tot AS (
  SELECT SUM(sqrt_scaled) AS total FROM per_src
)
SELECT source, n_docs, n_tokens,
       ROUND(CAST(sqrt_scaled AS DOUBLE) / total, 9) AS mix_weight
FROM per_src CROSS JOIN tot
"""


@_register(
    "domain_mix_weights",
    _MIX_SQL,
    tags=("text", "sampling"),
    gate_priority=True,
)
def q_domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-mix composition: per-domain doc and token counts
    with temperature-scaled sampling weights w_d = sqrt(n_d) / sum_d
    sqrt(n_d) (alpha = 0.5 - the standard up-weighting of small
    domains so the head domain cannot drown the mixture). sqrt is
    IEEE-exactly-rounded and its scaled FLOOR is a bigint, so the
    normalizing sum is EXACT integer arithmetic - no double-sum
    order dependence - and the final weight is one identical double
    division in both engines. Shape at 100 TB: one hash-agg keyed by
    domain (k rows out), the k-row total broadcast back - the fact
    table is scanned once and never reshuffled."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens("text"))).alias("n_tokens"),
        F.floor(F.sqrt(F.count("*")) * 1000000)
        .cast("bigint")
        .alias("sqrt_scaled"),
    )
    tot = per_src.agg(F.sum("sqrt_scaled").alias("total"))
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("sqrt_scaled").cast("double") / F.col("total"), 9
            ).alias("mix_weight"),
        )
    )


# ===========================================================================
# Positional explode (ordinality) surface
# ===========================================================================

_ORDINALITY_SQL = r"""
WITH toked AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'),
                     x -> x <> '') AS toks
  FROM documents WHERE doc_id % 50 = 0
)
SELECT doc_id, r.pos AS pos, r.tok AS tok
FROM (SELECT doc_id,
             unnest(list_transform(
               toks, (t, i) -> struct_pack(tok := t, pos := i - 1))) AS r
      FROM toked)
"""


@_register(
    "explode_ordinality",
    _ORDINALITY_SQL,
    tags=("lateral", "text"),
    gate_priority=True,
)
def q_explode_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinality-preserving explode (LATERAL VIEW posexplode): each
    token row carries its 0-based position in the source array - the
    primitive under sequence labeling, positional n-gram features, and
    chunk offsets. Spark's ``posexplode`` is generated per input row
    with no shuffle; the oracle restates it with DuckDB's indexed
    list_transform + unnest. Filter pushed to the scan bounds the
    blow-up; downstream consumers aggregate before any exchange."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    return (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select("doc_id", F.posexplode(tokens("text")).alias("pos", "tok"))
        .select("doc_id", "pos", "tok")
    )
