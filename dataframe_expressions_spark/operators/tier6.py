"""Tier 6 — round-4 continuation: scale-pattern operators for the
training-data pipeline that earlier tiers don't yet demonstrate.

* ``decontam_bloom`` — the runtime-filter decontamination shape: a Bloom
  sketch built over the (small) held-out side prefilters the corpus scan
  BEFORE the shuffle, then an exact semi-join kills false positives.
* ``sample_reservoir`` — deterministic per-group k-reservoir via a
  two-phase (salted partial top-k → final top-k) ranking, the skew-safe
  replacement for a single window over a hot group.
* ``agg_mode`` — exact per-group mode with a total tie order plus exact
  interpolated median, the "what's typical per slice" profiling query.
* ``stats_chi2`` — chi-square independence over a two-column contingency
  table in one shuffle (cells once, marginals by re-aggregating cells).
* ``join_interval_bucketed`` — interval-overlap join lowered to an
  equi-join on a time bucket (interval length == bucket width, so each
  event hits exactly one bucket and each interval spans at most two —
  no pair is ever produced twice and no dedup pass is needed).

Oracle discipline matches tier2/tier5: bigint counts, doubles rounded
after aggregation, identical aliases on both engines, and the portable
``char_fingerprint`` (functions/text.py:85) wherever a deterministic
content-keyed order is required — DuckDB mirrors it exactly with
``list_reduce``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SDF
from pyspark.sql import SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions import dedup as D
from ..functions import text as TX
from ..sources.tables import epoch_us, load_table
from .registry import query

# DuckDB mirror of functions/text.py:char_fingerprint — identical value,
# verified bit-for-bit by tests/test_oracle_parity.py on every id using it.
_FP_SQL = """
      list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(range(1, length(text) + 1),
                                 i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
                  (a, x) -> (a * 31 + x) % 1000000007)
"""


_BLOOM_BITS = 1 << 16  # m: sized by the EVAL side (small by construction)
_BLOOM_K = 4


def _bloom_positions(fp: F.Column) -> F.Column:
    """k independent bit positions per fingerprint (xxhash64 seeded by the
    probe index via an extra hashed column)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(fp, F.lit(i)), F.lit(_BLOOM_BITS))
            for i in range(_BLOOM_K)
        ]
    )


@query(
    "decontam_bloom",
    """
    WITH pre AS (SELECT doc_id, source, substr(text, 1, 40) AS text
                 FROM documents),
    fp AS (SELECT doc_id, source,
                  list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(range(1, length(text) + 1),
                      i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
                    (a, x) -> (a * 31 + x) % 1000000007) AS fp
           FROM pre),
    eval AS (SELECT fp FROM fp WHERE doc_id % 17 = 0)
    SELECT source, count(*) AS n_contam
    FROM fp
    WHERE doc_id % 17 <> 0
      AND fp IN (SELECT fp FROM eval)
    GROUP BY source
    ORDER BY source
    """,
)
def decontam_bloom(spark: SparkSession, sf_dir: str) -> SDF:
    """Benchmark decontamination with an explicit Bloom runtime filter:
    the held-out eval set (``doc_id % 17 = 0``, standing in for a
    benchmark corpus) contributes k=4 hash positions per leading-40-char
    fingerprint (benchmark leakage shows up as shared openings long
    before full-text equality) into a 2^16-bit Bloom bitmap, stored
    sparsely as ``map<word, or-of-bits>`` (32-bit words via ``bit_or``)
    and broadcast as ONE row.  The corpus scan drops non-members
    map-side (``forall`` over the k positions) BEFORE any shuffle; an
    exact fingerprint semi-join then removes Bloom false positives.

    ``bloom_filter_agg``/``might_contain`` exist in Catalyst but are not
    registered SQL functions (they are optimizer-injected for shuffle
    joins), so the bitmap is built from registered built-ins — same
    semantics, and it works across the eval-set materialization boundary
    the optimizer can't see through.

    Scale: a semi-join alone shuffles every corpus fingerprint; the
    Bloom prefilter cuts shuffled volume to ~contamination rate + FP
    rate ((kn/m)^k ≈ 1e-11 here).  The sketch is O(m) bits regardless of
    corpus size, the crossJoin is 1-row broadcast, the verify join sees
    only survivors."""
    docs = D.spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "source",
        TX.char_fingerprint(F.substring(F.col("text"), 1, 40)).alias("fp"),
    )
    eval_fp = docs.where(F.col("doc_id") % 17 == 0).select("fp")
    corpus = docs.where(F.col("doc_id") % 17 != 0)

    # 2^bit as long via pow(): bits are % 32, so the double is exact and
    # the ANSI cast can't overflow.
    words = (
        eval_fp.select(F.explode(_bloom_positions(F.col("fp"))).alias("pos"))
        .select(
            F.expr("pos div 32").alias("word"),
            F.pow(F.lit(2.0), F.pmod(F.col("pos"), 32).cast("double"))
            .cast("long")
            .alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bf")
    )

    def is_set(pos: F.Column) -> F.Column:
        # try_element_at: ANSI-safe NULL (not an error) on a missing word
        word = F.try_element_at(F.col("bf"), F.floor(pos / 32).cast("long"))
        mask = F.pow(F.lit(2.0), F.pmod(pos, 32).cast("double")).cast("long")
        return F.coalesce(word, F.lit(0).cast("long")).bitwiseAND(mask) != 0

    prefiltered = corpus.crossJoin(F.broadcast(bloom)).where(
        F.forall(_bloom_positions(F.col("fp")), is_set)
    )
    hits = prefiltered.join(F.broadcast(eval_fp), "fp", "left_semi")
    return (
        hits.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_contam"))
        .orderBy("source")
    )


@query(
    "sample_reservoir",
    f"""
    WITH fp AS (SELECT doc_id, lang, {_FP_SQL} AS fp FROM documents),
    r AS (SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang ORDER BY fp, doc_id)
                   AS rank
          FROM fp)
    SELECT lang, doc_id, rank FROM r WHERE rank <= 10
    """,
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> SDF:
    """Deterministic k=10 per-language reservoir sample: rank docs by
    content fingerprint (a uniform-ish, rerun-stable surrogate for a
    random draw — the only kind of "random" a lineage-tracked pipeline
    should use) and keep the k smallest per group.

    Scale: a single window over ``lang`` would funnel an entire hot
    language (English ≈ half the web) through one task.  Instead phase 1
    ranks within (lang, fp-salt) — 8-way parallel even for one group —
    and keeps k per salt; phase 2 re-ranks the ≤ 8k survivors per group.
    Every member of the true per-group top-k is top-k within its own
    salt bucket, so the two-phase result is exact (same argument as
    partial top-k aggregation).  The oracle needs no salt phase — same
    result by construction."""
    docs = D.spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", TX.char_fingerprint(F.col("text")).alias("fp")
    )
    partial = (
        docs.withColumn("salt", F.col("fp") % 8)
        .withColumn(
            "prank",
            F.row_number().over(
                W.partitionBy("lang", "salt").orderBy("fp", "doc_id")
            ),
        )
        .where(F.col("prank") <= 10)
    )
    final = partial.withColumn(
        "rank",
        F.row_number().over(W.partitionBy("lang").orderBy("fp", "doc_id")),
    ).where(F.col("rank") <= 10)
    return final.select("lang", "doc_id", "rank")


@query(
    "agg_mode",
    """
    WITH c AS (SELECT lang, source, count(*) AS n
               FROM documents GROUP BY lang, source),
    m AS (SELECT lang, source AS mode_source
          FROM (SELECT lang, source,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY n DESC, source) AS rn
                FROM c)
          WHERE rn = 1),
    med AS (SELECT lang, round(CAST(median(n_chars) AS DOUBLE), 6)
                     AS med_chars
            FROM documents GROUP BY lang)
    SELECT m.lang, m.mode_source, med.med_chars
    FROM m JOIN med ON m.lang = med.lang
    ORDER BY m.lang
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> SDF:
    """Exact per-group mode + interpolated median — the profiling pair
    "most common / typical value per slice".  Mode ties break on the
    smaller source string (a TOTAL order; Spark's native ``F.mode`` is
    explicitly nondeterministic under ties, so it can never be
    oracle-checked — build the deterministic form instead).

    Scale: mode reduces the input to (group × value) counts FIRST (one
    shuffle with map-side combine; the window then ranks a tiny
    aggregate, never raw rows).  Median is the one genuinely
    sort-heavy aggregate — Spark's ``median`` runs per-group
    QuantileSummaries with relativeError=0 rather than a global sort,
    which is the right distributed shape."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    mode = (
        cells.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("lang").orderBy(F.desc("n"), F.asc("source"))
            ),
        )
        .where(F.col("rn") == 1)
        .select("lang", F.col("source").alias("mode_source"))
    )
    med = docs.groupBy("lang").agg(
        F.round(F.median("n_chars").cast("double"), 6).alias("med_chars")
    )
    return mode.join(med, "lang").orderBy("lang")


@query(
    "stats_chi2",
    """
    WITH cells AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS o
                   FROM documents GROUP BY lang, source),
    tot AS (SELECT sum(o) AS n FROM cells),
    rt AS (SELECT lang, sum(o) AS r FROM cells GROUP BY lang),
    ct AS (SELECT source, sum(o) AS c FROM cells GROUP BY source),
    terms AS (SELECT round((o - r * c / n) * (o - r * c / n)
                           / (r * c / n), 9) AS v
              FROM cells
              JOIN tot ON true
              JOIN rt USING (lang)
              JOIN ct USING (source))
    SELECT round(CAST((SELECT sum(CAST(v AS DECIMAL(38,9))) FROM terms)
                      AS DOUBLE), 6) AS chi2,
           CAST((SELECT count(*) - 1 FROM rt)
                * (SELECT count(*) - 1 FROM ct) AS BIGINT) AS dof,
           CAST((SELECT n FROM tot) AS BIGINT) AS n
    """,
)
def stats_chi2(spark: SparkSession, sf_dir: str) -> SDF:
    """Chi-square test of independence (lang × source contingency): is
    document language independent of its source?  The pipeline question
    behind mixture design — a high chi2 means per-source language
    balancing is needed before sampling.

    Scale: ONE shuffle builds the contingency cells (map-side combined);
    marginals re-aggregate the cells (lang×source cardinality, not
    rows), and the expected-count join is broadcast both ways.  Expected
    counts are never materialized per row — the O(rows) part of the job
    is exactly the one groupBy.  Cell terms are inexact doubles, so each
    term is rounded to 9 decimals in the cells-sized frame and the sum
    DECIMAL-folds the rounded values — partition-order independent with
    no plan-shape assumption (the earlier coalesce(1)+sortWithinPartitions
    pin relied on Catalyst sparing a sort under an order-insensitive
    aggregate, which EliminateSorts may drop in other Spark versions —
    r5 advisor note; this is the stats_mutual_info discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    tot = cells.agg(F.sum("o").alias("n"))
    rt = cells.groupBy("lang").agg(F.sum("o").alias("r"))
    ct = cells.groupBy("source").agg(F.sum("o").alias("c"))
    joined = (
        cells.crossJoin(F.broadcast(tot))
        .join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .withColumn("e", F.col("r") * F.col("c") / F.col("n"))
    )
    dof = rt.crossJoin(ct).agg(
        (
            (F.count_distinct("lang") - 1) * (F.count_distinct("source") - 1)
        ).alias("dof")
    )
    return (
        joined.select(
            F.round((F.col("o") - F.col("e")) ** 2 / F.col("e"), 9).alias("v"),
            "n",
        )
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(38,9)")).cast("double"), 6
            ).alias("chi2"),
            F.first("n").cast("bigint").alias("n"),
        )
        .crossJoin(F.broadcast(dof))
        .select("chi2", F.col("dof").cast("bigint").alias("dof"), "n")
    )


@query(
    "join_interval_bucketed",
    """
    WITH s AS (SELECT event_id AS s_id, user_id, ts FROM events
               WHERE event_type = 'signup'),
    p AS (SELECT event_id AS p_id, user_id, ts FROM events
          WHERE event_type = 'purchase')
    SELECT s.user_id, count(*) AS n_pairs
    FROM s JOIN p
      ON s.user_id = p.user_id
     AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 10 MINUTE
    GROUP BY s.user_id
    ORDER BY n_pairs DESC, s.user_id
    LIMIT 20
    """,
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> SDF:
    """Interval-overlap join by time-bucketing: signup events open a
    10-minute half-open window [ts, ts+10m); count same-user purchases
    inside any window; top-20 users by pair count (ties broken on
    user_id, so the limit is deterministic).

    Scale: the naive lowering is a (user_id) equi-join with a range
    residual — fine until one user is hot, and Spark would still
    compare every signup×purchase pair per user.  Bucketing by the
    interval LENGTH (10 min) makes it a (user_id, bucket) equi-join:
    each purchase belongs to exactly one bucket, each interval spans at
    most two (exploded via array_distinct, so an aligned interval emits
    one bucket, not a duplicate pair) — a pair can meet in at most one
    bucket, so no post-join dedup is needed and the comparison count
    drops from O(per-user²) to O(pairs actually within ±1 bucket).
    Same trick Structured Streaming's stream-stream range join applies
    via watermark buckets."""
    ev = load_table(spark, sf_dir, "events")
    bucket_us = 600 * 1_000_000  # 10 min, == interval length
    sig = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("s_id"),
        "user_id",
        epoch_us("ts").alias("s_us"),
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        epoch_us("ts").alias("p_us"),
    )
    # testdata epochs are non-negative, so `div` (truncating) == floor here
    pur = pur.withColumn("bucket", F.expr(f"p_us div {bucket_us}"))
    sig_b = sig.withColumn(
        "bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"s_us div {bucket_us}"),
                    F.expr(f"(s_us + {bucket_us} - 1) div {bucket_us}"),
                )
            )
        ),
    )
    pairs = sig_b.join(pur, ["user_id", "bucket"]).where(
        (F.col("p_us") >= F.col("s_us"))
        & (F.col("p_us") < F.col("s_us") + bucket_us)
    )
    return (
        pairs.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), F.asc("user_id"))
        .limit(20)
    )


_COS6 = (
    "list_inner_product({l}.v, {r}.v)"
    " / (sqrt(list_inner_product({l}.v, {l}.v))"
    "    * sqrt(list_inner_product({r}.v, {r}.v)))"
)


@query(
    "emb_dim_slice",
    f"""
    WITH e0 AS (SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings),
    full_e AS (SELECT * FROM e0 WHERE list_inner_product(v, v) > 0),
    full_q AS (SELECT vec_id AS qid, v FROM full_e WHERE vec_id < 5),
    full_r AS (
      SELECT qid, vid FROM (
        SELECT q.qid, e.vec_id AS vid,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY round({_COS6.format(l='q', r='e')}, 4) DESC,
                          e.vec_id) AS rk
        FROM full_e e JOIN full_q q ON e.vec_id != q.qid)
      WHERE rk <= 10),
    s0 AS (SELECT vec_id, v[1:8] AS v FROM e0),
    sl_e AS (SELECT * FROM s0 WHERE list_inner_product(v, v) > 0),
    sl_q AS (SELECT vec_id AS qid, v FROM sl_e WHERE vec_id < 5),
    sl_r AS (
      SELECT qid, vid FROM (
        SELECT q.qid, e.vec_id AS vid,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY round({_COS6.format(l='q', r='e')}, 4) DESC,
                          e.vec_id) AS rk
        FROM sl_e e JOIN sl_q q ON e.vec_id != q.qid)
      WHERE rk <= 10),
    m AS (SELECT f.qid, count(s.vid) AS n_match
          FROM full_r f LEFT JOIN sl_r s
            ON f.qid = s.qid AND f.vid = s.vid
          GROUP BY f.qid),
    n AS (SELECT qid, count(*) AS n_full FROM full_r GROUP BY qid)
    SELECT m.qid, CAST(m.n_match AS BIGINT) AS n_match,
           round(CAST(m.n_match AS DOUBLE) / n.n_full, 4) AS recall
    FROM m JOIN n ON m.qid = n.qid
    ORDER BY m.qid
    """,
)
def emb_dim_slice(spark: SparkSession, sf_dir: str) -> SDF:
    """Matryoshka-style dimension truncation: score the same brute-force
    cosine top-10 in the FIRST-8-DIMS subspace and report recall against
    the full-dimension top-10 per query — the measurement that decides
    whether a cheap truncated index can front a full-dimension reranker.

    Scale: the truncated representation is the 100 TB play — 8/D of the
    scan bytes and FLOPs for the candidate pass — and this operator IS
    the acceptance test for it.  Both passes reuse ``cosine_topk``
    (broadcast queries, corpus never shuffles, one codegen'd map stage);
    the recall join touches only 2 × (queries × k) rows.  Zero-norm
    SLICED vectors (nonzero tail outside the window) are excluded by the
    kernel's zero-norm guard on both engines."""
    from ..functions import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    sliced = emb.select(
        "vec_id",
        F.slice(F.col("embedding").cast("array<double>"), 1, 8).alias(
            "embedding"
        ),
    )
    qids = [0, 1, 2, 3, 4]
    full_r = S.cosine_topk(emb, query_ids=qids, k=10).select("qid", "vid")
    sl_r = S.cosine_topk(sliced, query_ids=qids, k=10).select(
        F.col("qid").alias("sqid"), F.col("vid").alias("svid")
    )
    matched = full_r.join(
        sl_r,
        (F.col("qid") == F.col("sqid")) & (F.col("vid") == F.col("svid")),
        "left",
    )
    return (
        matched.groupBy("qid")
        .agg(
            F.count("svid").alias("n_match"),
            F.count(F.lit(1)).alias("n_full"),
        )
        .select(
            "qid",
            F.col("n_match").cast("bigint").alias("n_match"),
            F.round(
                F.col("n_match").cast("double") / F.col("n_full"), 4
            ).alias("recall"),
        )
        .orderBy("qid")
    )


@query(
    "stats_ks_test",
    """
    WITH ab AS (SELECT value,
                       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
                       CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS b
                FROM events WHERE event_type IN ('purchase', 'click')),
    cells AS (SELECT value, CAST(sum(a) AS BIGINT) AS a_cnt,
                     CAST(sum(b) AS BIGINT) AS b_cnt
              FROM ab GROUP BY value),
    tot AS (SELECT CAST(sum(a_cnt) AS BIGINT) AS n_a,
                   CAST(sum(b_cnt) AS BIGINT) AS n_b FROM cells),
    cum AS (SELECT sum(a_cnt) OVER (ORDER BY value) AS ca,
                   sum(b_cnt) OVER (ORDER BY value) AS cb
            FROM cells)
    SELECT round(max(abs(CAST(ca AS DOUBLE) / nullif(n_a, 0)
                         - CAST(cb AS DOUBLE) / nullif(n_b, 0))), 6)
             AS d_stat,
           (SELECT n_a FROM tot) AS n_a,
           (SELECT n_b FROM tot) AS n_b
    FROM cum JOIN tot ON true
    """,
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> SDF:
    """Exact two-sample Kolmogorov-Smirnov D between the purchase and
    click value distributions — the distribution-drift gate a pipeline
    runs between data vintages (no normality assumption, unlike
    stats_ab_welch).  D = max |F_A - F_B| evaluated at every distinct
    combined value (step CDFs attain their sup at sample points).

    Scale: the textbook formulation is a GLOBAL ordered cumsum — a
    single-task window.  Instead the prefix sum is two-phase: per-value
    counts bucket by floor(value/10); cumulative bucket offsets come
    from a window over the tiny bucket-total aggregate (thousands of
    rows at most — same "rank the aggregate, not the rows" rationale as
    agg_mode); within-bucket cumsums run partitioned by bucket.  The
    only unpartitioned window touches bucket totals, never rows, so the
    job stays parallel at any scale.  CDF ratios are IEEE-identical on
    both engines (same operands, same ops), so max + round(6) is
    deterministic."""
    ev = load_table(spark, sf_dir, "events")
    ab = ev.where(F.col("event_type").isin("purchase", "click")).select(
        "value",
        (F.col("event_type") == "purchase").cast("long").alias("a"),
        (F.col("event_type") == "click").cast("long").alias("b"),
    )
    cells = (
        ab.groupBy("value")
        .agg(F.sum("a").alias("a_cnt"), F.sum("b").alias("b_cnt"))
        .withColumn("bucket", F.floor(F.col("value") / 10.0).cast("long"))
    )
    btot = cells.groupBy("bucket").agg(
        F.sum("a_cnt").alias("ba"), F.sum("b_cnt").alias("bb")
    )
    w_b = (
        # global window [aggregate-sized]: cumulative offsets over BUCKET
        # totals (value-range/10 rows)
        # (inventoried in tests/test_window_audit.py)
        W.orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offs = btot.select(
        "bucket",
        (F.sum("ba").over(w_b) - F.col("ba")).alias("off_a"),
        (F.sum("bb").over(w_b) - F.col("bb")).alias("off_b"),
    )
    tot = cells.agg(
        F.sum("a_cnt").cast("bigint").alias("n_a"),
        F.sum("b_cnt").cast("bigint").alias("n_b"),
    )
    w_v = (
        W.partitionBy("bucket")
        .orderBy("value")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = (
        cells.withColumn("wa", F.sum("a_cnt").over(w_v))
        .withColumn("wb", F.sum("b_cnt").over(w_v))
        .join(F.broadcast(offs), "bucket")
        .select(
            (F.col("wa") + F.col("off_a")).alias("ca"),
            (F.col("wb") + F.col("off_b")).alias("cb"),
        )
    )
    # nullif: an absent cohort (n=0) yields a NULL D, not an ANSI
    # divide-by-zero job abort — the degenerate-slice contract shared
    # with stats_ab_welch.  The global agg returns ONE all-NULL row on
    # empty input; the oracle's scalar-subquery form matches that.
    n_a0 = F.nullif(F.col("n_a").cast("double"), F.lit(0.0))
    n_b0 = F.nullif(F.col("n_b").cast("double"), F.lit(0.0))
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("ca").cast("double") / n_a0
                        - F.col("cb").cast("double") / n_b0
                    )
                ),
                6,
            ).alias("d_stat"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )


@query(
    "stats_mann_whitney",
    """
    WITH ab AS (SELECT value,
                       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
                       CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS b
                FROM events WHERE event_type IN ('purchase', 'click')),
    cells AS (SELECT value, CAST(sum(a) AS BIGINT) AS a_cnt,
                     CAST(sum(b) AS BIGINT) AS b_cnt
              FROM ab GROUP BY value),
    tot AS (SELECT CAST(sum(a_cnt) AS BIGINT) AS n_a,
                   CAST(sum(b_cnt) AS BIGINT) AS n_b FROM cells),
    cum AS (SELECT a_cnt, b_cnt,
                   sum(a_cnt + b_cnt) OVER (ORDER BY value)
                     - (a_cnt + b_cnt) AS c_before
            FROM cells),
    r AS (SELECT sum(CAST(a_cnt AS DOUBLE)
                     * (c_before + (a_cnt + b_cnt + 1) / 2.0)) AS r_a,
                 sum(CAST(a_cnt + b_cnt AS DOUBLE)
                     * (a_cnt + b_cnt) * (a_cnt + b_cnt)
                     - (a_cnt + b_cnt)) AS tie3
          FROM cum)
    SELECT round(r_a - n_a * (n_a + 1) / 2.0, 6) AS u_a,
           round((r_a - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
                 / nullif(sqrt(n_a * n_b / 12.0
                        * ((n_a + n_b + 1)
                           - tie3 / nullif((n_a + n_b)
                                     * CAST(n_a + n_b - 1 AS DOUBLE), 0))),
                          0), 6)
             AS z,
           n_a, n_b
    FROM r JOIN tot ON true
    """,
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> SDF:
    """Mann-Whitney U (rank-sum) between the purchase and click value
    distributions, with midrank tie handling and the tie-corrected
    normal approximation z — the nonparametric location-shift companion
    to ``stats_ks_test``'s shape test.

    Scale: ranks are never assigned to rows.  Midranks come from the
    per-distinct-value cells (c_before + (tie+1)/2), so the heavy input
    collapses to one (value) groupBy before any ordering happens — and
    because distinct values of a continuous metric are ~row-many, the
    cumulative-before count uses the SAME two-phase prefix sum as
    stats_ks_test: bucket offsets from a window over the tiny
    bucket-total aggregate, within-bucket cumsums partitioned by
    bucket.  No unpartitioned window ever sees a row-sized input.  All
    sums fold in double over identical operands on both engines, so
    round(6) is stable."""
    ev = load_table(spark, sf_dir, "events")
    ab = ev.where(F.col("event_type").isin("purchase", "click")).select(
        "value",
        (F.col("event_type") == "purchase").cast("long").alias("a"),
        (F.col("event_type") == "click").cast("long").alias("b"),
    )
    cells = (
        ab.groupBy("value")
        .agg(F.sum("a").alias("a_cnt"), F.sum("b").alias("b_cnt"))
        .withColumn("bucket", F.floor(F.col("value") / 10.0).cast("long"))
    )
    tie = F.col("a_cnt") + F.col("b_cnt")
    btot = cells.groupBy("bucket").agg(F.sum(tie).alias("bt"))
    # global window [aggregate-sized]: same two-phase prefix sum as
    # stats_ks_test
    # (inventoried in tests/test_window_audit.py)
    w_b = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    offs = btot.select(
        "bucket", (F.sum("bt").over(w_b) - F.col("bt")).alias("off")
    )
    w_v = (
        W.partitionBy("bucket")
        .orderBy("value")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = (
        cells.withColumn("wt", F.sum(tie).over(w_v))
        .join(F.broadcast(offs), "bucket")
        .select(
            "a_cnt",
            "b_cnt",
            (F.col("wt") + F.col("off") - tie).alias("c_before"),
        )
    )
    r = cum.agg(
        F.sum(
            F.col("a_cnt").cast("double")
            * (
                F.col("c_before")
                + (F.col("a_cnt") + F.col("b_cnt") + 1) / 2.0
            )
        ).alias("r_a"),
        F.sum(
            tie.cast("double") * tie * tie - tie
        ).alias("tie3"),
    )
    tot = cells.agg(
        F.sum("a_cnt").cast("bigint").alias("n_a"),
        F.sum("b_cnt").cast("bigint").alias("n_b"),
    )
    out = r.crossJoin(F.broadcast(tot))
    u_a = F.col("r_a") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
    n = F.col("n_a") + F.col("n_b")
    # nullif guards (mirrored in the oracle): n <= 1 voids the tie
    # correction's n(n-1) divisor, and an all-tied sample makes sigma
    # EXACTLY 0 (the radicand cancels exactly in IEEE: tie3 and n(n-1)
    # are exact integers in double and their quotient n+1 is exact) —
    # both yield a NULL z instead of an ANSI divide-by-zero job abort
    sigma = F.nullif(
        F.sqrt(
            F.col("n_a") * F.col("n_b") / 12.0
            * (
                (n + 1)
                - F.col("tie3")
                / F.nullif((n * (n - 1)).cast("double"), F.lit(0.0))
            )
        ),
        F.lit(0.0),
    )
    return out.select(
        F.round(u_a, 6).alias("u_a"),
        F.round(
            (u_a - F.col("n_a") * F.col("n_b") / 2.0) / sigma, 6
        ).alias("z"),
        "n_a",
        "n_b",
    )


@query(
    "agg_bitmap_distinct",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    ORDER BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> SDF:
    """EXACT mergeable distinct counts via bitmap aggregates (Spark 3.5+
    `bitmap_bucket_number` / `bitmap_bit_position` /
    `bitmap_construct_agg` / `bitmap_or_agg` / `bitmap_count`): the
    exact counterpart to `agg_hll_rollup` for dense integer keys.
    Per-(event_type, bucket) bitmaps are built in one pass; the
    per-type count sums `bitmap_count` over buckets, and the global
    'ALL' row re-aggregates the SAME partials with `bitmap_or_agg` —
    rollup without rescanning raw data, and without HLL's error bar.

    Scale: each bitmap covers a 32768-id bucket (≤ 4 KB dense), so no
    single aggregation state grows with key cardinality — the (type,
    bucket) shuffle spreads a billion-user keyspace over ~30k buckets
    per type.  countDistinct at 100 TB re-shuffles every raw (type,
    user) pair PER ROLLUP LEVEL; the bitmap partials shuffle once and
    serve both levels (same rationale as the HLL twin, but exact — the
    right trade when keys are dense ints; HLL wins on sparse/string
    keys).  Exactness makes the oracle a plain COUNT(DISTINCT)."""
    ev = load_table(spark, sf_dir, "events")
    partials = ev.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
            "bm"
        )
    )
    per_type = partials.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n_users")
    )
    overall = (
        partials.groupBy("bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n_users"))
        .select(F.lit("ALL").alias("event_type"), "n_users")
    )
    return per_type.unionByName(overall).orderBy("event_type")


@query(
    "text_gopher_filter",
    """
    WITH t AS (SELECT doc_id, text,
                      list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x != '') AS toks
               FROM documents),
    s AS (SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_words,
                 CAST(list_sum(list_transform(toks, x -> length(x)))
                      AS DOUBLE) / nullif(len(toks), 0) AS mean_wl,
                 CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                      AS DOUBLE) / nullif(length(text), 0) AS sym_ratio,
                 len(list_intersect(list_distinct(toks),
                                    ['the', 'and', 'of', 'to', 'a']))
                   AS n_stop
          FROM t)
    SELECT doc_id, n_words,
           (n_words BETWEEN 10 AND 100000)
             AND (mean_wl BETWEEN 3.0 AND 10.0)
             AND (sym_ratio <= 0.2)
             AND (n_stop >= 2) AS keep,
           CASE WHEN NOT (n_words BETWEEN 10 AND 100000) THEN 'word_count'
                WHEN NOT (mean_wl BETWEEN 3.0 AND 10.0) THEN 'word_length'
                WHEN NOT (sym_ratio <= 0.2) THEN 'symbol_ratio'
                WHEN NOT (n_stop >= 2) THEN 'stopwords'
                END AS reason
    FROM s
    """,
)
def text_gopher_filter(spark: SparkSession, sf_dir: str) -> SDF:
    """Gopher-style rule filter (Rae et al. 2021 §A1.1, thresholds
    adapted to this corpus's ~300-char docs): word count in [10, 1e5],
    mean word length in [3, 10], symbol ratio ≤ 0.2 (non-alphanumeric
    proxy — the corpus has no '#'/'…' literals), ≥ 2 DISTINCT stopwords
    present.  Emits the verdict AND the first-failing rule — the reason
    column is what makes a 100 TB filter debuggable (rejection-rate
    drift per rule is the standard data-quality dashboard).

    Scale: map-only — one regex split staged ONCE per row (see
    stopword_count_toks: inline helpers would re-split per signal), all
    signals derived from the staged array, no shuffle at all.  Empty
    docs fail word_count first, so no NULL verdict escapes (the rule
    chain's three-valued logic is identical on both engines)."""
    docs = D.spread(load_table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", "text", TX.tokens(F.col("text")).alias("toks"))
    stop = F.array(*[F.lit(w) for w in ("the", "and", "of", "to", "a")])
    s = t.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_words"),
        TX.avg_token_len_toks(F.col("toks")).cast("double").alias("mean_wl"),
        F.try_divide(
            F.length(F.regexp_replace("text", r"[a-zA-Z0-9\s]", "")).cast(
                "double"
            ),
            F.length("text"),
        ).alias("sym_ratio"),
        F.size(F.array_intersect(F.array_distinct("toks"), stop)).alias(
            "n_stop"
        ),
    )
    r_wc = F.col("n_words").between(10, 100000)
    r_wl = F.col("mean_wl").between(3.0, 10.0)
    r_sym = F.col("sym_ratio") <= 0.2
    r_stop = F.col("n_stop") >= 2
    return s.select(
        "doc_id",
        "n_words",
        (r_wc & r_wl & r_sym & r_stop).alias("keep"),
        F.when(~r_wc, "word_count")
        .when(~r_wl, "word_length")
        .when(~r_sym, "symbol_ratio")
        .when(~r_stop, "stopwords")
        .alias("reason"),
    )


@query(
    "stream_transform_with_state",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           min(value) AS vmin,
           max(value) AS vmax
    FROM events
    GROUP BY user_id
    """,
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> SDF:
    """Spark 4 transformWithStateInPandas (the arbitrary-stateful-
    processing successor to applyInPandasWithState): per-user
    (count, min, max) summary in a ValueState on the ROCKSDB state
    store — see streaming/windows.py:tws_user_summary for the operator,
    the scale rationale, AND the environment gate (TWS needs
    google.protobuf for its state-server protocol; absent here, the
    identical summary runs on applyInPandasWithState).  The bounded
    source arrives as one micro-batch, so the final update equals the
    batch aggregate — full SQL oracle (min/max of doubles are exact
    picks, no rounding needed)."""
    from ..streaming.windows import tws_user_summary

    return tws_user_summary(spark, sf_dir)


@query(
    "scan_text",
    "SELECT n_nationkey, n_name FROM nation",
)
def scan_text(spark: SparkSession, sf_dir: str) -> SDF:
    """Raw text-line sink+source round-trip (``.text()`` writer → one
    line per record → ``spark.read.text`` → explicit delimiter parse):
    the ingestion shape of line-oriented raw corpora (WET/JSONL-adjacent
    dumps) where the format is too loose for a schema'd reader.

    Scale: read.text is splittable like any file source (parallelism =
    file splits), the parse is a map-only split+cast with NO inference
    pass, and malformed lines surface as NULL casts (ANSI-safe
    try_cast) instead of job aborts — the contract a 100 TB raw-dump
    ingest needs.  Fields are pipe-joined; nation names carry no '|'
    (same cleanliness assumption every delimited lake layout makes,
    stated here explicitly).

    The landing path is keyed on a hash of the FULL sf_dir plus this
    process id: basename-only keying collided across concurrent runs
    (pytest-xdist worker vs bench on the same sf basename), letting one
    process rmtree line files another was mid-read (r4 advisor note)."""
    import hashlib
    import os
    import shutil

    from ..sources.tables import sweep_dead_pid_dirs

    key = hashlib.sha256(
        os.path.abspath(sf_dir).encode()
    ).hexdigest()[:12]
    sweep_dead_pid_dirs("/tmp", "spark_graft_text_")  # crashed-run scratch
    out = f"/tmp/spark_graft_text_{key}_{os.getpid()}"
    shutil.rmtree(out, ignore_errors=True)
    nation = load_table(spark, sf_dir, "nation").select(
        F.concat_ws("|", F.col("n_nationkey"), F.col("n_name")).alias("value")
    )
    nation.write.mode("overwrite").text(out)
    back = spark.read.text(out)
    parts = F.split(F.col("value"), r"\|")
    return back.select(
        F.try_element_at(parts, F.lit(1)).try_cast("long").alias("n_nationkey"),
        F.try_element_at(parts, F.lit(2)).alias("n_name"),
    )
