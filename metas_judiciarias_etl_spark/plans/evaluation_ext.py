"""Model-evaluation surface: exact ROC-AUC, average precision, and score
calibration over the (quality score, near-dup label) relation.

The reference pipeline's analytical kernels stop at descriptive aggregates
(SURVEY §2.4); a training-data engine additionally needs the MODEL-EVAL
loop closed: given a scalar score and a binary outcome, how discriminative
and how calibrated is the score? These operators treat the registered
quality score as the predictor and near-duplicate cluster membership as
the outcome — the exact pairing quality_dup_pointbiserial correlates —
and compute the three standard readouts: AUC (threshold-free ranking
power), average precision (ranking power under class imbalance), and a
reliability table + Brier decomposition (calibration).

Exactness disciplines (established tier rules):
* Scores enter as x = round(quality·10⁶) — an unambiguous integer on both
  engines (quality is already 6-dp rounded).
* AUC uses the Mann–Whitney identity with average ranks over tie blocks:
  2·R1 stays an exact INTEGER (mann_whitney_u discipline), so
  AUC = (2R1 − n1(n1+1)) / (2·n1·n0) is ONE double division of exact
  integers.
* Average precision pins a deterministic total order (x DESC, doc_id ASC)
  so ranks are engine-independent, computes each precision@k as one
  double division, and folds the per-positive terms in sorted-k order
  with a 0.0 seed (entropy_fold / chisq discipline).
* Calibration bins come from integer floor-division of x; per-bin squared
  error Σ(x − y·10⁶)² accumulates in DECIMAL(38,0) before ONE cast
  (HUGEINT→DOUBLE 1-ulp trap).

Scale notes (100 TB):
* All three scan the corpus once through the quality kernel (map-only
  expressions) plus ONE doc_id-keyed left join against the near-dup
  cluster table (near-dup-scale, not corpus-scale).
* roc_auc_exact / score_calibration_bins then collapse to the distinct
  score support / 10 bins — partial-aggregatable, no row-level sort.
* pr_auc_average_precision is the one operator with a genuine total
  order (a global rank is part of its DEFINITION). The window runs over
  the corpus — at 100 TB swap the exact rank for a two-phase rank
  (per-partition rank + boundary offsets from a partition-count pass) or
  evaluate AP on a score-threshold head; the plan here is the exact
  single-sort form, acceptable because AP is an offline audit, not a
  per-batch kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import registry
from ..operators import dedup as _dedup  # noqa: F401  (registers dedup_clusters' oracle)
from ..operators import textstats as _textstats  # noqa: F401  (registers text_quality's oracle)
from ..registry import query
from ..sources.parquet import load_table  # noqa: F401  (module convention)

# Fixed-point scale for the 6-dp quality score.
_Q_SCALE = 1_000_000
# Equal-width calibration bins over quality in [0, 1]; scores outside
# clamp into the edge bins.
N_CALIB_BINS = 10
_BIN_WIDTH = _Q_SCALE // N_CALIB_BINS


def _scored_ctes() -> str:
    """Shared oracle CTEs: quality score x (fixed-point int) + dup label y,
    keyed by doc_id. Mirrors quality_dup_pointbiserial's join exactly."""
    return f"""
    WITH q AS MATERIALIZED ({registry.ORACLES['text_quality']}),
    cl AS MATERIALIZED ({registry.ORACLES['dedup_clusters']}),
    sc AS (
        SELECT q.doc_id,
               CAST(round(q.quality * {_Q_SCALE}) AS BIGINT) AS x,
               CASE WHEN cl.doc_id IS NULL THEN 0 ELSE 1 END AS y
        FROM q LEFT JOIN cl ON cl.doc_id = q.doc_id
        WHERE q.quality IS NOT NULL
    )"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, x, y): fixed-point quality score + near-dup membership.

    Memoized per (session, sf_dir): six evaluation queries consume this
    frame, and its dup label composes the (also memoized) iterative
    dedup_clusters labeling — pay the join once per process."""
    from ..memo import shared

    return shared(
        spark, sf_dir, "eval_scored", lambda: _scored_build(spark, sf_dir)
    )


def _scored_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = registry.QUERIES["text_quality"](spark, sf_dir).filter(
        F.col("quality").isNotNull()
    )
    cl = (
        registry.QUERIES["dedup_clusters"](spark, sf_dir)
        .select("doc_id")
        .withColumn("is_dup", F.lit(1))
    )
    return q.join(cl, "doc_id", "left").select(
        "doc_id",
        F.expr(f"CAST(round(quality * {_Q_SCALE}) AS BIGINT)").alias("x"),
        F.coalesce(F.col("is_dup"), F.lit(0)).alias("y"),
    )


# ---------------------------------------------------------------------------
# Exact tie-corrected ROC-AUC via the Mann–Whitney identity.
# ---------------------------------------------------------------------------
@query(
    "roc_auc_exact",
    oracle=_scored_ctes()
    + """
    , per_v AS (
        SELECT x AS v, CAST(count(*) AS BIGINT) AS t,
               CAST(sum(y) AS BIGINT) AS t1
        FROM sc GROUP BY x
    ), ranked AS (
        SELECT v, t, t1,
               CAST(coalesce(sum(t) OVER (
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS below
        FROM per_v
    ), sums AS (
        SELECT CAST(sum(t1) AS BIGINT) AS n1,
               CAST(sum(t - t1) AS BIGINT) AS n0,
               CAST(sum(t1 * (2 * below + t + 1)) AS BIGINT) AS two_r1
        FROM ranked
    )
    SELECT n1 AS n_pos, n0 AS n_neg,
           CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE)
               / nullif(CAST(2 * n1 * n0 AS DOUBLE), 0.0) AS auc
    FROM sums
    """,
)
def roc_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the quality score against near-dup membership —
    the threshold-free answer to "can quality rank duplicates apart from
    originals?". AUC = P(score_pos > score_neg) + ½·P(tie), computed via
    the Mann–Whitney identity AUC = (R1 − n1(n1+1)/2)/(n1·n0) with
    average ranks over tie blocks.

    Exactness: identical rank machinery to mann_whitney_u — 2·R1 is an
    exact integer (each positive in a tie block of size t after `below`
    items contributes 2·rank = 2·below + t + 1), so the AUC numerator
    2R1 − n1(n1+1) and denominator 2·n1·n0 are both exact integers and
    the statistic is ONE IEEE division. Degenerate single-class corpora
    null out via nullif.

    Plan: quality is map-only; the label is one doc_id-keyed left join
    against the near-dup-scale cluster table; ONE value-keyed aggregation
    collapses the corpus to the distinct score support; the rank window
    runs over that bounded support; the final row is a 1-row reduction.
    No sort of raw rows anywhere (ks_two_sample posture)."""
    sc = _scored(spark, sf_dir)
    per_v = sc.groupBy(F.col("x").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("y").cast("long").alias("t1"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.withColumn(
        "below", F.coalesce(F.sum("t").over(w), F.lit(0)).cast("long")
    )
    sums = ranked.agg(
        F.sum("t1").cast("long").alias("n1"),
        F.sum(F.col("t") - F.col("t1")).cast("long").alias("n0"),
        F.sum(F.col("t1") * (2 * F.col("below") + F.col("t") + 1))
        .cast("long")
        .alias("two_r1"),
    )
    return sums.select(
        F.col("n1").alias("n_pos"),
        F.col("n0").alias("n_neg"),
        (
            (F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)).cast("double")
            / F.nullif(
                (2 * F.col("n1") * F.col("n0")).cast("double"), F.lit(0.0)
            )
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# Average precision (PR-AUC) under a pinned deterministic tie order.
# ---------------------------------------------------------------------------
@query(
    "pr_auc_average_precision",
    oracle=_scored_ctes()
    + """
    , ranked AS (
        SELECT y,
               CAST(row_number() OVER (ORDER BY x DESC, doc_id ASC)
                    AS BIGINT) AS k,
               CAST(sum(y) OVER (ORDER BY x DESC, doc_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_pos
        FROM sc
    ), pos AS (
        SELECT k, CAST(cum_pos AS DOUBLE) / k AS term
        FROM ranked WHERE y = 1
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_ranked,
               CAST(sum(y) AS BIGINT) AS n_pos
        FROM ranked
    )
    SELECT t.n_ranked, t.n_pos,
           list_reduce(
               [0.0] || list_transform(
                   list_sort(list(struct_pack(k := p.k, term := p.term))),
                   s -> s.term),
               (a, b) -> a + b)
               / nullif(CAST(t.n_pos AS DOUBLE), 0.0) AS average_precision
    FROM pos p CROSS JOIN tot t
    GROUP BY t.n_ranked, t.n_pos
    """,
)
def pr_auc_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (area under the precision-recall curve, step
    form): AP = (1/n_pos) Σ_{positives at rank k} precision@k. The
    imbalance-aware companion to roc_auc_exact — with rare positives,
    AUC saturates while AP still separates rankers.

    Definition pin: ranks use the TOTAL order (x DESC, doc_id ASC) —
    tie-broken by doc_id so both engines agree on every rank (the
    interpolated-over-ties AP variant is a different, engine-dependent
    statistic; this one is reproducible bit-for-bit).

    Exactness: k and cum_pos are window integers; each precision@k is
    ONE division; the per-positive terms fold in sorted-k order with a
    0.0 seed (chisq_independence discipline); one final division by
    n_pos. Degenerate no-positive corpora null out.

    Plan: the rank window is a single global sort — inherent to AP's
    definition (see module docstring for the 100 TB two-phase-rank
    swap). Everything after the window is positives-only (near-dup
    scale) plus a 1-row total."""
    sc = _scored(spark, sf_dir)
    w_ord = Window.orderBy(F.desc("x"), F.asc("doc_id"))
    ranked = sc.select(
        "y",
        F.row_number().over(w_ord).cast("long").alias("k"),
        F.sum("y")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum_pos"),
    )
    tot = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_ranked"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    pos = ranked.filter(F.col("y") == 1).select(
        "k", (F.col("cum_pos").cast("double") / F.col("k")).alias("term")
    )
    return (
        pos.crossJoin(F.broadcast(tot))
        .groupBy("n_ranked", "n_pos")
        .agg(
            F.sort_array(F.collect_list(F.struct("k", "term"))).alias("__lst")
        )
        .select(
            "n_ranked",
            "n_pos",
            (
                F.expr(
                    "aggregate(transform(__lst, s -> s.term),"
                    " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
                )
                / F.nullif(F.col("n_pos").cast("double"), F.lit(0.0))
            ).alias("average_precision"),
        )
    )


# ---------------------------------------------------------------------------
# Calibration reliability table + per-bin Brier contributions.
# ---------------------------------------------------------------------------
@query(
    "score_calibration_bins",
    oracle=_scored_ctes()
    + f"""
    , b AS (
        SELECT greatest(least(CAST(floor(CAST(x AS DOUBLE) / {_BIN_WIDTH}.0)
                                   AS BIGINT), {N_CALIB_BINS - 1}), 0) AS bin,
               x, 1 - y AS z
        FROM sc
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(z) AS BIGINT) AS n_kept,
           CAST(sum(x) AS DOUBLE) / count(*) / {_Q_SCALE}.0 AS mean_score,
           CAST(sum(z) AS DOUBLE) / count(*) AS frac_kept,
           CAST(sum(CAST(x - z * {_Q_SCALE} AS DECIMAL(38,0))
                    * (x - z * {_Q_SCALE})) AS DOUBLE)
               / (CAST(count(*) AS DOUBLE) * {_Q_SCALE}.0 * {_Q_SCALE}.0)
               AS bin_brier
    FROM b GROUP BY bin
    """,
)
def score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table for the quality score read as a probability that
    a document SURVIVES dedup (z = 1 − dup): 10 equal-width score bins,
    each with its mean score, observed keep rate, and Brier contribution
    mean((score − z)²). A calibrated score tracks frac_kept with
    mean_score per bin; the n-weighted mean of bin_brier is the corpus
    Brier score. This is the calibration leg of the eval triple —
    AUC/AP measure ranking, Brier measures probability quality.

    Exactness: bins come from floor(x / binwidth) — x ≤ ~10⁶ so the
    division is far from representability ties — clamped into [0, 9] by
    integer compares; per-bin Σx and Σ(x − z·10⁶)² are exact integer
    sums (the square accumulates in DECIMAL(38,0) before ONE cast);
    mean/rate/brier are pinned division chains of exact operands.

    Plan: map-only expressions + the one cluster-table join, then ONE
    10-group partial-aggregatable rollup. Scan-bound at any SF."""
    sc = _scored(spark, sf_dir)
    b = sc.select(
        F.greatest(
            F.least(
                F.floor(F.col("x").cast("double") / float(_BIN_WIDTH)).cast(
                    "long"
                ),
                F.lit(N_CALIB_BINS - 1).cast("long"),
            ),
            F.lit(0).cast("long"),
        ).alias("bin"),
        "x",
        (1 - F.col("y")).alias("z"),
    )
    err = F.col("x") - F.col("z") * _Q_SCALE
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("z").cast("long").alias("n_kept"),
        (
            F.sum("x").cast("double")
            / F.count(F.lit(1))
            / float(_Q_SCALE)
        ).alias("mean_score"),
        (F.sum("z").cast("double") / F.count(F.lit(1))).alias("frac_kept"),
        (
            F.sum(err.cast("decimal(38,0)") * err).cast("double")
            / (
                F.count(F.lit(1)).cast("double")
                * float(_Q_SCALE)
                * float(_Q_SCALE)
            )
        ).alias("bin_brier"),
    )


# ---------------------------------------------------------------------------
# Isotonic calibration (PAV) — the monotone recalibration map, computed
# exactly via the max-min prefix-average identity over the bounded bins.
# ---------------------------------------------------------------------------
@query(
    "calibration_isotonic_pav",
    oracle=_scored_ctes()
    + f"""
    , bq AS (
        SELECT greatest(least(CAST(floor(CAST(x AS DOUBLE) / {_BIN_WIDTH}.0)
                                   AS BIGINT), {N_CALIB_BINS - 1}), 0) AS bin,
               1 - y AS z
        FROM sc
    ), per_bin AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(z) AS BIGINT) AS pos
        FROM bq GROUP BY bin
    ), pre AS (
        SELECT bin, n, pos,
               CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
               CAST(sum(pos) OVER (ORDER BY bin) AS BIGINT) AS cp
        FROM per_bin
    ), inner_min AS (
        SELECT i.bin AS bin, j.bin AS jb,
               min(CAST(k.cp - (j.cp - j.pos) AS DOUBLE)
                   / CAST(k.cn - (j.cn - j.n) AS DOUBLE)) AS mn
        FROM pre i JOIN pre j ON j.bin <= i.bin
                   JOIN pre k ON k.bin >= i.bin
        GROUP BY i.bin, j.bin
    ), fit AS (
        SELECT bin, max(mn) AS iso FROM inner_min GROUP BY bin
    )
    SELECT p.bin, p.n AS n_docs, p.pos AS n_kept,
           CAST(p.pos AS DOUBLE) / CAST(p.n AS DOUBLE) AS raw_rate,
           f.iso AS isotonic_rate
    FROM per_bin p JOIN fit f ON f.bin = p.bin
    """,
)
def calibration_isotonic_pav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic recalibration of the quality score's keep rate: the
    nondecreasing step function closest (L2) to the observed per-bin
    rates — what pool-adjacent-violators computes, evaluated here in
    CLOSED FORM via the minimax identity fit_i = max_{j≤i} min_{k≥i}
    mean(z over bins j..k). score_calibration_bins DIAGNOSES
    miscalibration (gaps, ECE); this produces the FIX — the monotone
    map you compose onto the score before thresholding, the standard
    post-hoc calibrator next to Platt scaling (and the
    distribution-free one).

    Exactness: no iteration and no float accumulation — interval rates
    are single divisions of exact integer prefix sums (correctly
    rounded, so identical across engines), and min/max over them are
    comparisons. The PAV pooling loop is replaced by the bounded
    B³ = 1000-row minimax (B = {N_CALIB_BINS} bins), which is the
    textbook-equivalent characterization of the isotonic fit.

    Plan: one fact-scale 10-group rollup; everything after runs on
    B-row frames (the triple join is B³ rows — constant at any corpus
    size). Property-tested: the fit is nondecreasing and conserves the
    weighted total (PAV's block-mean invariant)."""
    sc = _scored(spark, sf_dir)
    per_bin = (
        sc.select(
            F.greatest(
                F.least(
                    F.floor(
                        F.col("x").cast("double") / float(_BIN_WIDTH)
                    ).cast("long"),
                    F.lit(N_CALIB_BINS - 1).cast("long"),
                ),
                F.lit(0).cast("long"),
            ).alias("bin"),
            (1 - F.col("y")).alias("z"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("z").cast("long").alias("pos"),
        )
        .coalesce(1)
        .persist()
    )
    per_bin.count()  # i/j/k aliases and the final join all read it
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pre = per_bin.select(
        "bin",
        "n",
        "pos",
        F.sum("n").over(wc).cast("long").alias("cn"),
        F.sum("pos").over(wc).cast("long").alias("cp"),
    )
    i = pre.select(F.col("bin").alias("ib"))
    j = pre.select(
        F.col("bin").alias("jb"),
        (F.col("cp") - F.col("pos")).alias("jcp0"),
        (F.col("cn") - F.col("n")).alias("jcn0"),
    )
    k = pre.select(
        F.col("bin").alias("kb"), F.col("cp").alias("kcp"), F.col("cn").alias("kcn")
    )
    inner = (
        i.join(j, F.col("jb") <= F.col("ib"))
        .join(k, F.col("kb") >= F.col("ib"))
        .select(
            "ib",
            "jb",
            (
                (F.col("kcp") - F.col("jcp0")).cast("double")
                / (F.col("kcn") - F.col("jcn0")).cast("double")
            ).alias("r"),
        )
        .groupBy("ib", "jb")
        .agg(F.min("r").alias("mn"))
    )
    fit = inner.groupBy("ib").agg(F.max("mn").alias("iso"))
    return (
        per_bin.join(fit, per_bin["bin"] == fit["ib"])
        .select(
            "bin",
            F.col("n").alias("n_docs"),
            F.col("pos").alias("n_kept"),
            (F.col("pos").cast("double") / F.col("n").cast("double")).alias(
                "raw_rate"
            ),
            F.col("iso").alias("isotonic_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Murphy decomposition of the Brier score: reliability / resolution /
# uncertainty over the calibration bins.
# ---------------------------------------------------------------------------
_DECOMP_SCALE = 1_048_576  # 2^20: per-bin terms quantize before the bin sum


@query(
    "brier_decomposition",
    oracle=_scored_ctes()
    + f"""
    , b AS (
        SELECT greatest(least(CAST(floor(CAST(x AS DOUBLE) / {_BIN_WIDTH}.0)
                                   AS BIGINT), {N_CALIB_BINS - 1}), 0) AS bin,
               x, 1 - y AS z
        FROM sc
    ), per_bin AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n_b,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(z) AS BIGINT) AS sz,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
                   AS sxx,
               CAST(sum(x * z) AS BIGINT) AS sxz,
               CAST(sum(CAST(x - z * {_Q_SCALE} AS DECIMAL(38,0))
                        * (x - z * {_Q_SCALE})) AS DECIMAL(38,0)) AS sse
        FROM b GROUP BY bin
    ), tot AS (
        SELECT CAST(sum(n_b) AS BIGINT) AS n,
               CAST(sum(sz) AS BIGINT) AS sz_all,
               CAST(sum(sse) AS DECIMAL(38,0)) AS sse_all
        FROM per_bin
    ), terms AS (
        SELECT p.n_b,
               CAST(round(CAST(p.n_b AS DOUBLE)
                    * ((CAST(p.sx AS DOUBLE)
                        / (CAST(p.n_b AS DOUBLE) * {_Q_SCALE}.0))
                       - (CAST(p.sz AS DOUBLE) / CAST(p.n_b AS DOUBLE)))
                    * ((CAST(p.sx AS DOUBLE)
                        / (CAST(p.n_b AS DOUBLE) * {_Q_SCALE}.0))
                       - (CAST(p.sz AS DOUBLE) / CAST(p.n_b AS DOUBLE)))
                    * {_DECOMP_SCALE}.0) AS BIGINT) AS rel_q,
               CAST(round(CAST(p.n_b AS DOUBLE)
                    * ((CAST(p.sz AS DOUBLE) / CAST(p.n_b AS DOUBLE))
                       - (CAST(t.sz_all AS DOUBLE) / CAST(t.n AS DOUBLE)))
                    * ((CAST(p.sz AS DOUBLE) / CAST(p.n_b AS DOUBLE))
                       - (CAST(t.sz_all AS DOUBLE) / CAST(t.n AS DOUBLE)))
                    * {_DECOMP_SCALE}.0) AS BIGINT) AS res_q,
               CAST(round((CAST(p.sxx AS DOUBLE)
                           / ({_Q_SCALE}.0 * {_Q_SCALE}.0)
                    - CAST(p.n_b AS DOUBLE)
                      * (CAST(p.sx AS DOUBLE)
                         / (CAST(p.n_b AS DOUBLE) * {_Q_SCALE}.0))
                      * (CAST(p.sx AS DOUBLE)
                         / (CAST(p.n_b AS DOUBLE) * {_Q_SCALE}.0)))
                    * {_DECOMP_SCALE}.0) AS BIGINT) AS wbv_q,
               CAST(round(2.0 * (CAST(p.sxz AS DOUBLE) / {_Q_SCALE}.0
                    - CAST(p.n_b AS DOUBLE)
                      * (CAST(p.sx AS DOUBLE)
                         / (CAST(p.n_b AS DOUBLE) * {_Q_SCALE}.0))
                      * (CAST(p.sz AS DOUBLE) / CAST(p.n_b AS DOUBLE)))
                    * {_DECOMP_SCALE}.0) AS BIGINT) AS wbc_q
        FROM per_bin p CROSS JOIN tot t
    )
    SELECT t.n,
           CAST(t.sz_all AS DOUBLE) / CAST(t.n AS DOUBLE) AS base_rate,
           CAST(t.sse_all AS DOUBLE)
               / (CAST(t.n AS DOUBLE) * {_Q_SCALE}.0 * {_Q_SCALE}.0)
               AS brier,
           CAST(s.sr AS DOUBLE)
               / (CAST(t.n AS DOUBLE) * {_DECOMP_SCALE}.0) AS reliability,
           CAST(s.ss AS DOUBLE)
               / (CAST(t.n AS DOUBLE) * {_DECOMP_SCALE}.0) AS resolution,
           (CAST(t.sz_all AS DOUBLE) / CAST(t.n AS DOUBLE))
               * (1.0 - CAST(t.sz_all AS DOUBLE) / CAST(t.n AS DOUBLE))
               AS uncertainty,
           CAST(s.sv AS DOUBLE)
               / (CAST(t.n AS DOUBLE) * {_DECOMP_SCALE}.0)
               AS within_bin_var,
           CAST(s.sc AS DOUBLE)
               / (CAST(t.n AS DOUBLE) * {_DECOMP_SCALE}.0)
               AS within_bin_cov
    FROM tot t CROSS JOIN (
        SELECT CAST(sum(rel_q) AS BIGINT) AS sr,
               CAST(sum(res_q) AS BIGINT) AS ss,
               CAST(sum(wbv_q) AS BIGINT) AS sv,
               CAST(sum(wbc_q) AS BIGINT) AS sc
        FROM terms
    ) s
    """,
)
def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized (Stephenson) decomposition of the Brier score over
    the reliability table's 10 bins: Brier = reliability − resolution +
    uncertainty + within_bin_var − within_bin_cov. Reliability
    (miscalibration mass, lower better) is the n-weighted mean of
    (mean_score − keep_rate)²; resolution (how much the bins separate
    outcomes, higher better) is the n-weighted variance of bin keep
    rates around the base rate; uncertainty is the irreducible
    base_rate·(1−base_rate); the two within-bin terms carry the
    continuous-score remainder the classic 3-term Murphy identity
    drops. One row that tells a score owner whether a bad Brier is a
    calibration problem (fixable by remapping) or a discrimination
    problem (needs a better score).

    Exactness: bin tallies and the direct Brier SSE ride exact
    integer/DECIMAL sums; each bin's four decomposition terms are
    pinned IEEE chains quantized to the 2^-20 grid before the ≤10-term
    sum, so the bin fold is an order-free integer sum (the 5-term
    identity therefore holds to grid precision — the property test
    pins it).

    Plan: same single rollup as score_calibration_bins, then 10-row
    arithmetic against a broadcast 1-row total. Scan-bound at any SF."""
    sc = _scored(spark, sf_dir)
    b = sc.select(
        F.greatest(
            F.least(
                F.floor(F.col("x").cast("double") / float(_BIN_WIDTH)).cast(
                    "long"
                ),
                F.lit(N_CALIB_BINS - 1).cast("long"),
            ),
            F.lit(0).cast("long"),
        ).alias("bin"),
        "x",
        (1 - F.col("y")).alias("z"),
    )
    err = F.col("x") - F.col("z") * _Q_SCALE
    per_bin = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("x") * F.col("z")).cast("long").alias("sxz"),
        F.sum(err.cast("decimal(38,0)") * err)
        .cast("decimal(38,0)")
        .alias("sse"),
    )
    tot = per_bin.agg(
        F.sum("n_b").cast("long").alias("n"),
        F.sum("sz").cast("long").alias("sz_all"),
        F.sum("sse").cast("decimal(38,0)").alias("sse_all"),
    )
    ms = F.col("sx").cast("double") / (
        F.col("n_b").cast("double") * float(_Q_SCALE)
    )
    fb = F.col("sz").cast("double") / F.col("n_b").cast("double")
    fbar = F.col("sz_all").cast("double") / F.col("n").cast("double")
    terms = per_bin.crossJoin(F.broadcast(tot)).select(
        F.round(
            F.col("n_b").cast("double")
            * (ms - fb)
            * (ms - fb)
            * F.lit(float(_DECOMP_SCALE))
        )
        .cast("long")
        .alias("rel_q"),
        F.round(
            F.col("n_b").cast("double")
            * (fb - fbar)
            * (fb - fbar)
            * F.lit(float(_DECOMP_SCALE))
        )
        .cast("long")
        .alias("res_q"),
        F.round(
            (
                F.col("sxx").cast("double")
                / (float(_Q_SCALE) * float(_Q_SCALE))
                - F.col("n_b").cast("double") * ms * ms
            )
            * F.lit(float(_DECOMP_SCALE))
        )
        .cast("long")
        .alias("wbv_q"),
        F.round(
            F.lit(2.0)
            * (
                F.col("sxz").cast("double") / float(_Q_SCALE)
                - F.col("n_b").cast("double") * ms * fb
            )
            * F.lit(float(_DECOMP_SCALE))
        )
        .cast("long")
        .alias("wbc_q"),
    )
    sums = terms.agg(
        F.sum("rel_q").cast("long").alias("sr"),
        F.sum("res_q").cast("long").alias("ss"),
        F.sum("wbv_q").cast("long").alias("sv"),
        F.sum("wbc_q").cast("long").alias("sc"),
    )
    return tot.crossJoin(F.broadcast(sums)).select(
        "n",
        fbar.alias("base_rate"),
        (
            F.col("sse_all").cast("double")
            / (
                F.col("n").cast("double")
                * float(_Q_SCALE)
                * float(_Q_SCALE)
            )
        ).alias("brier"),
        (
            F.col("sr").cast("double")
            / (F.col("n").cast("double") * float(_DECOMP_SCALE))
        ).alias("reliability"),
        (
            F.col("ss").cast("double")
            / (F.col("n").cast("double") * float(_DECOMP_SCALE))
        ).alias("resolution"),
        (fbar * (F.lit(1.0) - fbar)).alias("uncertainty"),
        (
            F.col("sv").cast("double")
            / (F.col("n").cast("double") * float(_DECOMP_SCALE))
        ).alias("within_bin_var"),
        (
            F.col("sc").cast("double")
            / (F.col("n").cast("double") * float(_DECOMP_SCALE))
        ).alias("within_bin_cov"),
    )


# ---------------------------------------------------------------------------
# CUPED: pre-period covariate adjustment for the A/B metric.
# ---------------------------------------------------------------------------
@query(
    "cuped_adjustment",
    oracle="""
    WITH rng AS (
        SELECT (min(epoch_ns(ts)) + max(epoch_ns(ts))) // 2 AS mid
        FROM events
    ), per_user AS (
        SELECT user_id, user_id % 2 AS arm,
               CAST(coalesce(sum(CASE WHEN epoch_ns(ts) < rng.mid
                   THEN CAST(round(value * 100.0) AS BIGINT) END), 0)
                   AS BIGINT) AS x,
               CAST(coalesce(sum(CASE WHEN epoch_ns(ts) >= rng.mid
                   THEN CAST(round(value * 100.0) AS BIGINT) END), 0)
                   AS BIGINT) AS y
        FROM events CROSS JOIN rng
        GROUP BY user_id, rng.mid
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy
        FROM per_user
    ), arms AS (
        SELECT CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0,
               CAST(sum(CASE WHEN arm = 1
                   THEN CAST(x AS DECIMAL(38,0)) END) AS DOUBLE) AS sx1,
               CAST(sum(CASE WHEN arm = 0
                   THEN CAST(x AS DECIMAL(38,0)) END) AS DOUBLE) AS sx0,
               CAST(sum(CASE WHEN arm = 1
                   THEN CAST(y AS DECIMAL(38,0)) END) AS DOUBLE) AS sy1,
               CAST(sum(CASE WHEN arm = 0
                   THEN CAST(y AS DECIMAL(38,0)) END) AS DOUBLE) AS sy0
        FROM per_user
    )
    SELECT a.n1 AS n_treat, a.n0 AS n_control,
           (m.n * m.sxy - m.sx * m.sy)
               / nullif(m.n * m.sxx - m.sx * m.sx, 0.0) AS theta,
           ((m.n * m.sxy - m.sx * m.sy) * (m.n * m.sxy - m.sx * m.sy))
               / nullif((m.n * m.sxx - m.sx * m.sx)
                        * (m.n * m.syy - m.sy * m.sy), 0.0)
               AS var_reduction,
           (a.sy1 / a.n1 - a.sy0 / a.n0) / 100.0 AS diff_unadjusted,
           ((a.sy1 / a.n1 - a.sy0 / a.n0)
            - ((m.n * m.sxy - m.sx * m.sy)
               / nullif(m.n * m.sxx - m.sx * m.sx, 0.0))
              * (a.sx1 / a.n1 - a.sx0 / a.n0)) / 100.0 AS diff_cuped
    FROM m CROSS JOIN arms a
    """,
)
def cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data): split
    each user's event value at the corpus time midpoint into a
    pre-period covariate X and a post-period metric Y, learn
    θ = cov(X,Y)/var(X) pooled across arms, and report the treatment
    effect both raw and CUPED-adjusted (Ȳ₁−Ȳ₀ − θ(X̄₁−X̄₀)) plus the
    variance-reduction factor ρ² — the standard trick that shrinks A/B
    confidence intervals for free on any metric with pre-period signal.
    Arms are the same user-parity assignment as ab_test_proportions.

    Exactness: values quantize to integer cents; per-user sums and all
    five pooled moments are exact integer/DECIMAL sums cast to double
    ONCE (the corr_exact discipline); θ, ρ², and both diffs are pinned
    closed-form chains — no float aggregation anywhere.

    Plan: one fact pass keyed by user (the 1-row time midpoint
    broadcasts into the scan), then two 1-row rollups over user-grain
    data and a final 1-row cross join. Scan-bound at any SF."""
    ev = load_table(spark, sf_dir, "events")
    rng = ev.agg(
        F.expr("(min(ts) + max(ts)) DIV 2").alias("mid")
    )
    cents = F.expr("CAST(round(value * 100.0) AS BIGINT)")
    per_user = (
        ev.crossJoin(F.broadcast(rng))
        .groupBy("user_id", "mid")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("ts") < F.col("mid"), cents)), F.lit(0)
            )
            .cast("long")
            .alias("x"),
            F.coalesce(
                F.sum(F.when(F.col("ts") >= F.col("mid"), cents)), F.lit(0)
            )
            .cast("long")
            .alias("y"),
        )
        .select(
            "user_id", (F.col("user_id") % 2).alias("arm"), "x", "y"
        )
        .persist()
    )
    per_user.count()  # feeds both rollups
    m = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE)").alias("sx"),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE)").alias("sy"),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE)").alias(
            "sxx"
        ),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE)").alias(
            "syy"
        ),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE)").alias(
            "sxy"
        ),
    )
    arms = per_user.agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 1 THEN CAST(x AS DECIMAL(38,0)) END)"
            " AS DOUBLE)"
        ).alias("sx1"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 0 THEN CAST(x AS DECIMAL(38,0)) END)"
            " AS DOUBLE)"
        ).alias("sx0"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 1 THEN CAST(y AS DECIMAL(38,0)) END)"
            " AS DOUBLE)"
        ).alias("sy1"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 0 THEN CAST(y AS DECIMAL(38,0)) END)"
            " AS DOUBLE)"
        ).alias("sy0"),
    )
    return m.crossJoin(F.broadcast(arms)).selectExpr(
        "n1 AS n_treat",
        "n0 AS n_control",
        "(n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0) AS theta",
        "((n * sxy - sx * sy) * (n * sxy - sx * sy))"
        " / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0.0)"
        " AS var_reduction",
        "(sy1 / n1 - sy0 / n0) / 100.0 AS diff_unadjusted",
        "((sy1 / n1 - sy0 / n0)"
        " - ((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0))"
        "   * (sx1 / n1 - sx0 / n0)) / 100.0 AS diff_cuped",
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction intervals with exact integer selection.
# ---------------------------------------------------------------------------
CONF_ALPHA_NUM = 1  # miscoverage alpha = 1/10
CONF_ALPHA_DEN = 10


@query(
    "conformal_interval_calibration",
    oracle=f"""
    WITH ev AS (
        SELECT event_id, event_type,
               CAST(round(value * 100.0) AS BIGINT) AS c,
               event_id % 2 AS fold
        FROM events
    ), mu AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal,
               CAST(sum(c) AS BIGINT) AS s_cal
        FROM ev WHERE fold = 0 GROUP BY event_type
    ), cal_scores AS (
        SELECT e.event_type, m.n_cal, m.s_cal,
               abs(m.n_cal * e.c - m.s_cal) AS sc,
               row_number() OVER (PARTITION BY e.event_type
                                  ORDER BY abs(m.n_cal * e.c - m.s_cal),
                                           e.event_id) AS rn
        FROM ev e JOIN mu m USING (event_type) WHERE e.fold = 0
    ), qhat AS (
        SELECT event_type, n_cal, s_cal, sc AS q_scaled
        FROM cal_scores
        WHERE rn = ({CONF_ALPHA_DEN - CONF_ALPHA_NUM} * (n_cal + 1)
                    + {CONF_ALPHA_DEN - 1}) // {CONF_ALPHA_DEN}
    ), test AS (
        SELECT e.event_type, q.n_cal, q.q_scaled,
               CASE WHEN abs(q.n_cal * e.c - q.s_cal) <= q.q_scaled
                    THEN 1 ELSE 0 END AS covered
        FROM ev e JOIN qhat q USING (event_type) WHERE e.fold = 1
    )
    SELECT event_type, CAST(min(n_cal) AS BIGINT) AS n_calib,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(min(q_scaled) AS DOUBLE)
               / (CAST(min(n_cal) AS DOUBLE) * 100.0) AS q_hat,
           CAST(sum(covered) AS BIGINT) AS n_covered,
           CAST(sum(covered) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS coverage
    FROM test GROUP BY event_type
    """,
)
def conformal_interval_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split-conformal prediction intervals, per event type: the
    calibration fold (even event_ids) fits the trivial per-type mean
    predictor and takes the ceil((1−α)(n+1))-th order statistic of the
    absolute residuals as the interval half-width q̂ (α = 0.1); the test
    fold reports empirical coverage — the distribution-free guarantee
    (coverage ≥ 1−α in expectation under exchangeability) that modern
    uncertainty quantification ships on top of ANY point predictor.

    Exactness: residuals are scaled to |n·cents − Σcents| so every
    score is an exact INTEGER (no rational mean materialized); q̂
    selection is a rank filter (row_number = k, event_id tie-break),
    never a percentile fold; coverage compares integers. The only
    floats are the two readout divisions.

    Plan: one scan splits folds map-side; per-type calib sums, then a
    per-type rank window over calibration scores (type-keyed sort, no
    giant agg buffer — ks_two_sample posture), a k-th-row filter, and a
    broadcast of the ≤|types| q̂ rows into the test-fold scan."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("CAST(round(value * 100.0) AS BIGINT)").alias("c"),
        (F.col("event_id") % 2).alias("fold"),
    )
    mu = (
        ev.filter(F.col("fold") == 0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cal"),
            F.sum("c").cast("long").alias("s_cal"),
        )
    )
    sc = F.abs(F.col("n_cal") * F.col("c") - F.col("s_cal"))
    w = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("n_cal") * F.col("c") - F.col("s_cal")), "event_id"
    )
    qhat = (
        ev.filter(F.col("fold") == 0)
        .join(F.broadcast(mu), "event_type")
        .select(
            "event_type",
            "n_cal",
            "s_cal",
            sc.alias("sc"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(
            F.col("rn")
            == F.expr(
                f"({CONF_ALPHA_DEN - CONF_ALPHA_NUM} * (n_cal + 1)"
                f" + {CONF_ALPHA_DEN - 1}) DIV {CONF_ALPHA_DEN}"
            )
        )
        .select("event_type", "n_cal", "s_cal", F.col("sc").alias("q_scaled"))
    )
    test = (
        ev.filter(F.col("fold") == 1)
        .join(F.broadcast(qhat), "event_type")
        .select(
            "event_type",
            "n_cal",
            "q_scaled",
            F.when(
                F.abs(F.col("n_cal") * F.col("c") - F.col("s_cal"))
                <= F.col("q_scaled"),
                1,
            )
            .otherwise(0)
            .alias("covered"),
        )
    )
    return test.groupBy("event_type").agg(
        F.min("n_cal").cast("long").alias("n_calib"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
        (
            F.min("q_scaled").cast("double")
            / (F.min("n_cal").cast("double") * F.lit(100.0))
        ).alias("q_hat"),
        F.sum("covered").cast("long").alias("n_covered"),
        (
            F.sum("covered").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# Exact F1-optimal threshold over the score support.
# ---------------------------------------------------------------------------
@query(
    "f1_optimal_threshold",
    oracle=_scored_ctes()
    + """
    , per_v AS (
        SELECT x AS v, CAST(count(*) AS BIGINT) AS t,
               CAST(sum(y) AS BIGINT) AS t1
        FROM sc GROUP BY x
    ), tot AS (
        SELECT CAST(sum(t1) AS BIGINT) AS p_all,
               CAST(sum(t) AS BIGINT) AS n_all
        FROM per_v
    ), cum AS (
        SELECT v,
               CAST(sum(t) OVER (ORDER BY v DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pred_pos,
               CAST(sum(t1) OVER (ORDER BY v DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp
        FROM per_v
    ), scoredt AS (
        SELECT c.v AS threshold, c.pred_pos, c.tp, t.p_all,
               CAST(2 * c.tp AS DOUBLE)
                   / nullif(CAST(c.pred_pos + t.p_all AS DOUBLE), 0.0)
                   AS f1,
               row_number() OVER (
                   ORDER BY CAST(2 * c.tp AS DOUBLE)
                       / nullif(CAST(c.pred_pos + t.p_all AS DOUBLE), 0.0)
                       DESC,
                       c.v) AS rn
        FROM cum c CROSS JOIN tot t
    )
    SELECT CAST(threshold AS BIGINT) AS threshold_x,
           pred_pos, tp, p_all AS n_pos,
           CAST(tp AS DOUBLE) / nullif(CAST(pred_pos AS DOUBLE), 0.0)
               AS precision_at,
           CAST(tp AS DOUBLE) / nullif(CAST(p_all AS DOUBLE), 0.0)
               AS recall_at,
           f1
    FROM scoredt WHERE rn = 1
    """,
)
def f1_optimal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operating point: sweep EVERY distinct score value as a
    "predict duplicate when score >= v" threshold and return the one
    maximizing F1 (ties broken toward the lower threshold), with its
    precision and recall — the number that turns the AUC/AP ranking
    audits into a deployable cutoff. F1 = 2TP/(pred_pos + P) avoids
    materializing FP/FN separately.

    Exactness: the sweep runs on the distinct score support with
    cumulative INTEGER tp/pred_pos windows (roc_auc_exact's machinery
    pointed the other direction); each F1 is one guarded division of
    exact integers; the argmax is a rank filter with a deterministic
    tie-break — no float aggregation anywhere.

    Plan: corpus collapses to the score support in one keyed agg; the
    two cumulative windows and the argmax run over support-sized data;
    1-row output. ks_two_sample posture throughout."""
    sc = _scored(spark, sf_dir)
    per_v = sc.groupBy(F.col("x").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("y").cast("long").alias("t1"),
    )
    tot = per_v.agg(
        F.sum("t1").cast("long").alias("p_all"),
        F.sum("t").cast("long").alias("n_all"),
    )
    w = Window.orderBy(F.desc("v")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_v.select(
        "v",
        F.sum("t").over(w).cast("long").alias("pred_pos"),
        F.sum("t1").over(w).cast("long").alias("tp"),
    )
    f1 = (2 * F.col("tp")).cast("double") / F.nullif(
        (F.col("pred_pos") + F.col("p_all")).cast("double"), F.lit(0.0)
    )
    ranked = (
        cum.crossJoin(F.broadcast(tot))
        .select("v", "pred_pos", "tp", "p_all", f1.alias("f1"))
        .withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.desc("f1"), F.asc("v"))),
        )
        .filter(F.col("rn") == 1)
    )
    return ranked.select(
        F.col("v").cast("long").alias("threshold_x"),
        "pred_pos",
        "tp",
        F.col("p_all").alias("n_pos"),
        (
            F.col("tp").cast("double")
            / F.nullif(F.col("pred_pos").cast("double"), F.lit(0.0))
        ).alias("precision_at"),
        (
            F.col("tp").cast("double")
            / F.nullif(F.col("p_all").cast("double"), F.lit(0.0))
        ).alias("recall_at"),
        "f1",
    )


# ---------------------------------------------------------------------------
# Difference-in-differences on the arm x period panel.
# ---------------------------------------------------------------------------
@query(
    "diff_in_diff",
    oracle="""
    WITH rng AS (
        SELECT (min(epoch_ns(ts)) + max(epoch_ns(ts))) // 2 AS mid
        FROM events
    ), cell AS (
        SELECT user_id % 2 AS arm,
               CASE WHEN epoch_ns(ts) < rng.mid THEN 0 ELSE 1 END AS period,
               CAST(round(value * 100.0) AS BIGINT) AS c
        FROM events CROSS JOIN rng
    ), agg AS (
        SELECT arm, period, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s
        FROM cell GROUP BY arm, period
    ), wide AS (
        SELECT
            max(CASE WHEN arm = 1 AND period = 1 THEN
                CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS t_post,
            max(CASE WHEN arm = 1 AND period = 0 THEN
                CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS t_pre,
            max(CASE WHEN arm = 0 AND period = 1 THEN
                CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS c_post,
            max(CASE WHEN arm = 0 AND period = 0 THEN
                CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS c_pre,
            CAST(sum(n) AS BIGINT) AS n_events
        FROM agg
    )
    SELECT n_events,
           (t_post - t_pre) / 100.0 AS treat_delta,
           (c_post - c_pre) / 100.0 AS control_delta,
           ((t_post - t_pre) - (c_post - c_pre)) / 100.0 AS did_estimate
    FROM wide
    """,
)
def diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on the 2×2 arm × period panel (same
    arm assignment as ab_test_proportions, same time midpoint as
    cuped_adjustment): the treated arm's pre→post mean-value change
    minus the control arm's — the canonical causal estimate when
    parallel pre-trends are assumed and randomization is doubtful. The
    per-cell deltas stay visible so the parallel-trends eyeball check
    (control_delta) ships with the estimate.

    Exactness: four cell means from exact integer cent sums; the DiD is
    one pinned chain of subtractions and divisions.

    Plan: ONE fact pass keyed by (arm, period) — 4 groups — with the
    1-row midpoint broadcast into the scan; everything after is 4-row
    arithmetic. Scan-bound at any SF."""
    ev = load_table(spark, sf_dir, "events")
    rng = ev.agg(F.expr("(min(ts) + max(ts)) DIV 2").alias("mid"))
    cell = ev.crossJoin(F.broadcast(rng)).select(
        (F.col("user_id") % 2).alias("arm"),
        F.when(F.col("ts") < F.col("mid"), 0).otherwise(1).alias("period"),
        F.expr("CAST(round(value * 100.0) AS BIGINT)").alias("c"),
    )
    agg = cell.groupBy("arm", "period").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
    )

    def mean_of(a, p):
        return F.max(
            F.when(
                (F.col("arm") == a) & (F.col("period") == p),
                F.col("s").cast("double") / F.col("n").cast("double"),
            )
        )

    wide = agg.agg(
        mean_of(1, 1).alias("t_post"),
        mean_of(1, 0).alias("t_pre"),
        mean_of(0, 1).alias("c_post"),
        mean_of(0, 0).alias("c_pre"),
        F.sum("n").cast("long").alias("n_events"),
    )
    return wide.select(
        "n_events",
        ((F.col("t_post") - F.col("t_pre")) / 100.0).alias("treat_delta"),
        ((F.col("c_post") - F.col("c_pre")) / 100.0).alias("control_delta"),
        (
            (
                (F.col("t_post") - F.col("t_pre"))
                - (F.col("c_post") - F.col("c_pre"))
            )
            / 100.0
        ).alias("did_estimate"),
    )


# ---------------------------------------------------------------------------
# A/B power: minimum detectable effect at standard alpha/power.
# ---------------------------------------------------------------------------
_Z_ALPHA = "1.959963984540054"  # z_{0.975}, shared literal on both engines
_Z_BETA = "0.8416212335729143"  # z_{0.80}


@query(
    "ab_test_power_mde",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS arm,
               CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ), m AS (
        SELECT arm, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
        FROM per_user GROUP BY arm
    ), wide AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_users,
               max(CASE WHEN arm = 1 THEN n END) AS n1,
               max(CASE WHEN arm = 0 THEN n END) AS n0,
               max(CASE WHEN arm = 1 THEN
                   (n * syy - sy * sy) / (n * (n - 1)) END) AS var1,
               max(CASE WHEN arm = 0 THEN
                   (n * syy - sy * sy) / (n * (n - 1)) END) AS var0
        FROM m
    )
    SELECT n_users, n1 AS n_treat, n0 AS n_control,
           sqrt(var1 / n1 + var0 / n0) / 100.0 AS se_diff,
           ({_Z_ALPHA} + {_Z_BETA})
               * sqrt(var1 / n1 + var0 / n0) / 100.0 AS mde_abs
    FROM wide
    """,
)
def ab_test_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power readout: the standard error of the arm-mean
    difference and the minimum detectable effect at α = 0.05 two-sided /
    80% power — MDE = (z₀.₉₇₅ + z₀.₈)·SE — for the per-user value
    metric under the standing parity assignment. The pre-launch "is
    this experiment even worth running at this traffic" number, and the
    denominator CUPED's variance reduction acts on.

    Exactness: per-arm sample variances from exact DECIMAL moments
    (corr_exact discipline); the z constants are shared 17-digit
    literals (both engines parse the same binary64 — no inverse-normal
    evaluated at runtime); SE and MDE are pinned chains ending in
    exact-rounded sqrt.

    Plan: one user-keyed fact pass → 2-group moment agg → 1-row pivot.
    Scan-bound at any SF."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.expr(
            "CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)"
        ).alias("y")
    ).select((F.col("user_id") % 2).alias("arm"), "y")
    m = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE)").alias("sy"),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE)").alias(
            "syy"
        ),
    )
    var = (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    ) / (F.col("n") * (F.col("n") - 1))
    wide = m.agg(
        F.sum("n").cast("long").alias("n_users"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, var)).alias("var1"),
        F.max(F.when(F.col("arm") == 0, var)).alias("var0"),
    )
    se = F.sqrt(
        F.col("var1") / F.col("n1") + F.col("var0") / F.col("n0")
    )
    return wide.select(
        "n_users",
        F.col("n1").alias("n_treat"),
        F.col("n0").alias("n_control"),
        (se / 100.0).alias("se_diff"),
        (
            (F.lit(float(_Z_ALPHA)) + F.lit(float(_Z_BETA))) * se / 100.0
        ).alias("mde_abs"),
    )


# ---------------------------------------------------------------------------
# Delta-method CI for a ratio metric — the per-arm readout for metrics
# whose unit of analysis (event) differs from the randomization unit (user).
# ---------------------------------------------------------------------------
@query(
    "delta_method_ratio_ci",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS arm,
               CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
                   AS y,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY user_id
    ), m AS (
        SELECT arm,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y AS DECIMAL(38,0)) * x) AS DOUBLE) AS syx
        FROM per_user GROUP BY arm
    )
    SELECT arm, n AS n_users,
           sy / sx AS ratio_cents_per_event,
           sqrt((((n * syy - sy * sy) / (n * (n - 1.0)))
                 - 2 * (sy / sx) * ((n * syx - sy * sx) / (n * (n - 1.0)))
                 + (sy / sx) * (sy / sx)
                   * ((n * sxx - sx * sx) / (n * (n - 1.0)))) / n)
               / (sx / n) AS se,
           sy / sx - {_Z_ALPHA}
               * (sqrt((((n * syy - sy * sy) / (n * (n - 1.0)))
                 - 2 * (sy / sx) * ((n * syx - sy * sx) / (n * (n - 1.0)))
                 + (sy / sx) * (sy / sx)
                   * ((n * sxx - sx * sx) / (n * (n - 1.0)))) / n)
               / (sx / n)) AS ci_lo,
           sy / sx + {_Z_ALPHA}
               * (sqrt((((n * syy - sy * sy) / (n * (n - 1.0)))
                 - 2 * (sy / sx) * ((n * syx - sy * sx) / (n * (n - 1.0)))
                 + (sy / sx) * (sy / sx)
                   * ((n * sxx - sx * sx) / (n * (n - 1.0)))) / n)
               / (sx / n)) AS ci_hi
    FROM m
    """,
)
def delta_method_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for the ratio metric
    "cents per event" in each experiment arm: randomization is by USER
    (the parity assignment every experiment query here shares) but the
    metric's denominator counts EVENTS, so the naive per-event variance
    is wrong — the right SE linearizes R = Ȳ/X̄ around the user-level
    means: Var(R) ≈ (s_yy − 2R·s_yx + R²·s_xx) / (n·x̄²). This is the
    standard readout for revenue-per-session / clicks-per-query metrics
    (Deng et al.'s ratio-metric correction).

    Exactness: per-user y (cents) and x (count) are exact integers; the
    five per-arm moments are exact DECIMAL(38,0) sums cast to double
    ONCE (corr_exact discipline); R, SE, and the z-interval are pinned
    closed-form chains over those scalars with the z literal shared by
    both engines — no float aggregation anywhere.

    Plan: one user-keyed pass over the fact table, then a 2-row arm
    rollup carrying five moments. Scan-bound at any SF."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.expr("CAST(round(value * 100.0) AS BIGINT)"))
        .cast("long")
        .alias("y"),
        F.count(F.lit(1)).cast("long").alias("x"),
    ).select((F.col("user_id") % 2).alias("arm"), "y", "x")
    m = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE)").alias("sy"),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE)").alias("sx"),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE)").alias(
            "syy"
        ),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE)").alias(
            "sxx"
        ),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0)) * x) AS DOUBLE)").alias(
            "syx"
        ),
    )
    var_terms = (
        "(((n * syy - sy * sy) / (n * (n - 1.0)))"
        " - 2 * (sy / sx) * ((n * syx - sy * sx) / (n * (n - 1.0)))"
        " + (sy / sx) * (sy / sx)"
        "   * ((n * sxx - sx * sx) / (n * (n - 1.0))))"
    )
    se = f"sqrt({var_terms} / n) / (sx / n)"
    return m.select(
        "arm",
        F.col("n").alias("n_users"),
        F.expr("sy / sx").alias("ratio_cents_per_event"),
        F.expr(se).alias("se"),
        F.expr(f"sy / sx - {_Z_ALPHA} * ({se})").alias("ci_lo"),
        F.expr(f"sy / sx + {_Z_ALPHA} * ({se})").alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# SPRT: Wald's sequential probability ratio test over the daily event feed.
# ---------------------------------------------------------------------------
import math as _math

_SPRT_P0 = 0.20  # H0: purchase share of events (5 types, uniform null)
_SPRT_P1 = 0.25  # H1: elevated purchase share
# The log-LR weights are evaluated ONCE in Python and embedded as 2^32-grid
# INTEGERS into both engines: k*I1 + (n-k)*I2 then stays exact integer
# arithmetic end to end (a raw double k*L1 + (n-k)*L2 diverged by 1 ulp —
# DuckDB contracts the multiply-add), and the Wald decisions compare
# integers against integer thresholds. int64 headroom: |I| < 2^31, so the
# statistic is safe to ~2^32 cumulative events; widen to DECIMAL(38,0)
# beyond that.
_SPRT_GRID = 2**32
_SPRT_I1 = round(_math.log(_SPRT_P1 / _SPRT_P0) * _SPRT_GRID)
_SPRT_I2 = round(_math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0)) * _SPRT_GRID)
_SPRT_IA = round(_math.log(0.95 / 0.05) * _SPRT_GRID)  # accept H1 >= IA
_SPRT_IB = round(_math.log(0.05 / 0.95) * _SPRT_GRID)  # accept H0 <= IB


@query(
    "sprt_sequential_test",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS k
        FROM events GROUP BY 1
    ), cum AS (
        SELECT day_id,
               CAST(sum(n) OVER w AS BIGINT) AS n_cum,
               CAST(sum(k) OVER w AS BIGINT) AS k_cum
        FROM daily
        WINDOW w AS (ORDER BY day_id ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT day_id, n_cum, k_cum,
           CAST(k_cum * {_SPRT_I1} + (n_cum - k_cum) * {_SPRT_I2}
                AS DOUBLE) / {_SPRT_GRID} AS llr,
           CASE WHEN k_cum * {_SPRT_I1} + (n_cum - k_cum) * {_SPRT_I2}
                     >= {_SPRT_IA} THEN 'accept_h1'
                WHEN k_cum * {_SPRT_I1} + (n_cum - k_cum) * {_SPRT_I2}
                     <= {_SPRT_IB} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM cum
    """,
)
def sprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test run day by day over the
    event feed: is the purchase share of events p0 = 0.20 (the uniform
    5-type null) or p1 = 0.25? Each day reports the cumulative
    log-likelihood ratio llr = k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)) and
    Wald's decision at alpha = beta = 5% (accept H1 at ln 19, accept H0
    at −ln 19, else keep sampling) — the "when could we have stopped"
    readout that fixed-horizon tests like ab_test_proportions cannot
    give, and the guard against peeking-inflated false positives.

    Exactness: k and n are exact integer cumulative counts; the log-LR
    weights and Wald thresholds are embedded as shared 2^32-grid INTEGER
    literals, so the statistic is pure integer arithmetic (a raw-double
    form diverged by 1 ulp under DuckDB's multiply-add contraction) with
    ONE final division for the reported llr; decisions are integer
    comparisons that cannot straddle an ulp.

    Plan: one day-keyed partial-aggregatable pass over the fact table,
    then a running-sum window over the CALENDAR-BOUNDED day series
    (state is O(days) at any fact scale; the single-partition window is
    over ~tens of rows, never fact rows)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr(
                "(ts - pmod(ts, 86400000000000)) div 86400000000000"
            ).alias("day_id"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
                "isp"
            ),
        )
        .groupBy("day_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("isp").cast("long").alias("k"),
        )
    )
    w = Window.orderBy("day_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "day_id",
        F.sum("n").over(w).cast("long").alias("n_cum"),
        F.sum("k").over(w).cast("long").alias("k_cum"),
    )
    grid = f"k_cum * {_SPRT_I1} + (n_cum - k_cum) * {_SPRT_I2}"
    return cum.select(
        "day_id",
        "n_cum",
        "k_cum",
        F.expr(f"CAST({grid} AS DOUBLE) / {_SPRT_GRID}").alias("llr"),
        F.expr(
            f"CASE WHEN {grid} >= {_SPRT_IA} THEN 'accept_h1' "
            f"WHEN {grid} <= {_SPRT_IB} THEN 'accept_h0' "
            f"ELSE 'continue' END"
        ).alias("decision"),
    )


# ---------------------------------------------------------------------------
# Group-sequential monitoring: O'Brien-Fleming boundaries over K looks.
# ---------------------------------------------------------------------------
_GSD_K = 5  # number of interim looks (equally spaced in calendar days)
# Two-sided 5% O'Brien-Fleming critical constant for K=5 equally spaced
# looks (published group-sequential tables; boundary at look k is
# C * sqrt(K / k), spending almost no alpha early).
_GSD_C = "2.04"


@query(
    "group_sequential_looks",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_id,
               CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(sum(CASE WHEN user_id % 2 = 1
                             AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS BIGINT) AS x1,
               CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n0,
               CAST(sum(CASE WHEN user_id % 2 = 0
                             AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS BIGINT) AS x0
        FROM events GROUP BY 1
    ), cum AS (
        SELECT day_id,
               row_number() OVER (ORDER BY day_id) AS rn,
               count(*) OVER () AS d,
               CAST(sum(n1) OVER w AS BIGINT) AS n1,
               CAST(sum(x1) OVER w AS BIGINT) AS x1,
               CAST(sum(n0) OVER w AS BIGINT) AS n0,
               CAST(sum(x0) OVER w AS BIGINT) AS x0
        FROM daily
        WINDOW w AS (ORDER BY day_id ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ), looks AS (
        SELECT k, c.*
        FROM (SELECT unnest(generate_series(1, {_GSD_K})) AS k) g
        JOIN cum c ON c.rn = CAST(ceil(k * c.d / {_GSD_K}.0) AS BIGINT)
    ), z AS (
        SELECT k, day_id AS look_day_id, n1, x1, n0, x0,
               (CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
               / sqrt((CAST(x1 + x0 AS DOUBLE) / (n1 + n0))
                      * (1 - CAST(x1 + x0 AS DOUBLE) / (n1 + n0))
                      * (CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n0))
                   AS z,
               {_GSD_C} * sqrt(CAST({_GSD_K} AS DOUBLE) / k) AS of_bound
        FROM looks
    )
    SELECT k AS look, look_day_id, n1, x1, n0, x0, z, of_bound,
           CASE WHEN abs(z) >= of_bound THEN 'stop_reject'
                ELSE 'continue' END AS decision
    FROM z
    """,
)
def group_sequential_looks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential A/B monitoring with O'Brien-Fleming boundaries:
    the two-proportion z statistic (purchase share of events, arms by
    user parity) evaluated at K=5 equally spaced calendar looks, each
    compared against the OF critical value C·sqrt(K/k) — near-untouchable
    early (k=1 boundary ≈ 4.56) and close to the fixed-horizon 1.96 at
    the final look. Together with sprt_sequential_test this covers both
    canonical always-valid-monitoring designs: SPRT decides per
    observation, group-sequential at scheduled interim analyses.

    Determinism: cumulative cells are exact integers off one day-keyed
    pass; the z chain is the pinned ab_test_proportions closed form over
    those scalars; the boundary is a shared decimal literal times
    sqrt(K/k) — and IEEE sqrt is correctly rounded, so both engines
    produce bit-identical boundaries (unlike ln, which is why SPRT uses
    an integer grid); look selection is an integer rank equality, so the
    chosen days cannot straddle an ulp.

    Plan: one day-keyed partial-aggregatable pass with four conditional
    sums, a running-sum window over the calendar-bounded day series, and
    a ≤K-row rank-equality join — state is O(days) at any fact scale."""
    ev = load_table(spark, sf_dir, "events")
    arm1 = F.col("user_id") % 2 == 1
    isp = F.col("event_type") == "purchase"
    daily = (
        ev.select(
            F.expr(
                "(ts - pmod(ts, 86400000000000)) div 86400000000000"
            ).alias("day_id"),
            arm1.alias("a1"),
            isp.alias("p"),
        )
        .groupBy("day_id")
        .agg(
            F.sum(F.when(F.col("a1"), 1).otherwise(0)).cast("long").alias("n1"),
            F.sum(F.when(F.col("a1") & F.col("p"), 1).otherwise(0))
            .cast("long")
            .alias("x1"),
            F.sum(F.when(~F.col("a1"), 1).otherwise(0)).cast("long").alias("n0"),
            F.sum(F.when(~F.col("a1") & F.col("p"), 1).otherwise(0))
            .cast("long")
            .alias("x0"),
        )
    )
    wo = Window.orderBy("day_id")
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = daily.select(
        "day_id",
        F.row_number().over(wo).cast("long").alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("d"),
        F.sum("n1").over(wc).cast("long").alias("n1"),
        F.sum("x1").over(wc).cast("long").alias("x1"),
        F.sum("n0").over(wc).cast("long").alias("n0"),
        F.sum("x0").over(wc).cast("long").alias("x0"),
    )
    looks = (
        spark.range(1, _GSD_K + 1)
        .select(F.col("id").cast("long").alias("k"))
        .join(
            cum,
            F.col("rn")
            == F.ceil(F.col("k") * F.col("d") / F.lit(float(_GSD_K))).cast(
                "long"
            ),
        )
    )
    phat = "(CAST(x1 + x0 AS DOUBLE) / (n1 + n0))"
    # NOTE: "1.0" in Spark SQL is a DECIMAL literal — 1.0/n would take the
    # decimal division path (1 ulp off DuckDB's double path); CAST keeps
    # every term in IEEE doubles on both engines.
    z = (
        f"(CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)"
        f" / sqrt({phat} * (1 - {phat})"
        f" * (CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n0))"
    )
    bound = f"{_GSD_C} * sqrt(CAST({_GSD_K} AS DOUBLE) / k)"
    return looks.select(
        F.col("k").alias("look"),
        F.col("day_id").alias("look_day_id"),
        "n1",
        "x1",
        "n0",
        "x0",
        F.expr(z).alias("z"),
        F.expr(bound).alias("of_bound"),
        F.expr(
            f"CASE WHEN abs({z}) >= {bound} THEN 'stop_reject' "
            f"ELSE 'continue' END"
        ).alias("decision"),
    )


# ---------------------------------------------------------------------------
# Stratified standardization (the discrete-covariate form of IPW): the
# observational-data treatment-effect estimate with the confounder visible.
# ---------------------------------------------------------------------------
_STD_BANDS = 6  # activity bands (confounder cells)
_STD_BAND_EVENTS = 16  # events per band


@query(
    "stratified_standardization",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               least(count(*) // {_STD_BAND_EVENTS}, {_STD_BANDS - 1})
                   AS cell,
               CAST(CASE WHEN 5 * sum(CASE WHEN event_type = 'signup'
                                      THEN 1 ELSE 0 END) > count(*)
                    THEN 1 ELSE 0 END AS BIGINT) AS t,
               CAST(sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ), cells AS (
        SELECT cell,
               CAST(count(*) AS BIGINT) AS n_cell,
               CAST(sum(t) AS BIGINT) AS n_treat,
               CAST(sum(1 - t) AS BIGINT) AS n_ctrl,
               CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT)
                   AS sy_t,
               CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT)
                   AS sy_c
        FROM per_user GROUP BY cell
    ), tot AS (
        SELECT CAST(sum(n_cell) AS BIGINT) AS n FROM cells
    )
    SELECT cell, n_cell, n_treat, n_ctrl,
           CAST(sy_t AS DOUBLE) / nullif(n_treat, 0) AS mean_treat_cents,
           CAST(sy_c AS DOUBLE) / nullif(n_ctrl, 0) AS mean_ctrl_cents,
           CAST(sy_t AS DOUBLE) / nullif(n_treat, 0)
             - CAST(sy_c AS DOUBLE) / nullif(n_ctrl, 0) AS cell_effect,
           CAST(n_cell AS DOUBLE) / n AS weight,
           (CAST(sy_t AS DOUBLE) / nullif(n_treat, 0)
             - CAST(sy_c AS DOUBLE) / nullif(n_ctrl, 0))
             * (CAST(n_cell AS DOUBLE) / n) AS contribution
    FROM cells CROSS JOIN tot
    """,
)
def stratified_standardization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct standardization over discrete confounder strata — the
    closed-form, discrete-covariate face of inverse-propensity weighting:
    treatment = "signup-heavy user" (above-expected signup intensity,
    5·signups > events — every user signs up at least once in this
    fixture, so the any-signup flag would be degenerate), outcome =
    purchase cents, confounder = activity band (total events, 6 bands).
    Signup intensity is NOT randomized here — it covaries with how
    active a user is — so
    the naive treated-vs-control diff is confounded; weighting each
    band's within-band effect by the band's population share
    standardizes the comparison to the full population (Σ contribution
    = the ATE estimate under no-unmeasured-confounding; within a band,
    weighting by n_cell/n IS the IPW estimate with exact cell
    propensities n_treat/n_cell). Per-band rows keep the positivity
    check visible: a band with an empty arm reports NULL effect instead
    of silently extrapolating.

    Exactness: per-user treatment flags and cent sums, band cells, and
    all six tallies are exact integers; means, weight, and contribution
    are pinned division/multiply chains evaluated identically on both
    engines (each contribution is one product of two correctly-rounded
    quotients).

    Plan: ONE user-keyed pass over the fact table, a band-keyed rollup
    of user-grain rows, and a broadcast 1-row total — scan-bound; the
    band relation is 4 rows at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.least(
            F.expr(f"count(*) DIV {_STD_BAND_EVENTS}"),
            F.lit(_STD_BANDS - 1),
        ).alias("cell"),
        F.when(
            5 * F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0))
            > F.count(F.lit(1)),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("t"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(round(value * 100) AS BIGINT)"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("y"),
    )
    cells = per_user.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_cell"),
        F.sum("t").cast("long").alias("n_treat"),
        F.sum(F.lit(1) - F.col("t")).cast("long").alias("n_ctrl"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("sy_t"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("sy_c"),
    )
    tot = cells.agg(F.sum("n_cell").cast("long").alias("n"))
    mt = "CAST(sy_t AS DOUBLE) / nullif(n_treat, 0)"
    mc = "CAST(sy_c AS DOUBLE) / nullif(n_ctrl, 0)"
    return cells.crossJoin(F.broadcast(tot)).select(
        "cell",
        "n_cell",
        "n_treat",
        "n_ctrl",
        F.expr(mt).alias("mean_treat_cents"),
        F.expr(mc).alias("mean_ctrl_cents"),
        F.expr(f"{mt} - {mc}").alias("cell_effect"),
        F.expr("CAST(n_cell AS DOUBLE) / n").alias("weight"),
        F.expr(f"({mt} - {mc}) * (CAST(n_cell AS DOUBLE) / n)").alias(
            "contribution"
        ),
    )


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch guardrail: the first sanity check every A/B
# platform runs before reading any metric.
# ---------------------------------------------------------------------------
_SRM_P_THRESH = 0.001  # the industry SRM alarm threshold


def _srm_oracle() -> str:
    from ..functions.hashing import sql_hash48
    from ..operators.textstats import _sql_chi2_pvalue

    h = sql_hash48("CAST(user_id AS VARCHAR)")
    chi2 = "(CAST((n_treat - n_ctrl) * (n_treat - n_ctrl) AS DOUBLE) / n_units)"
    p = _sql_chi2_pvalue(chi2)
    return f"""
    WITH u AS (
        SELECT user_id,
               CAST(user_id % 2 AS BIGINT) AS parity_t,
               CAST(CASE WHEN {h} % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
                   AS buggy_t
        FROM (SELECT DISTINCT user_id FROM events)
    ), s AS (
        SELECT 'parity' AS assignment,
               CAST(count(*) AS BIGINT) AS n_units,
               CAST(sum(parity_t) AS BIGINT) AS n_treat,
               CAST(count(*) - sum(parity_t) AS BIGINT) AS n_ctrl
        FROM u
        UNION ALL
        SELECT 'hash_third' AS assignment,
               CAST(count(*) AS BIGINT) AS n_units,
               CAST(sum(buggy_t) AS BIGINT) AS n_treat,
               CAST(count(*) - sum(buggy_t) AS BIGINT) AS n_ctrl
        FROM u
    )
    SELECT assignment, n_units, n_treat, n_ctrl,
           {chi2} AS chi2,
           {p} AS p_value,
           {p} < {_SRM_P_THRESH!r} AS srm_flag
    FROM s
    """


@query("ab_srm_check", oracle=_srm_oracle())
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check — the guardrail every experimentation
    platform evaluates BEFORE any metric is read: a chi-square
    goodness-of-fit of observed arm counts against the intended 50/50
    split, alarmed at p < 0.001 (the industry convention; an SRM means
    the assignment or logging pipeline is broken and every downstream
    readout is invalid). Two assignments are audited side by side: the
    healthy user-parity split the experiment queries here share, and a
    deliberately buggy hash%3 bucket mapped to a 50% intent — the second
    row demonstrates the alarm firing on a real 33/67 imbalance.

    Exactness: arm counts are exact integers over the distinct-user
    relation; chi2 = (n1−n0)²/n is ONE division of exact integers; the
    p-value is the pinned A&S erfc (bh_fdr_token_drift's helper) snapped
    to the 2^-20 grid, so the flag comparison cannot straddle an ulp.

    Plan: one distinct on user_id (user-keyed shuffle), both assignment
    flags computed in the same projection, a 2-row stacked rollup —
    scan-bound at any fact scale."""
    from ..functions.hashing import hash48
    from ..operators.textstats import _sql_chi2_pvalue

    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct().select(
        (F.col("user_id") % 2).cast("long").alias("parity_t"),
        F.when(hash48(F.col("user_id").cast("string")) % 3 == 0, 1)
        .otherwise(0)
        .cast("long")
        .alias("buggy_t"),
    )
    s = u.select(
        F.expr(
            "stack(2, 'parity', parity_t, 'hash_third', buggy_t)"
            " AS (assignment, t)"
        )
    ).groupBy("assignment").agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("t").cast("long").alias("n_treat"),
        (F.count(F.lit(1)) - F.sum("t")).cast("long").alias("n_ctrl"),
    )
    chi2 = (
        "(CAST((n_treat - n_ctrl) * (n_treat - n_ctrl) AS DOUBLE) / n_units)"
    )
    p = _sql_chi2_pvalue(chi2)
    return s.select(
        "assignment",
        "n_units",
        "n_treat",
        "n_ctrl",
        F.expr(chi2).alias("chi2"),
        F.expr(p).alias("p_value"),
        F.expr(f"{p} < {_SRM_P_THRESH!r}").alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# Qini deciles: the uplift-model evaluation curve — ROC's sibling for
# "whom should we treat" questions.
# ---------------------------------------------------------------------------
_QINI_BUCKETS = 10


@query(
    "uplift_qini_deciles",
    oracle=f"""
    WITH pu AS (
        SELECT user_id,
               CAST(user_id % 2 AS BIGINT) AS t,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    AS BIGINT) AS score,
               CAST(CASE WHEN 5 * sum(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END) > count(*)
                    THEN 1 ELSE 0 END AS BIGINT) AS conv
        FROM events GROUP BY user_id
    ), ranked AS (
        SELECT t, conv,
               CAST(ceil(CAST(row_number() OVER (ORDER BY score DESC,
                                                 user_id) AS DOUBLE)
                         * {_QINI_BUCKETS}
                         / (count(*) OVER ())) AS BIGINT) AS decile
        FROM pu
    ), d AS (
        SELECT decile,
               CAST(sum(t) AS BIGINT) AS n_t,
               CAST(count(*) - sum(t) AS BIGINT) AS n_c,
               CAST(sum(CASE WHEN t = 1 THEN conv ELSE 0 END) AS BIGINT)
                   AS conv_t,
               CAST(sum(CASE WHEN t = 0 THEN conv ELSE 0 END) AS BIGINT)
                   AS conv_c
        FROM ranked GROUP BY decile
    ), cum AS (
        SELECT decile, n_t, n_c, conv_t, conv_c,
               CAST(sum(n_t) OVER w AS BIGINT) AS cn_t,
               CAST(sum(n_c) OVER w AS BIGINT) AS cn_c,
               CAST(sum(conv_t) OVER w AS BIGINT) AS cconv_t,
               CAST(sum(conv_c) OVER w AS BIGINT) AS cconv_c
        FROM d
        WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT decile, n_t, n_c, conv_t, conv_c,
           CAST(cconv_t AS DOUBLE)
             - CAST(cconv_c AS DOUBLE) * cn_t / nullif(cn_c, 0)
               AS qini,
           CAST(cconv_t AS DOUBLE) / nullif(cn_t, 0)
             - CAST(cconv_c AS DOUBLE) / nullif(cn_c, 0) AS uplift_at_depth
    FROM cum
    """,
)
def uplift_qini_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini curve by score decile — the uplift-modeling evaluation: users
    are ranked by a targeting score (signup count, standing in for any
    uplift model's output) and, at each cumulative depth, the incremental
    conversions attributable to treatment are
    qini(k) = conv_t(k) − conv_c(k)·n_t(k)/n_c(k) (treated conversions
    minus the control conversions scaled to the treated population), plus
    the per-depth uplift rate difference. Arms are the shared parity
    randomization; conversion is the above-expected-purchaser flag
    (5·purchases > events — the any-purchase flag saturates in this
    fixture). A flat qini curve says the score does not concentrate
    incremental converters; ROC/AUC cannot answer that question because
    it scores OUTCOME ranking, not INCREMENTAL response.

    Exactness: scores, ranks, deciles, and all cumulative cells are
    exact integers (the rank window carries a total order — score desc,
    user_id); qini and uplift are pinned quotient chains over those
    integers, NULL-guarded on empty control prefixes.

    Plan: ONE user-keyed pass builds (t, score, conv); the rank window
    runs over the USER-grain relation (at 100 TB swap for
    global_rank_two_phase's bucket ranks — the registered no-global-sort
    pattern); everything after is a 10-row cumulative window."""
    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0))
        .cast("long")
        .alias("score"),
        F.when(
            5
            * F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            > F.count(F.lit(1)),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("conv"),
    ).select(
        (F.col("user_id") % 2).cast("long").alias("t"),
        "user_id",
        "score",
        "conv",
    )
    wr = Window.orderBy(F.desc("score"), F.asc("user_id"))
    wn = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = pu.select(
        "t",
        "conv",
        F.ceil(
            F.row_number().over(wr).cast("double")
            * _QINI_BUCKETS
            / F.count(F.lit(1)).over(wn)
        )
        .cast("long")
        .alias("decile"),
    )
    d = ranked.groupBy("decile").agg(
        F.sum("t").cast("long").alias("n_t"),
        (F.count(F.lit(1)) - F.sum("t")).cast("long").alias("n_c"),
        F.sum(F.when(F.col("t") == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_t"),
        F.sum(F.when(F.col("t") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_c"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = d.select(
        "decile",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.sum("n_t").over(wc).cast("long").alias("cn_t"),
        F.sum("n_c").over(wc).cast("long").alias("cn_c"),
        F.sum("conv_t").over(wc).cast("long").alias("cconv_t"),
        F.sum("conv_c").over(wc).cast("long").alias("cconv_c"),
    )
    return cum.select(
        "decile",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.expr(
            "CAST(cconv_t AS DOUBLE)"
            " - CAST(cconv_c AS DOUBLE) * cn_t / nullif(cn_c, 0)"
        ).alias("qini"),
        F.expr(
            "CAST(cconv_t AS DOUBLE) / nullif(cn_t, 0)"
            " - CAST(cconv_c AS DOUBLE) / nullif(cn_c, 0)"
        ).alias("uplift_at_depth"),
    )


# ---------------------------------------------------------------------------
# Yuen's trimmed-means test — the robust two-sample location test that
# survives the fat tails that invalidate a plain t-test.
# ---------------------------------------------------------------------------
_YUEN_TRIM_PCT = 20  # standard 20% symmetric trim


@query(
    "yuen_trimmed_ttest",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS arm,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ), ranked AS (
        SELECT arm, y,
               row_number() OVER (PARTITION BY arm ORDER BY y, user_id)
                   AS rn,
               count(*) OVER (PARTITION BY arm) AS n
        FROM per_user
    ), bounds AS (
        SELECT arm, CAST(max(n) AS BIGINT) AS n,
               CAST((max(n) * {_YUEN_TRIM_PCT} + 99) // 100 AS BIGINT) AS g,
               max(CASE WHEN rn = (n * {_YUEN_TRIM_PCT} + 99) // 100 + 1
                        THEN y END) AS lo,
               max(CASE WHEN rn = n - (n * {_YUEN_TRIM_PCT} + 99) // 100
                        THEN y END) AS hi
        FROM ranked GROUP BY arm
    ), arms AS (
        SELECT r.arm, b.n, b.g, b.n - 2 * b.g AS h,
               CAST(sum(CASE WHEN r.rn > b.g AND r.rn <= b.n - b.g
                        THEN r.y ELSE 0 END) AS BIGINT) AS ts_,
               CAST(sum(CAST(least(greatest(r.y, b.lo), b.hi)
                             AS DECIMAL(38,0))) AS DOUBLE) AS ws,
               CAST(sum(CAST(least(greatest(r.y, b.lo), b.hi)
                             AS DECIMAL(38,0))
                        * least(greatest(r.y, b.lo), b.hi)) AS DOUBLE)
                   AS wss
        FROM ranked r JOIN bounds b ON b.arm = r.arm
        GROUP BY r.arm, b.n, b.g
    ), pivoted AS (
        SELECT
            max(CASE WHEN arm = 1 THEN n END) AS n1,
            max(CASE WHEN arm = 0 THEN n END) AS n0,
            max(CASE WHEN arm = 1 THEN h END) AS h1,
            max(CASE WHEN arm = 0 THEN h END) AS h0,
            max(CASE WHEN arm = 1 THEN CAST(ts_ AS DOUBLE) / h END) AS m1,
            max(CASE WHEN arm = 0 THEN CAST(ts_ AS DOUBLE) / h END) AS m0,
            max(CASE WHEN arm = 1 THEN
                ((wss - ws * ws / n) / (n - 1)) * (n - 1.0)
                / (h * (h - 1.0)) END) AS d1,
            max(CASE WHEN arm = 0 THEN
                ((wss - ws * ws / n) / (n - 1)) * (n - 1.0)
                / (h * (h - 1.0)) END) AS d0
        FROM arms
    )
    SELECT n1, n0, h1, h0, m1 AS trimmed_mean_1, m0 AS trimmed_mean_0,
           m1 - m0 AS diff,
           (m1 - m0) / sqrt(d1 + d0) AS t_stat,
           (d1 + d0) * (d1 + d0)
             / (d1 * d1 / (h1 - 1.0) + d0 * d0 / (h0 - 1.0)) AS df
    FROM pivoted
    """,
)
def yuen_trimmed_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yuen's trimmed-means test between the two parity arms on per-user
    revenue: 20% of each tail is trimmed (means from the middle 60%) and
    the standard error comes from the WINSORIZED variance — the robust
    location test that keeps its nominal error rate under the fat-tailed,
    outlier-ridden metrics where the plain t-test's variance estimate
    explodes. Completes the two-sample family: z (proportions), delta
    (ratio metrics), Mann-Whitney (ranks), Yuen (trimmed means).

    Exactness: per-user cents, rank positions, trim counts, the trimmed
    sum, and both winsorized DECIMAL moments are exact integers; the
    trimmed means, Yuen variance terms d_j = s²_w(n−1)/(h(h−1)), t, and
    the Welch-Satterthwaite df are pinned closed-form chains over those
    scalars — no float aggregation anywhere (the winsorized_stats
    clamp-at-order-statistics discipline extended with a test statistic).

    Plan: one user-keyed pass, one arm-partitioned rank window over
    user-grain rows, an arm-keyed clamp/rollup, and a 1-row pivot. At
    100 TB the per-arm rank window swaps for global_rank_two_phase's
    bucket ranks — the registered no-global-sort pattern."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("long")
        .alias("y")
    ).select((F.col("user_id") % 2).alias("arm"), "user_id", "y")
    wr = Window.partitionBy("arm").orderBy("y", "user_id")
    wn = Window.partitionBy("arm")
    ranked = per_user.select(
        "arm",
        "y",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    g = f"(n * {_YUEN_TRIM_PCT} + 99) DIV 100"
    bounds = ranked.groupBy("arm").agg(
        F.max("n").cast("long").alias("n"),
        F.expr(f"CAST((max(n) * {_YUEN_TRIM_PCT} + 99) DIV 100 AS BIGINT)").alias(
            "g"
        ),
        F.max(F.expr(f"CASE WHEN rn = {g} + 1 THEN y END")).alias("lo"),
        F.max(F.expr(f"CASE WHEN rn = n - ({g}) THEN y END")).alias("hi"),
    )
    clamped = "least(greatest(r.y, b.lo), b.hi)"
    arms = (
        ranked.alias("r")
        .join(F.broadcast(bounds.alias("b")), "arm")
        .groupBy("arm", F.col("b.n").alias("n"), F.col("b.g").alias("gg"))
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN r.rn > b.g AND r.rn <= b.n - b.g"
                    " THEN r.y ELSE 0 END"
                )
            )
            .cast("long")
            .alias("ts_"),
            F.expr(
                f"CAST(sum(CAST({clamped} AS DECIMAL(38,0))) AS DOUBLE)"
            ).alias("ws"),
            F.expr(
                f"CAST(sum(CAST({clamped} AS DECIMAL(38,0)) * {clamped})"
                " AS DOUBLE)"
            ).alias("wss"),
        )
        .select(
            "arm",
            "n",
            (F.col("n") - 2 * F.col("gg")).alias("h"),
            "ts_",
            "ws",
            "wss",
        )
    )
    dterm = (
        "((wss - ws * ws / n) / (n - 1)) * (n - 1.0) / (h * (h - 1.0))"
    )
    pv = arms.agg(
        F.max(F.expr("CASE WHEN arm = 1 THEN n END")).alias("n1"),
        F.max(F.expr("CASE WHEN arm = 0 THEN n END")).alias("n0"),
        F.max(F.expr("CASE WHEN arm = 1 THEN h END")).alias("h1"),
        F.max(F.expr("CASE WHEN arm = 0 THEN h END")).alias("h0"),
        F.max(
            F.expr("CASE WHEN arm = 1 THEN CAST(ts_ AS DOUBLE) / h END")
        ).alias("m1"),
        F.max(
            F.expr("CASE WHEN arm = 0 THEN CAST(ts_ AS DOUBLE) / h END")
        ).alias("m0"),
        F.max(F.expr(f"CASE WHEN arm = 1 THEN {dterm} END")).alias("d1"),
        F.max(F.expr(f"CASE WHEN arm = 0 THEN {dterm} END")).alias("d0"),
    )
    return pv.select(
        "n1",
        "n0",
        "h1",
        "h0",
        F.col("m1").alias("trimmed_mean_1"),
        F.col("m0").alias("trimmed_mean_0"),
        F.expr("m1 - m0").alias("diff"),
        F.expr("(m1 - m0) / sqrt(d1 + d0)").alias("t_stat"),
        F.expr(
            "(d1 + d0) * (d1 + d0)"
            " / (d1 * d1 / (h1 - 1.0) + d0 * d0 / (h0 - 1.0))"
        ).alias("df"),
    )


# ---------------------------------------------------------------------------
# Covariate balance (standardized mean differences) — the audit table read
# BEFORE trusting any treated-vs-control comparison.
# ---------------------------------------------------------------------------
_SMD_THRESH = 0.1  # the conventional imbalance flag


@query(
    "covariate_balance_smd",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(CASE WHEN 5 * sum(CASE WHEN event_type = 'signup'
                                      THEN 1 ELSE 0 END) > count(*)
                    THEN 1 ELSE 0 END AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchases,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents,
               CAST(count(DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT))
                    AS BIGINT) AS active_days
        FROM events GROUP BY user_id
    ), long AS (
        SELECT t, 'n_events' AS covariate, n_events AS v FROM per_user
        UNION ALL
        SELECT t, 'n_purchases', n_purchases FROM per_user
        UNION ALL
        SELECT t, 'total_cents', total_cents FROM per_user
        UNION ALL
        SELECT t, 'active_days', active_days FROM per_user
    ), m AS (
        SELECT covariate,
               CAST(sum(t) AS BIGINT) AS n1,
               CAST(count(*) - sum(t) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN t = 1
                        THEN CAST(v AS DECIMAL(38,0)) END) AS DOUBLE) AS s1,
               CAST(sum(CASE WHEN t = 0
                        THEN CAST(v AS DECIMAL(38,0)) END) AS DOUBLE) AS s0,
               CAST(sum(CASE WHEN t = 1
                        THEN CAST(v AS DECIMAL(38,0)) * v END) AS DOUBLE)
                   AS q1,
               CAST(sum(CASE WHEN t = 0
                        THEN CAST(v AS DECIMAL(38,0)) * v END) AS DOUBLE)
                   AS q0
        FROM long GROUP BY covariate
    )
    SELECT covariate, n1, n0,
           s1 / n1 AS mean_treat,
           s0 / n0 AS mean_ctrl,
           (s1 / n1 - s0 / n0)
             / sqrt(((q1 - s1 * s1 / n1) / (n1 - 1)
                     + (q0 - s0 * s0 / n0) / (n0 - 1)) / 2) AS smd,
           abs((s1 / n1 - s0 / n0)
             / sqrt(((q1 - s1 * s1 / n1) / (n1 - 1)
                     + (q0 - s0 * s0 / n0) / (n0 - 1)) / 2))
               > {_SMD_THRESH!r} AS imbalanced
    FROM m
    """,
)
def covariate_balance_smd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate balance table: standardized mean difference
    (m1 − m0) / sqrt((s1² + s0²)/2) of four user-level covariates
    (events, purchases, cents, active days) between the signup-heavy
    treatment of stratified_standardization and its control — the audit
    read BEFORE trusting any treated-vs-control comparison, and AFTER
    any weighting to confirm it worked. |SMD| > 0.1 is the conventional
    imbalance flag; a flagged covariate is exactly what the
    standardization strata must include.

    Exactness: per-user covariates are exact integers; the four long
    rows ride ONE user pass; per-covariate moments are exact DECIMAL
    sums cast once; SMD is a pinned chain (sum of two correctly-rounded
    quotients, one sqrt, one division — no multiply-add pattern); the
    flag compares against a shared literal.

    Plan: one user-keyed pass (the distinct-days term makes it an exact
    two-level aggregation), a 4x stacked union at USER grain, one
    covariate-keyed moment rollup — 4-row output at any scale."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.when(
            5 * F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0))
            > F.count(F.lit(1)),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("t"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("long")
        .alias("total_cents"),
        F.countDistinct(
            F.expr("(ts - pmod(ts, 86400000000000)) div 86400000000000")
        )
        .cast("long")
        .alias("active_days"),
    )
    long = per_user.select(
        "t",
        F.expr(
            "stack(4, 'n_events', n_events, 'n_purchases', n_purchases,"
            " 'total_cents', total_cents, 'active_days', active_days)"
            " AS (covariate, v)"
        ),
    )
    m = long.groupBy("covariate").agg(
        F.sum("t").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("t")).cast("long").alias("n0"),
        F.expr(
            "CAST(sum(CASE WHEN t = 1 THEN CAST(v AS DECIMAL(38,0)) END)"
            " AS DOUBLE)"
        ).alias("s1"),
        F.expr(
            "CAST(sum(CASE WHEN t = 0 THEN CAST(v AS DECIMAL(38,0)) END)"
            " AS DOUBLE)"
        ).alias("s0"),
        F.expr(
            "CAST(sum(CASE WHEN t = 1 THEN CAST(v AS DECIMAL(38,0)) * v END)"
            " AS DOUBLE)"
        ).alias("q1"),
        F.expr(
            "CAST(sum(CASE WHEN t = 0 THEN CAST(v AS DECIMAL(38,0)) * v END)"
            " AS DOUBLE)"
        ).alias("q0"),
    )
    smd = (
        "(s1 / n1 - s0 / n0)"
        " / sqrt(((q1 - s1 * s1 / n1) / (n1 - 1)"
        "         + (q0 - s0 * s0 / n0) / (n0 - 1)) / 2)"
    )
    return m.select(
        "covariate",
        "n1",
        "n0",
        F.expr("s1 / n1").alias("mean_treat"),
        F.expr("s0 / n0").alias("mean_ctrl"),
        F.expr(smd).alias("smd"),
        F.expr(f"abs({smd}) > {_SMD_THRESH!r}").alias("imbalanced"),
    )


# ---------------------------------------------------------------------------
# Partial correlation — association between two metrics with a third held
# fixed; the first confound-removal step before any causal claim.
# ---------------------------------------------------------------------------
@query(
    "partial_correlation",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS x,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y,
               CAST(count(DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT))
                    AS BIGINT) AS z
        FROM events GROUP BY user_id
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(sum(CAST(z AS DECIMAL(38,0))) AS DOUBLE) AS sz,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy,
               CAST(sum(CAST(z AS DECIMAL(38,0)) * z) AS DOUBLE) AS szz,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * z) AS DOUBLE) AS sxz,
               CAST(sum(CAST(y AS DECIMAL(38,0)) * z) AS DOUBLE) AS syz
        FROM per_user
    ), r AS (
        SELECT n,
               (n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rxy,
               (n * sxz - sx * sz)
                 / sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)) AS rxz,
               (n * syz - sy * sz)
                 / sqrt((n * syy - sy * sy) * (n * szz - sz * sz)) AS ryz
        FROM m
    )
    SELECT n AS n_users, rxy, rxz, ryz,
           (rxy - rxz * ryz)
             / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)) AS r_xy_given_z
    FROM r
    """,
)
def partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation r_{xy·z} between per-user event count (x) and
    revenue cents (y) with active days (z) held fixed:
    (r_xy − r_xz·r_yz) / sqrt((1−r_xz²)(1−r_yz²)) — the one-line answer
    to "do heavy users spend more, or do they just show up on more
    days?", and the first confound-removal step before any causal
    machinery (stratified_standardization is the design-based follow-up
    when z is discrete). Reported next to all three raw correlations so
    the collapse (or survival) of the association is visible.

    Exactness: the nine moments are exact DECIMAL(38,0) sums cast to
    double ONCE (corr_exact's discipline extended to three variables);
    every correlation and the partial form are pinned chains of
    correctly-rounded IEEE ops — products and divisions only, no
    multiply-add contraction pattern, no float aggregation.

    Plan: ONE user-keyed pass (two-level exact distinct for z), a 1-row
    nine-moment rollup — scan-bound at any fact scale."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("long")
        .alias("y"),
        F.countDistinct(
            F.expr("(ts - pmod(ts, 86400000000000)) div 86400000000000")
        )
        .cast("long")
        .alias("z"),
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.expr(f"CAST(sum(CAST({a} AS DECIMAL(38,0))) AS DOUBLE)").alias(
                f"s{a}"
            )
            for a in ("x", "y", "z")
        ],
        *[
            F.expr(
                f"CAST(sum(CAST({a} AS DECIMAL(38,0)) * {b}) AS DOUBLE)"
            ).alias(f"s{a}{b}")
            for a, b in (("x", "x"), ("y", "y"), ("z", "z"),
                         ("x", "y"), ("x", "z"), ("y", "z"))
        ],
    )
    def corr(a: str, b: str) -> str:
        return (
            f"(n * s{a}{b} - s{a} * s{b})"
            f" / sqrt((n * s{a}{a} - s{a} * s{a})"
            f" * (n * s{b}{b} - s{b} * s{b}))"
        )

    r = m.select(
        "n",
        F.expr(corr("x", "y")).alias("rxy"),
        F.expr(corr("x", "z")).alias("rxz"),
        F.expr(corr("y", "z")).alias("ryz"),
    )
    return r.select(
        F.col("n").alias("n_users"),
        "rxy",
        "rxz",
        "ryz",
        F.expr(
            "(rxy - rxz * ryz)"
            " / sqrt((1 - rxz * rxz) * (1 - ryz * ryz))"
        ).alias("r_xy_given_z"),
    )


# ---------------------------------------------------------------------------
# Decision stump: the exact best Gini split of the quality score for
# predicting near-dup membership — the supervised-binning primitive.
# ---------------------------------------------------------------------------
@query(
    "decision_stump_split",
    oracle=_scored_ctes()
    + """
    , per_v AS (
        SELECT x AS v, CAST(count(*) AS BIGINT) AS t,
               CAST(sum(y) AS BIGINT) AS t1
        FROM sc GROUP BY x
    ), tot AS (
        SELECT CAST(sum(t) AS BIGINT) AS n, CAST(sum(t1) AS BIGINT) AS p
        FROM per_v
    ), cum AS (
        SELECT v,
               CAST(sum(t) OVER w AS BIGINT) AS nl,
               CAST(sum(t1) OVER w AS BIGINT) AS kl
        FROM per_v
        WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ), scored AS (
        SELECT c.v, c.nl, c.kl, t.n - c.nl AS nr, t.p - c.kl AS kr,
               t.n, t.p,
               ((c.nl - (CAST(c.kl * c.kl AS DOUBLE)
                         + CAST((c.nl - c.kl) * (c.nl - c.kl) AS DOUBLE))
                        / c.nl)
                + ((t.n - c.nl) - (CAST((t.p - c.kl) * (t.p - c.kl)
                                        AS DOUBLE)
                    + CAST(((t.n - c.nl) - (t.p - c.kl))
                           * ((t.n - c.nl) - (t.p - c.kl)) AS DOUBLE))
                        / (t.n - c.nl)))
               / t.n AS gini_after
        FROM cum c CROSS JOIN tot t
        WHERE t.n - c.nl > 0
    )
    SELECT v AS split_x, nl AS n_left, nr AS n_right,
           kl AS pos_left, kr AS pos_right,
           (n - (CAST(p * p AS DOUBLE)
                 + CAST((n - p) * (n - p) AS DOUBLE)) / n) / n
               AS gini_parent,
           gini_after,
           (n - (CAST(p * p AS DOUBLE)
                 + CAST((n - p) * (n - p) AS DOUBLE)) / n) / n - gini_after
               AS gini_gain
    FROM (
        SELECT s.*, row_number() OVER (ORDER BY gini_after, v) AS rn
        FROM scored s
    ) WHERE rn = 1
    """,
)
def decision_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact one-level decision tree (stump) on the quality score for
    predicting near-dup membership: every cut point on the score support
    is evaluated by weighted Gini impurity of the two children, and the
    best split is reported with its child cells and gain — the
    supervised-binning / feature-screening primitive behind tree
    learners, and the principled way to pick a quality gate threshold
    when a LABEL (here: near-dup) is available (f1_optimal_threshold
    optimizes the classifier metric; the stump optimizes impurity, and
    running both IS the objective-sensitivity check).

    Exactness: support-level counts and both cumulative cells are exact
    integers; each child impurity is n_c − (k² + (n_c−k)²)/n_c — integer
    squares divided ONCE, log-free (Gini, not entropy, exactly so this
    stays rational); the argmin carries a (gini, v) total order over
    identically-computed doubles.

    Plan: corpus → score-support collapse (one shuffle), one cumulative
    window over the SUPPORT (bounded by distinct score values, never
    docs), broadcast totals, rank-1 selection."""
    sc = _scored(spark, sf_dir)
    per_v = sc.groupBy(F.col("x").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("y").cast("long").alias("t1"),
    )
    tot = per_v.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum("t1").cast("long").alias("p"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_v.select(
        "v",
        F.sum("t").over(w).cast("long").alias("nl"),
        F.sum("t1").over(w).cast("long").alias("kl"),
    )
    child = (
        "((nl - (CAST(kl * kl AS DOUBLE)"
        " + CAST((nl - kl) * (nl - kl) AS DOUBLE)) / nl)"
        " + ((n - nl) - (CAST((p - kl) * (p - kl) AS DOUBLE)"
        " + CAST(((n - nl) - (p - kl)) * ((n - nl) - (p - kl))"
        " AS DOUBLE)) / (n - nl))) / n"
    )
    parent = (
        "(n - (CAST(p * p AS DOUBLE)"
        " + CAST((n - p) * (n - p) AS DOUBLE)) / n) / n"
    )
    scored = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.expr("n - nl > 0"))
        .select(
            "v",
            "nl",
            "kl",
            F.expr("n - nl").alias("nr"),
            F.expr("p - kl").alias("kr"),
            "n",
            "p",
            F.expr(child).alias("gini_after"),
        )
    )
    wr = Window.orderBy("gini_after", "v")
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            F.col("v").alias("split_x"),
            F.col("nl").alias("n_left"),
            F.col("nr").alias("n_right"),
            F.col("kl").alias("pos_left"),
            F.col("kr").alias("pos_right"),
            F.expr(parent).alias("gini_parent"),
            "gini_after",
            F.expr(f"{parent} - gini_after").alias("gini_gain"),
        )
    )


# ---------------------------------------------------------------------------
# TOST equivalence test — the non-inferiority readout: "is the difference
# provably INSIDE ±margin", the question significance tests cannot answer.
# ---------------------------------------------------------------------------
_TOST_MARGIN = "0.02"  # equivalence margin on the conversion-rate scale
_TOST_Z90 = "1.6448536269514722"  # z_{0.95}: TOST at 5% uses two 90% bounds


@query(
    "ab_tost_equivalence",
    oracle=f"""
    WITH pu AS (
        SELECT user_id, user_id % 2 AS arm,
               CAST(CASE WHEN 5 * sum(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END) > count(*)
                    THEN 1 ELSE 0 END AS BIGINT) AS conv
        FROM events GROUP BY user_id
    ), cells AS (
        SELECT CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
                   AS x1,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0,
               CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
                   AS x0
        FROM pu
    ), s AS (
        SELECT n1, x1, n0, x0,
               CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0 AS diff,
               sqrt((CAST(x1 AS DOUBLE) / n1)
                    * (1 - CAST(x1 AS DOUBLE) / n1) / n1
                    + (CAST(x0 AS DOUBLE) / n0)
                      * (1 - CAST(x0 AS DOUBLE) / n0) / n0) AS se
        FROM cells
    )
    SELECT n1, x1, n0, x0, diff, se,
           diff - {_TOST_Z90} * se AS ci90_lo,
           diff + {_TOST_Z90} * se AS ci90_hi,
           (diff - {_TOST_Z90} * se > -{_TOST_MARGIN}
            AND diff + {_TOST_Z90} * se < {_TOST_MARGIN}) AS equivalent
    FROM s
    """,
)
def ab_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST (two one-sided tests) equivalence readout for the arm
    conversion rates: the arms are declared EQUIVALENT at the 5% level
    when the 90% CI of the rate difference lies entirely inside the
    ±margin band — the non-inferiority question ("did this refactor NOT
    hurt conversion?") that a non-significant ordinary test can never
    answer (absence of evidence is not evidence of absence). The parity
    arms are a true A/A here, so at fixture scale the readout documents
    how tight an equivalence one can claim at this n.

    Exactness: the four cells are exact integers; diff, the unpooled SE
    (the Wald form TOST conventionally uses), the 90% bounds with the
    shared z literal, and the band comparison are pinned chains — the
    margin is a shared decimal literal so the boolean cannot straddle an
    ulp.

    Plan: one user-keyed pass, a 1-row conditional-cell rollup, pinned
    arithmetic — scan-bound."""
    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.when(
            5
            * F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            > F.count(F.lit(1)),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("conv"),
    ).select((F.col("user_id") % 2).alias("arm"), "conv")
    cells = pu.agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("x1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("x0"),
    )
    diff = "CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0"
    se = (
        "sqrt((CAST(x1 AS DOUBLE) / n1) * (1 - CAST(x1 AS DOUBLE) / n1) / n1"
        " + (CAST(x0 AS DOUBLE) / n0) * (1 - CAST(x0 AS DOUBLE) / n0) / n0)"
    )
    return cells.select(
        "n1",
        "x1",
        "n0",
        "x0",
        F.expr(diff).alias("diff"),
        F.expr(se).alias("se"),
        F.expr(f"({diff}) - {_TOST_Z90} * ({se})").alias("ci90_lo"),
        F.expr(f"({diff}) + {_TOST_Z90} * ({se})").alias("ci90_hi"),
        F.expr(
            f"(({diff}) - {_TOST_Z90} * ({se}) > -{_TOST_MARGIN}"
            f" AND ({diff}) + {_TOST_Z90} * ({se}) < {_TOST_MARGIN})"
        ).alias("equivalent"),
    )


# ---------------------------------------------------------------------------
# Pinball (quantile) loss evaluation — why quantile forecasts are scored
# with an asymmetric loss, shown with exact arithmetic.
# ---------------------------------------------------------------------------
_PIN_TAU10 = 9  # tau = 0.9 on a x10 integer grid: weights 9 (under) / 1 (over)


@query(
    "pinball_loss_eval",
    oracle=f"""
    WITH v AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               row_number() OVER (ORDER BY
                   CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)
                   AS rn,
               count(*) OVER () AS n
        FROM orders
    ), preds AS (
        SELECT max(CASE WHEN rn = (n * 9 + 9) // 10 THEN cents END) AS q90,
               CAST(sum(cents) AS HUGEINT) AS s,
               CAST(max(n) AS BIGINT) AS n
        FROM v
    ), loss AS (
        SELECT p.n, p.q90,
               CAST(CAST(p.s AS VARCHAR) AS DOUBLE) / p.n AS mean_cents,
               CAST(sum(CASE WHEN v.cents >= p.q90
                        THEN {_PIN_TAU10} * (v.cents - p.q90)
                        ELSE (10 - {_PIN_TAU10}) * (p.q90 - v.cents) END)
                    AS HUGEINT) AS l_q90_x10,
               CAST(sum(CASE WHEN v.cents >= p.s // p.n
                        THEN {_PIN_TAU10} * (v.cents - p.s // p.n)
                        ELSE (10 - {_PIN_TAU10}) * (p.s // p.n - v.cents)
                        END) AS HUGEINT) AS l_mean_x10
        FROM v CROSS JOIN preds p
        GROUP BY p.n, p.q90, p.s
    )
    SELECT n AS n_orders, q90 AS q90_cents, mean_cents,
           CAST(CAST(l_q90_x10 AS VARCHAR) AS DOUBLE) / (10.0 * n)
               AS pinball_q90,
           CAST(CAST(l_mean_x10 AS VARCHAR) AS DOUBLE) / (10.0 * n)
               AS pinball_mean,
           CAST(l_q90_x10 <= l_mean_x10 AS INT) AS quantile_wins
    FROM loss
    """,
)
def pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss at tau = 0.9 for two constant predictors
    of order value — the empirical P90 order statistic and the integer
    mean: L_tau(y, q) = tau·(y−q)⁺ + (1−tau)·(q−y)⁺. The P90 minimizes
    expected pinball loss at tau = 0.9 BY CONSTRUCTION, so
    quantile_wins = 1 is a theorem made visible — the demonstration of
    WHY quantile forecasts (capacity planning, SLA sizing) are scored
    with this asymmetric loss and never with MAE/RMSE. Completes the
    forecast-evaluation pair with forecast_backtest_naive's MAE/WAPE.

    Exactness: tau = 0.9 puts both weights on a x10 integer grid, so
    every loss term and both loss sums are EXACT integers (accumulated
    as HUGEINT/DECIMAL, VARCHAR-routed to double — the 1-ulp cast trap);
    the P90 is a rank selection of a real data value; the mean predictor
    is the integer floor mean so the comparison stays exact.

    Plan: one rank window over orders (two-phase-swappable at scale),
    one broadcast of the two predictors back onto the scan, one loss
    rollup."""
    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        "o_orderkey",
    )
    w = Window.orderBy("cents", "o_orderkey")
    ranked = v.select(
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    preds = ranked.agg(
        F.max(
            F.expr("CASE WHEN rn = (n * 9 + 9) DIV 10 THEN cents END")
        ).alias("q90"),
        F.sum("cents").cast("decimal(38,0)").alias("s"),
        F.max("n").cast("long").alias("n_all"),
    )
    loss = (
        ranked.select("cents")
        .crossJoin(F.broadcast(preds))
        .groupBy("n_all", "q90", "s")
        .agg(
            F.expr(
                f"CAST(sum(CASE WHEN cents >= q90"
                f" THEN {_PIN_TAU10} * (cents - q90)"
                f" ELSE (10 - {_PIN_TAU10}) * (q90 - cents) END)"
                " AS DECIMAL(38,0))"
            ).alias("l_q90_x10"),
            F.expr(
                f"CAST(sum(CASE WHEN cents >= CAST(s AS DECIMAL(38,0))"
                f" DIV n_all THEN {_PIN_TAU10} * (cents - s DIV n_all)"
                f" ELSE (10 - {_PIN_TAU10}) * (s DIV n_all - cents) END)"
                " AS DECIMAL(38,0))"
            ).alias("l_mean_x10"),
        )
    )
    return loss.select(
        F.col("n_all").alias("n_orders"),
        F.col("q90").alias("q90_cents"),
        F.expr("CAST(CAST(s AS STRING) AS DOUBLE) / n_all").alias(
            "mean_cents"
        ),
        F.expr(
            "CAST(CAST(l_q90_x10 AS STRING) AS DOUBLE) / (10.0 * n_all)"
        ).alias("pinball_q90"),
        F.expr(
            "CAST(CAST(l_mean_x10 AS STRING) AS DOUBLE) / (10.0 * n_all)"
        ).alias("pinball_mean"),
        F.expr("CAST(l_q90_x10 <= l_mean_x10 AS INT)").alias(
            "quantile_wins"
        ),
    )


# ---------------------------------------------------------------------------
# Off-policy evaluation: inverse-propensity-scored replay of a target
# policy over logged randomized traffic — the recommender-system estimator.
# ---------------------------------------------------------------------------
@query(
    "ips_policy_replay",
    oracle="""
    WITH pu AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS logged_arm,
               CAST(CASE WHEN 5 * sum(CASE WHEN event_type = 'signup'
                                      THEN 1 ELSE 0 END) > count(*)
                    THEN 1 ELSE 0 END AS BIGINT) AS pi_arm,
               CAST(sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS r
        FROM events GROUP BY user_id
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(r) AS BIGINT) AS r_all,
               CAST(sum(CASE WHEN pi_arm = logged_arm THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_match,
               CAST(sum(CASE WHEN pi_arm = logged_arm THEN r ELSE 0 END)
                    AS BIGINT) AS r_match
        FROM pu
    )
    SELECT n AS n_users, n_match,
           CAST(n_match AS DOUBLE) / n AS match_rate,
           CAST(r_all AS DOUBLE) / (CAST(100 AS DOUBLE) * n)
               AS logged_value,
           CAST(2 AS DOUBLE) * r_match / (CAST(100 AS DOUBLE) * n)
               AS ips_value,
           CAST(r_match AS DOUBLE)
             / nullif(CAST(100 AS DOUBLE) * n_match, CAST(0 AS DOUBLE))
               AS snips_value
    FROM s
    """,
)
def ips_policy_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation by inverse-propensity-scored replay: the
    logged randomization (user parity, known propensity 1/2 per arm)
    lets a NEW target policy — "treat signup-heavy users" — be valued
    without deploying it: IPS = (1/n) Σ r·1[π(u)=a_u]/0.5 (unbiased,
    high variance at low match rates) next to SNIPS = Σ_match r / Σ_match
    w (self-normalized — biased but variance-damped), plus the logged
    value and the match rate that governs which estimator to trust. This
    is the counterfactual-evaluation primitive behind every recommender
    and ranking-policy iteration on logged data.

    Exactness: per-user rewards (cents), match indicators, and all four
    tallies are exact integers off ONE user-keyed pass; each reported
    value is a single pinned division (the 1/0.5 importance weight folds
    into the literal 2.0).

    Plan: one user-keyed pass, a 1-row conditional rollup — scan-bound
    at any fact scale."""
    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.when(
            5 * F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0))
            > F.count(F.lit(1)),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("pi_arm"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(round(value * 100) AS BIGINT)"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("r"),
    ).select(
        (F.col("user_id") % 2).cast("long").alias("logged_arm"),
        "pi_arm",
        "r",
    )
    s = pu.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("r_all"),
        F.sum(F.when(F.col("pi_arm") == F.col("logged_arm"), 1).otherwise(0))
        .cast("long")
        .alias("n_match"),
        F.sum(
            F.when(F.col("pi_arm") == F.col("logged_arm"), F.col("r")).otherwise(
                0
            )
        )
        .cast("long")
        .alias("r_match"),
    )
    return s.select(
        F.col("n").alias("n_users"),
        "n_match",
        F.expr("CAST(n_match AS DOUBLE) / n").alias("match_rate"),
        F.expr(
            "CAST(r_all AS DOUBLE) / (CAST(100 AS DOUBLE) * n)"
        ).alias("logged_value"),
        F.expr(
            "CAST(2 AS DOUBLE) * r_match / (CAST(100 AS DOUBLE) * n)"
        ).alias("ips_value"),
        F.expr(
            "CAST(r_match AS DOUBLE)"
            " / nullif(CAST(100 AS DOUBLE) * n_match, CAST(0 AS DOUBLE))"
        ).alias("snips_value"),
    )


# ---------------------------------------------------------------------------
# Expected / maximum calibration error — the single-number summary of the
# reliability table (the LLM-eval calibration headline).
# ---------------------------------------------------------------------------
def _ece_oracle() -> str:
    from .. import registry as _r

    return f"""
    WITH bins AS MATERIALIZED ({_r.ORACLES['score_calibration_bins']}),
    l AS (
        SELECT CAST(count(*) AS BIGINT) AS n_bins,
               CAST(sum(n_docs) AS BIGINT) AS n_total,
               list_sort(list(struct_pack(bin := bin, n_docs := n_docs,
                   gap := abs(frac_kept - mean_score)))) AS lst,
               max(abs(frac_kept - mean_score)) AS mce
        FROM bins
    )
    SELECT n_bins, n_total,
           list_reduce([0.0] || list_transform(lst,
               x -> (CAST(x.n_docs AS DOUBLE) / n_total) * x.gap),
               (a, b) -> a + b) AS ece,
           mce
    FROM l
    """


@query("calibration_ece", oracle=_ece_oracle())
def calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error over the registered reliability bins:
    ECE = Σ_b (n_b/N)·|accuracy_b − confidence_b| plus the max-bin MCE —
    the one-number calibration summary every model eval reports next to
    accuracy (a model can rank perfectly yet be badly calibrated; AUC
    will not see it, ECE will). Composes score_calibration_bins on both
    sides, so the summary cannot drift from the table it compresses.

    Determinism: the per-bin gaps come from the registered query's
    already-engine-identical columns; the weighted sum folds in SORTED
    bin order over the ≤10-bin list (entropy_fold discipline); max() is
    order-free.

    Plan: the registered calibration pipeline plus one ≤10-row fold."""
    from ..registry import QUERIES

    bins = QUERIES["score_calibration_bins"](spark, sf_dir).select(
        "bin",
        "n_docs",
        F.abs(F.col("frac_kept") - F.col("mean_score")).alias("gap"),
    )
    l = bins.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("n_docs").cast("long").alias("n_total"),
        F.sort_array(F.collect_list(F.struct("bin", "n_docs", "gap"))).alias(
            "lst"
        ),
        F.max("gap").alias("mce"),
    )
    fold = (
        "aggregate(transform(lst, "
        "x -> (CAST(x.n_docs AS DOUBLE) / n_total) * x.gap), "
        "CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
    )
    return l.select(
        "n_bins", "n_total", F.expr(fold).alias("ece"), "mce"
    )


# ---------------------------------------------------------------------------
# pass@k — the unbiased combinatorial estimator behind code-eval suites.
# ---------------------------------------------------------------------------
PASS_AT_KS = (1, 5, 10)


def _pass_at_k_expr(k: int) -> str:
    """The unbiased pass@k estimator 1 - C(n-c, k)/C(n, k) written as an
    explicit left-associated factor chain (identical IEEE op sequence on
    both engines): C(n-c,k)/C(n,k) = prod_{i<k} (n-c-i)/(n-i). Guards:
    c = 0 -> 0; n-c < k -> 1 (k draws must hit a success)."""
    prod = " * ".join(
        f"(CAST(n - c - {i} AS DOUBLE) / CAST(n - {i} AS DOUBLE))"
        for i in range(k)
    )
    return (
        f"(CASE WHEN c = 0 THEN CAST(0.0 AS DOUBLE)"
        f" WHEN n - c < {k} THEN CAST(1.0 AS DOUBLE)"
        f" ELSE CAST(1.0 AS DOUBLE) - {prod} END)"
    )


def _pass_at_k_oracle() -> str:
    per_k = "\n    UNION ALL\n".join(
        f"""    SELECT {k} AS k,
           CAST(count(*) AS BIGINT) AS n_tasks,
           list_reduce(
               [0.0] || list_transform(
                   list_sort(list(struct_pack(u := user_id,
                       p := {_pass_at_k_expr(k)}))),
                   s -> s.p),
               (a, b) -> a + b)
               / CAST(count(*) AS DOUBLE) AS mean_pass_at_k
    FROM tasks WHERE n >= {k}"""
        for k in PASS_AT_KS
    )
    return f"""
    WITH tasks AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c
        FROM events GROUP BY user_id
    )
{per_k}
    """


@query("eval_pass_at_k", oracle=_pass_at_k_oracle())
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k over a (task, samples, successes) panel — the standard
    eval-harness estimator (HumanEval / MBPP style): for each task with
    n samples and c successes, the probability that at least one of k
    uniformly drawn samples succeeds is 1 - C(n-c,k)/C(n,k), the
    UNBIASED estimator that replaced the naive (c/n)^k-style plug-ins.
    Tasks = users, samples = their events, success = a purchase — the
    fixture's stand-in for per-task completion batches; tasks with
    n < k are excluded per the standard definition.

    Exactness: n and c are exact integers; the estimator is an explicit
    left-associated factor chain of k <= 10 exact-integer ratios (the
    same literal expression text on both engines -> identical IEEE
    sequence), with the c = 0 / n-c < k branches pinned to exact 0/1.
    The task mean folds in sorted user_id order from a 0.0 seed.

    Plan: ONE user-keyed aggregation over the fact table; each k row is
    a conditional rollup of the same task panel (task-cardinality, not
    event-cardinality). The sorted fold collects per-task terms into one
    row per k — at larger task counts swap for the pairwise-safe tree
    aggregation documented in chisq_independence."""
    events = load_table(spark, sf_dir, "events")
    tasks = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("long")
        .alias("c"),
    )
    out = None
    for k in PASS_AT_KS:
        per = (
            tasks.filter(F.col("n") >= k)
            .select(
                "user_id", F.expr(_pass_at_k_expr(k)).alias("p")
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_tasks"),
                F.sort_array(
                    F.collect_list(F.struct("user_id", "p"))
                ).alias("__lst"),
            )
            .select(
                F.lit(k).alias("k"),
                "n_tasks",
                (
                    F.expr(
                        "aggregate(transform(__lst, x -> x.p),"
                        " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
                    )
                    / F.col("n_tasks").cast("double")
                ).alias("mean_pass_at_k"),
            )
        )
        out = per if out is None else out.unionAll(per)
    return out
