"""Similarity search over the ``embeddings`` table (array<float> column).

Three operators, all pure Catalyst expressions (higher-order array
functions — no UDFs, no MLlib dependency, oracle-checkable in DuckDB):

* brute-force cosine top-k — broadcast the query set against every vector;
  the correctness baseline and, at 100 TB, still the right tool for small
  query batches (one scan, no index build).
* LSH-bucketed top-k — sign-random-projection buckets: vectors and queries
  hash to a bucket; candidates meet in a bucket join instead of a cross
  product. The scale path: candidate count drops from N to N/2^planes.
* embedding-cosine near-dup pairs — the dedup variant: same-bucket pairs
  with cosine above a threshold.

Determinism/parity notes:
* all dot products cast float32 → double BEFORE multiplying, and both
  engines sum in list order — bit-identical accumulation;
* ranking uses the cosine ROUNDED to 4 dp with vec_id tiebreak so the
  top-k frontier cannot differ across engines on float noise;
* the "random" hyperplanes are a deterministic LCG of (plane, dim), so the
  SQL oracle regenerates exactly the same planes from the same constants.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..memo import shared
from ..registry import query
from ..sources.parquet import load_table

DIM = 64
TOPK = 10
N_QUERIES = 5  # query set = vec_id < 5
LSH_PLANES = 8
NEAR_DUP_COS = 0.4  # fixture embeddings are random; max pairwise cos ≈ 0.51

# LCG constants for the deterministic hyperplane family.
_LCG_A = 1_103_515_245
_LCG_C = 12_345
_LCG_M = 2_048
_LCG_SHIFT = 1_024


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in doubles, accumulated in list order (engine-portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# Fixed-point discipline for unbounded-group float statistics: quantize to
# integer 2^-20ths, then accumulate with a PLAIN integer sum — order-free,
# partial-aggregatable map-side, engine-exact (no per-group list state).
# round() is half-away-from-zero on both engines for doubles, so the codes
# match bitwise; the bound guard makes the int64-headroom assumption a
# runtime error instead of a silent wrap (Spark's non-ANSI long sum would
# otherwise diverge from DuckDB's HUGEINT promotion without any signal).
_FXP_SHIFT = 20
_FXP_SCALE = float(1 << _FXP_SHIFT)          # 1048576.0
_FXP_SCALE_SQ = float(1 << (2 * _FXP_SHIFT))  # 1099511627776.0
_FXP_BOUND = 2.0  # |value| <= 2 => |q| <= 2^21; fixture max |x| ~ 0.58


def _fxp_q(c: Column, what: str) -> Column:
    """Guarded quantization |c| <= 2 → round(c * 2^20) as int64."""
    return (
        F.when(F.abs(c) <= F.lit(_FXP_BOUND), F.round(c * _FXP_SCALE))
        .otherwise(
            F.raise_error(
                F.lit(
                    f"{what}: |value| exceeds fixed-point bound "
                    f"{_FXP_BOUND} — widen the accumulator to DECIMAL(38,0)"
                )
            )
        )
        .cast("long")
    )


def _with_norm(df: DataFrame) -> DataFrame:
    return df.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )


def _sql_norm(emb: str) -> str:
    return f"sqrt(list_sum(list_transform({emb}, __x -> CAST(__x AS DOUBLE) * __x)))"


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {DIM}), "
        f"__i -> CAST({a}[__i] AS DOUBLE) * {b}[__i]))"
    )


def _plane_coef(j: int, i: Column) -> Column:
    """Deterministic pseudo-random coefficient for hyperplane j, dim i
    (i 0-based): LCG over the flattened (plane, dim) index."""
    k = (F.lit(j * DIM) + i).cast("long")
    return (F.lit(_LCG_A).cast("long") * k + F.lit(_LCG_C)) % _LCG_M - _LCG_SHIFT


def _plane_term(j: int):
    # Closure factory, not a default-arg lambda: PySpark binds lambda arity
    # by signature, so `lambda x, i, j=j` reads as a 3-arg HOF lambda.
    def fn(x: Column, i: Column) -> Column:
        return x.cast("double") * _plane_coef(j, i)

    return fn


def _bucket_expr(emb: Column) -> Column:
    """Sign-random-projection bucket: 8 hyperplane sign bits packed to an int.

    transform's 2-arg lambda supplies the 0-based element index, so the
    projection Σ embᵢ·coef(j,i) is a single array pass per plane."""
    bits = []
    for j in range(LSH_PLANES):
        proj = F.aggregate(
            F.transform(emb, _plane_term(j)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    return reduce(lambda a, b: a + b, bits).cast("long")


def _sql_bucket(emb: str) -> str:
    terms = []
    for j in range(LSH_PLANES):
        coef = (
            f"((CAST({_LCG_A} AS BIGINT) * ({j * DIM} + __i - 1) + {_LCG_C})"
            f" % {_LCG_M} - {_LCG_SHIFT})"
        )
        proj = (
            f"list_sum(list_transform(generate_series(1, {DIM}), "
            f"__i -> CAST({emb}[__i] AS DOUBLE) * {coef}))"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_SQL_BASE_CTE = f"""
    WITH base AS (
        SELECT vec_id, embedding, {_sql_norm('embedding')} AS nrm
        FROM embeddings
    ), q AS (
        SELECT * FROM base WHERE vec_id < {N_QUERIES}
    )
"""


@query(
    "sim_cosine_topk_bruteforce",
    oracle=_SQL_BASE_CTE
    + f"""
    SELECT query_id, vec_id, cosine FROM (
        SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
               round({_sql_dot('q.embedding', 'b.embedding')} / (q.nrm * b.nrm), 4) AS cosine,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round({_sql_dot('q.embedding', 'b.embedding')} / (q.nrm * b.nrm), 4) DESC,
                            b.vec_id) AS rn
        FROM q CROSS JOIN base b
    ) WHERE rn <= {TOPK}
    """,
)
def sim_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the (tiny) query set against every
    vector — one scan of the corpus, a per-query top-k window, no index.
    At 100 TB: queries broadcast, corpus partitions stream; the window
    partitions by query_id (small) so the final top-k merge is cheap.

    Memoized per (session, sf_dir) since round 8: this is the truth
    ranking SIX recall/agreement queries compose (several read it twice
    within one plan), and each uncached read replays the O(N·Q) dot-
    product sweep — the result is TOPK·Q rows, trivial to pin (guide §5).
    Rebuilt inside the timed region after every cache eviction."""
    return shared(
        spark, sf_dir, "topk_bruteforce",
        lambda: _topk_bruteforce_build(spark, sf_dir),
    )


def _topk_bruteforce_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = F.round(
        _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm")), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        base.crossJoin(F.broadcast(q))
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .select("query_id", "vec_id", "cosine")
    )


@query(
    "sim_cosine_topk_lsh",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, embedding, {_sql_norm('embedding')} AS nrm,
               {_sql_bucket('embedding')} AS bucket
        FROM embeddings
    ), q AS (
        SELECT * FROM base WHERE vec_id < {N_QUERIES}
    )
    SELECT query_id, vec_id, cosine FROM (
        SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
               round({_sql_dot('q.embedding', 'b.embedding')} / (q.nrm * b.nrm), 4) AS cosine,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round({_sql_dot('q.embedding', 'b.embedding')} / (q.nrm * b.nrm), 4) DESC,
                            b.vec_id) AS rn
        FROM q JOIN base b ON q.bucket = b.bucket
    ) WHERE rn <= {TOPK}
    """,
)
def sim_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via sign-random-projection LSH: vectors meet their
    queries only inside a shared bucket (equi-join on the packed sign bits),
    cutting candidates ~2^planes-fold. The 100 TB path: the bucket join is a
    plain shuffle/broadcast equi-join — no cross product anywhere.

    Memoized per (session, sf_dir) since round 8 (the bruteforce
    rationale: TOPK·Q rows, composed by the RBO/agreement queries which
    read it twice per plan)."""
    return shared(
        spark, sf_dir, "topk_lsh", lambda: _topk_lsh_build(spark, sf_dir)
    )


def _topk_lsh_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        _bucket_expr(F.col("embedding")).alias("bucket"),
    ).persist()
    base.count()  # materialize: both join sides read this cache
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        "bucket",
    )
    cos = F.round(
        _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm")), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        base.join(F.broadcast(q), "bucket")
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .select("query_id", "vec_id", "cosine")
    )


N_CELLS = 16  # IVF cells (centroids)
NPROBE = 4  # cells each query probes


@query(
    "sim_cosine_topk_ivf",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, embedding, {_sql_norm('embedding')} AS nrm
        FROM embeddings
    ), cent AS (
        SELECT vec_id AS cell_id, embedding AS c_emb, nrm AS c_nrm
        FROM base
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CELLS}
    ), assign AS (
        SELECT vec_id, embedding, nrm, cell_id FROM (
            SELECT b.vec_id, b.embedding, b.nrm, c.cell_id,
                   row_number() OVER (
                       PARTITION BY b.vec_id
                       ORDER BY round({_sql_dot('b.embedding', 'c.c_emb')} / (b.nrm * c.c_nrm), 4) DESC,
                                c.cell_id) AS crn
            FROM base b CROSS JOIN cent c
        ) WHERE crn = 1
    ), probes AS (
        SELECT query_id, q_emb, q_nrm, cell_id FROM (
            SELECT q.vec_id AS query_id, q.embedding AS q_emb, q.nrm AS q_nrm,
                   c.cell_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round({_sql_dot('q.embedding', 'c.c_emb')} / (q.nrm * c.c_nrm), 4) DESC,
                                c.cell_id) AS prn
            FROM (SELECT * FROM base WHERE vec_id < {N_QUERIES}) q
            CROSS JOIN cent c
        ) WHERE prn <= {NPROBE}
    )
    SELECT query_id, vec_id, cosine FROM (
        SELECT p.query_id, a.vec_id,
               round({_sql_dot('p.q_emb', 'a.embedding')} / (p.q_nrm * a.nrm), 4) AS cosine,
               row_number() OVER (
                   PARTITION BY p.query_id
                   ORDER BY round({_sql_dot('p.q_emb', 'a.embedding')} / (p.q_nrm * a.nrm), 4) DESC,
                            a.vec_id) AS rn
        FROM probes p JOIN assign a ON p.cell_id = a.cell_id
    ) WHERE rn <= {TOPK}
    """,
)
def sim_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k: partition the corpus into Voronoi cells around a small
    centroid set; queries probe only their NPROBE nearest cells.

    The build pass (assign every vector to its argmax-cosine centroid) is
    the classic IVF index cost: N×C dot products, map-side against a
    broadcast centroid table, one shuffle for the per-vector argmax. The
    search pass is an equi-join on cell_id — candidates per query drop from
    N to ~N·NPROBE/C. Centroids here are a deterministic slice of the data
    (vec_id ∈ [N_QUERIES, N_QUERIES+N_CELLS)) so the SQL oracle regenerates
    the identical index; a production run would plug k-means centroids into
    the same plan.

    Memoized per (session, sf_dir) since round 8 (the bruteforce
    rationale: TOPK·Q rows, composed by recall/nprobe/RBO queries)."""
    return shared(
        spark, sf_dir, "topk_ivf", lambda: _topk_ivf_build(spark, sf_dir)
    )


def _topk_ivf_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _with_norm(load_table(spark, sf_dir, "embeddings")).persist()
    base.count()  # materialize: read by assignment, probes, and centroids
    cent = base.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + N_CELLS)
    ).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    c_cos = F.round(
        _dot(F.col("embedding"), F.col("c_emb")) / (F.col("nrm") * F.col("c_nrm")), 4
    )
    aw = Window.partitionBy("vec_id").orderBy(F.desc("_ccos"), F.asc("cell_id"))
    assign = (
        base.crossJoin(F.broadcast(cent))
        .withColumn("_ccos", c_cos)
        .withColumn("_crn", F.row_number().over(aw))
        .filter(F.col("_crn") == 1)
        .select("vec_id", "embedding", "nrm", "cell_id")
    )
    q_cos = F.round(
        _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm")), 4
    )
    pw = Window.partitionBy("query_id").orderBy(F.desc("_qcos"), F.asc("cell_id"))
    probes = (
        base.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
        .crossJoin(F.broadcast(cent))
        .withColumn("_qcos", q_cos)
        .withColumn("_prn", F.row_number().over(pw))
        .filter(F.col("_prn") <= NPROBE)
        .select("query_id", "q_emb", "q_nrm", "cell_id")
    )
    cos = F.round(
        _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm")), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        assign.join(F.broadcast(probes), "cell_id")
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .select("query_id", "vec_id", "cosine")
    )


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, embedding, {_sql_norm('embedding')} AS nrm,
               {_sql_bucket('embedding')} AS bucket
        FROM embeddings
    )
    SELECT a_id, b_id, cosine FROM (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               round({_sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 4) AS cosine
        FROM base a JOIN base b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ) WHERE cosine >= {NEAR_DUP_COS}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: same-LSH-bucket candidates with
    cosine ≥ threshold. (Fixture embeddings are random — max pairwise
    cosine ≈ 0.51 — so the demo threshold is 0.4; real near-dup corpora
    use ≥ 0.95 and more planes.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        _bucket_expr(F.col("embedding")).alias("bucket"),
    ).persist()
    base.count()  # materialize: both join sides read this cache
    a = base.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
        "bucket",
    )
    b = base.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
        "bucket",
    )
    cos = F.round(
        _dot(F.col("a_emb"), F.col("b_emb")) / (F.col("a_nrm") * F.col("b_nrm")), 4
    )
    return (
        a.join(b, ["bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_COS)
    )


# ---------------------------------------------------------------------------
# ANN quality evaluation: recall@k of the approximate indexes against the
# brute-force exact top-k — the "measure, don't guess" step before trusting
# an index at scale. Composes the already-registered pipelines (engine AND
# oracle sides), so the metric can never drift from the operators it
# measures.
# ---------------------------------------------------------------------------
def _recall_query(approx_name: str, exact_source=None):
    """recall@k of ``approx_name`` against an exact top-k. ``exact_source``
    is a (spark, sf_dir) -> DataFrame of (query_id, vec_id) rows; defaults
    to the registered cosine brute force."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..registry import QUERIES

        exact = (
            exact_source(spark, sf_dir)
            if exact_source is not None
            else QUERIES["sim_cosine_topk_bruteforce"](spark, sf_dir)
        )
        approx = (
            QUERIES[approx_name](spark, sf_dir)
            .select("query_id", "vec_id")
            .withColumn("hit", F.lit(1))
        )
        return (
            exact.join(approx, ["query_id", "vec_id"], "left")
            .groupBy("query_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("k"),
                F.round(
                    F.sum(F.coalesce("hit", F.lit(0))) / F.count(F.lit(1)), 6
                ).alias("recall_at_k"),
            )
        )

    return fn


def _recall_oracle(approx_name: str, exact_sql: str | None = None) -> str:
    from ..registry import ORACLES

    exact = exact_sql or ORACLES["sim_cosine_topk_bruteforce"]
    return f"""
    WITH exact_topk AS ({exact}),
    approx_topk AS MATERIALIZED ({ORACLES[approx_name]})
    SELECT e.query_id,
           CAST(count(*) AS BIGINT) AS k,
           round(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS recall_at_k
    FROM exact_topk e
    LEFT JOIN approx_topk a
      ON a.query_id = e.query_id AND a.vec_id = e.vec_id
    GROUP BY e.query_id
    """


for _approx in ("sim_cosine_topk_ivf", "sim_cosine_topk_lsh"):
    _metric = f"sim_recall_{_approx.rsplit('_', 1)[-1]}"
    query(_metric, oracle=_recall_oracle(_approx))(_recall_query(_approx))


@query(
    "emb_norm_stats",
    oracle=f"""
    WITH n AS (
        SELECT label, {_sql_norm('embedding')} AS nrm FROM embeddings
    )
    SELECT label,
           count(*) AS n_vecs,
           CAST(round(sum(CAST(nrm AS DECIMAL(18,9))), 6) AS DOUBLE)
               AS total_norm,
           round(min(nrm), 6) AS min_norm,
           round(max(nrm), 6) AS max_norm
    FROM n GROUP BY label
    """,
)
def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column hygiene report: per-label vector counts and L2-norm
    envelope — the check that catches unnormalized or degenerate vectors
    before they poison a cosine index.

    Per-row norms fold the array in list order (identical doubles on both
    engines); the cross-row total accumulates in DECIMAL so partition
    order cannot move the rounded sum. min/max are order-free. One
    partial-aggregated shuffle on label."""
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    return (
        emb.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.sum(F.col("nrm").cast("decimal(18,9)")), 6)
            .cast("double")
            .alias("total_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
    )


# --------------------------------------------------------------------------
# Product quantization: the 100 TB vector-compression workhorse.
# --------------------------------------------------------------------------
PQ_M = 4        # subspaces (64 dims -> 4 x 16)
PQ_K = 8        # codewords per subspace
PQ_DSUB = 16


def _pq_dist_terms(vec: str, code: str, m: int, elem: str) -> str:
    """Squared-L2 distance over subspace m as an explicit left-assoc sum —
    the SAME generated text drives both engines, so the doubles are
    bit-identical and the argmin cannot drift."""
    terms = []
    for i in range(m * PQ_DSUB + 1, m * PQ_DSUB + PQ_DSUB + 1):
        a = f"CAST({elem.format(col=vec, i=i)} AS DOUBLE)"
        b = f"CAST({elem.format(col=code, i=i)} AS DOUBLE)"
        terms.append(f"(({a}) - ({b})) * (({a}) - ({b}))")
    return " + ".join(terms)


def _pq_codebook(base: DataFrame) -> DataFrame:
    """Deterministic 8-row codebook (shared by encode, ADC, histogram)."""
    return base.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + PQ_K)
    ).select(
        (F.col("vec_id") - N_QUERIES).alias("code_id"),
        F.col("embedding").alias("c_emb"),
    )


def _pq_argmin_aggs() -> list:
    """Per-subspace argmin aggregates (struct min, code_id tie-break) —
    the single Spark-side definition of the encode step."""
    return [
        F.min(
            F.struct(
                F.expr(
                    _pq_dist_terms(
                        "embedding", "c_emb", m, "element_at({col}, {i})"
                    )
                ).alias("d"),
                F.col("code_id").alias("c"),
            )
        )["c"].alias(f"c{m}")
        for m in range(PQ_M)
    ]


def _pq_assign_sql(corpus_only: bool) -> str:
    """Shared CTE text: codebook + per-vector subspace codes — the single
    SQL definition of the encode step (``corpus_only`` excludes the query
    vectors, as the ADC search does)."""
    dists = [
        _pq_dist_terms("e.embedding", "cb.c_emb", m, "{col}[{i}]")
        for m in range(PQ_M)
    ]
    argmins = ", ".join(
        f"(min(struct_pack(d := {d}, c := cb.code_id))).c AS c{m}"
        for m, d in enumerate(dists)
    )
    where = f"WHERE e.vec_id >= {N_QUERIES}" if corpus_only else ""
    return f"""
    cb AS (
        SELECT vec_id - {N_QUERIES} AS code_id, embedding AS c_emb
        FROM embeddings
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + PQ_K}
    ), assigned AS (
        SELECT e.vec_id, {argmins}
        FROM embeddings e CROSS JOIN cb
        {where}
        GROUP BY e.vec_id
    )"""


def _pq_oracle() -> str:
    code_expr = " + ".join(
        f"c{m} * {PQ_K ** (PQ_M - 1 - m)}" for m in range(PQ_M)
    )
    return f"""
    WITH {_pq_assign_sql(corpus_only=False)}
    SELECT CAST({code_expr} AS BIGINT) AS pq_code,
           count(*) AS n_vectors,
           CAST(min(vec_id) AS BIGINT) AS min_vec_id
    FROM assigned
    GROUP BY 1
    """


@query("pq_code_histogram", oracle=_pq_oracle())
def pq_code_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: each vector's 64 dims split into 4
    subspaces, each assigned to its nearest of 8 codewords — compressing a
    256-byte embedding to a 12-bit code. THE technique behind
    billion-vector ANN (a PQ index stores codes, not vectors; asymmetric
    distance then needs only code lookups). Codewords are a deterministic
    slice of the data so the oracle regenerates the identical codebook; a
    production run plugs k-means codebooks into the same plan. Plan: one
    broadcast cross join against the 8-row codebook, per-vector argmin via
    struct min (one shuffle), then the tiny code histogram."""
    base = load_table(spark, sf_dir, "embeddings")
    pairs = base.crossJoin(F.broadcast(_pq_codebook(base)))
    assigned = pairs.groupBy("vec_id").agg(*_pq_argmin_aggs())
    code = sum(
        F.col(f"c{m}") * (PQ_K ** (PQ_M - 1 - m)) for m in range(PQ_M)
    )
    return (
        assigned.select("vec_id", code.cast("long").alias("pq_code"))
        .groupBy("pq_code")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").cast("long").alias("min_vec_id"),
        )
    )


def _pq_adc_oracle() -> str:
    qdists = [
        _pq_dist_terms("q.embedding", "cb.c_emb", m, "{col}[{i}]")
        for m in range(PQ_M)
    ]
    dtab_rows = " UNION ALL ".join(
        f"SELECT q.vec_id AS query_id, {m} AS m, cb.code_id, {d} AS d"
        f" FROM embeddings q CROSS JOIN cb WHERE q.vec_id < {N_QUERIES}"
        for m, d in enumerate(qdists)
    )
    return f"""
    WITH {_pq_assign_sql(corpus_only=True)}, dtab AS ({dtab_rows}),
    codes AS ({" UNION ALL ".join(f"SELECT vec_id, {m} AS m, c{m} AS c FROM assigned" for m in range(PQ_M))}),
    paired AS (
        SELECT d.query_id, c.vec_id,
               list_sort(list(struct_pack(m := c.m, d := d.d))) AS ds
        FROM codes c JOIN dtab d ON c.m = d.m AND c.c = d.code_id
        GROUP BY d.query_id, c.vec_id
    )
    SELECT query_id, vec_id,
           list_reduce([0.0] || list_transform(ds, __x -> __x.d),
                       (a, b) -> a + b) AS adc_dist
    FROM paired
    QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY list_reduce([0.0] || list_transform(ds, __x -> __x.d),
                             (a, b) -> a + b) ASC, vec_id ASC
    ) <= {TOPK}
    """


@query("sim_l2_topk_pq", oracle=_pq_adc_oracle())
def sim_l2_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ search via Asymmetric Distance Computation: the query stays
    exact, the corpus is its 12-bit codes, and each query-vector distance
    is the SUM OF 4 TABLE LOOKUPS (query-to-codeword distances computed
    once per query). At 100 TB this is why PQ wins — the scan touches
    4-byte codes, not 256-byte vectors, and the distance table (queries x
    32 entries) broadcasts everywhere. The 4-term float sum folds in
    subspace order (sorted struct fold, 0.0 seed) so both engines
    accumulate bit-identically."""
    base = load_table(spark, sf_dir, "embeddings")
    cb = _pq_codebook(base)
    corpus = base.filter(F.col("vec_id") >= N_QUERIES)
    assigned = (
        corpus.crossJoin(F.broadcast(cb))
        .groupBy("vec_id")
        .agg(*_pq_argmin_aggs())
    )
    # stack(), not union-of-M-projections: one pass over `assigned` /
    # one query×codebook cross join computing all M columns — a 4-branch
    # union recomputes (or at best ReusedExchange-rescans) its subtree
    # per branch, and the argmin aggregation is the expensive part.
    codes = assigned.selectExpr(
        "vec_id",
        "stack({n}, {pairs}) AS (m, c)".format(
            n=PQ_M, pairs=", ".join(f"{m}, c{m}" for m in range(PQ_M))
        ),
    )
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    dists = [
        _pq_dist_terms("q_emb", "c_emb", m, "element_at({col}, {i})")
        for m in range(PQ_M)
    ]
    dtab = queries.crossJoin(F.broadcast(cb)).selectExpr(
        "query_id",
        "code_id",
        "stack({n}, {pairs}) AS (m, d)".format(
            n=PQ_M,
            pairs=", ".join(f"{m}, CAST(({d}) AS DOUBLE)" for m, d in enumerate(dists)),
        ),
    )
    paired = (
        codes.join(
            F.broadcast(dtab),
            (codes["m"] == dtab["m"]) & (codes["c"] == dtab["code_id"]),
        )
        .select("query_id", "vec_id", codes["m"].alias("mm"), "d")
        .groupBy("query_id", "vec_id")
        .agg(
            F.sort_array(F.collect_list(F.struct(F.col("mm"), F.col("d")))).alias(
                "ds"
            )
        )
        .select(
            "query_id",
            "vec_id",
            F.expr(
                "aggregate(transform(ds, __x -> __x.d),"
                " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
            ).alias("adc_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        paired.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .select("query_id", "vec_id", "adc_dist")
    )


def _l2_full_dist(vec: str, code: str, elem: str) -> str:
    """Full 64-dim squared-L2 as the fixed-order sum of the 4 subspace
    sums — the same generated terms the PQ operators use."""
    subs = [_pq_dist_terms(vec, code, m, elem) for m in range(PQ_M)]
    return " + ".join(f"({d})" for d in subs)


def _exact_l2_sql() -> str:
    d = _l2_full_dist("c.embedding", "q.embedding", "{col}[{i}]")
    return f"""
        SELECT query_id, vec_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id ORDER BY {d} ASC, c.vec_id ASC
                   ) AS rn
            FROM embeddings q, embeddings c
            WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
        ) WHERE rn <= {TOPK}
    """


def _exact_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact L2 top-k over the ADC corpus — the PQ recall baseline,
    from the same twin-generated distance terms."""
    base = load_table(spark, sf_dir, "embeddings")
    corpus = base.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id"), F.col("embedding")
    )
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    d = F.expr(_l2_full_dist("embedding", "q_emb", "element_at({col}, {i})"))
    w = Window.partitionBy("query_id").orderBy(d.asc(), F.col("vec_id").asc())
    return (
        corpus.crossJoin(F.broadcast(queries))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .select("query_id", "vec_id")
    )


# Recall@k of the PQ/ADC index against EXACT L2 over the same corpus (L2
# baseline, not cosine — PQ quantizes L2 cells). Reuses the generic recall
# harness with the exact side swapped in. Expected to be LOW on this
# fixture (~0.0-0.1): uniform-random vectors have no cluster structure and
# the codebook is a data slice, not k-means — the number documents the
# fixture, and rises with trained codebooks / more codewords.
query("sim_recall_pq", oracle=_recall_oracle("sim_l2_topk_pq", _exact_l2_sql()))(
    _recall_query("sim_l2_topk_pq", _exact_l2_topk)
)


# --------------------------------------------------------------------------
# IVF + PQ composite: cell pruning, then ADC over codes — the billion-vector
# index shape (coarse quantizer prunes the scan; product codes replace the
# vectors; only the distance table ever touches raw floats).
# --------------------------------------------------------------------------
IVFPQ_CELL_LO = N_QUERIES + PQ_K  # centroid slice starts past the codebook


def _ivfpq_adc_oracle() -> str:
    d_cell = _l2_full_dist("e.embedding", "cent.cent_emb", "{col}[{i}]")
    d_probe = _l2_full_dist("q.embedding", "cent.cent_emb", "{col}[{i}]")
    qdists = [
        _pq_dist_terms("q.embedding", "cb.c_emb", m, "{col}[{i}]")
        for m in range(PQ_M)
    ]
    dtab_rows = " UNION ALL ".join(
        f"SELECT q.vec_id AS query_id, {m} AS m, cb.code_id, {d} AS d"
        f" FROM embeddings q CROSS JOIN cb WHERE q.vec_id < {N_QUERIES}"
        for m, d in enumerate(qdists)
    )
    codes_rows = " UNION ALL ".join(
        f"SELECT vec_id, {m} AS m, c{m} AS c FROM assigned" for m in range(PQ_M)
    )
    fold = (
        "list_reduce([0.0] || list_transform(ds, __x -> __x.d), (a, b) -> a + b)"
    )
    return f"""
    WITH {_pq_assign_sql(corpus_only=True)},
    cent AS (
        SELECT vec_id - {IVFPQ_CELL_LO} AS cell_id, embedding AS cent_emb
        FROM embeddings
        WHERE vec_id >= {IVFPQ_CELL_LO} AND vec_id < {IVFPQ_CELL_LO + N_CELLS}
    ), cells AS (
        SELECT e.vec_id,
               (min(struct_pack(d := {d_cell}, c := cent.cell_id))).c AS cell_id
        FROM embeddings e CROSS JOIN cent
        WHERE e.vec_id >= {N_QUERIES}
        GROUP BY e.vec_id
    ), probes AS (
        SELECT query_id, cell_id FROM (
            SELECT q.vec_id AS query_id, cent.cell_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {d_probe} ASC, cent.cell_id ASC
                   ) AS rn
            FROM embeddings q CROSS JOIN cent
            WHERE q.vec_id < {N_QUERIES}
        ) WHERE rn <= {NPROBE}
    ), dtab AS ({dtab_rows}), codes AS ({codes_rows}),
    cand AS (
        SELECT p.query_id, s.vec_id FROM probes p JOIN cells s USING (cell_id)
    ), paired AS (
        SELECT x.query_id, x.vec_id,
               list_sort(list(struct_pack(m := c.m, d := d.d))) AS ds
        FROM cand x
        JOIN codes c ON c.vec_id = x.vec_id
        JOIN dtab d ON d.query_id = x.query_id AND d.m = c.m AND d.code_id = c.c
        GROUP BY x.query_id, x.vec_id
    )
    SELECT query_id, vec_id, {fold} AS adc_dist
    FROM paired
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY {fold} ASC, vec_id ASC
    ) <= {TOPK}
    """


@query("sim_l2_topk_ivfpq", oracle=_ivfpq_adc_oracle())
def sim_l2_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ search (the FAISS ``IVFPQ`` shape, re-expressed in
    Catalyst): a coarse quantizer assigns every corpus vector to its
    nearest of 16 cells; each query probes only its NPROBE nearest cells;
    WITHIN the probed cells ranking runs on PQ codes via asymmetric
    distance (4 broadcast table lookups per candidate) — raw vectors are
    touched only to build the index and the per-query distance table.

    100 TB posture: this composes the two prunings that make
    billion-vector ANN work — the cell equi-join cuts candidates to
    ~NPROBE/N_CELLS of the corpus, and ADC makes each candidate cost a
    4-row lookup against a broadcast table instead of a 64-float dot
    product. Every tiny side (centroids, codebook, distance table,
    probes) is explicitly broadcast; the only corpus-sized shuffles are
    the two index-build argmin aggregations. Centroids and codebook are
    deterministic data slices so the DuckDB oracle regenerates the
    identical index; production plugs k-means into the same plan.
    Distance terms, struct-argmin, and the sorted ADC fold reuse the
    PQ/IVF twins above — both engines accumulate bit-identically."""
    base = load_table(spark, sf_dir, "embeddings")
    cb = _pq_codebook(base)
    cent = base.filter(
        (F.col("vec_id") >= IVFPQ_CELL_LO)
        & (F.col("vec_id") < IVFPQ_CELL_LO + N_CELLS)
    ).select(
        (F.col("vec_id") - IVFPQ_CELL_LO).alias("cell_id"),
        F.col("embedding").alias("cent_emb"),
    )
    corpus = base.filter(F.col("vec_id") >= N_QUERIES)

    d_cell = F.expr(
        _l2_full_dist("embedding", "cent_emb", "element_at({col}, {i})")
    )
    cells = (
        corpus.crossJoin(F.broadcast(cent))
        .groupBy("vec_id")
        .agg(
            F.min(F.struct(d_cell.alias("d"), F.col("cell_id").alias("c")))[
                "c"
            ].alias("cell_id")
        )
    )
    assigned = (
        corpus.crossJoin(F.broadcast(cb)).groupBy("vec_id").agg(*_pq_argmin_aggs())
    )
    # stack(), not union-of-M-projections (see sim_l2_topk_pq): one pass
    # over the argmin output / one query×codebook cross join.
    codes = assigned.selectExpr(
        "vec_id",
        "stack({n}, {pairs}) AS (m, c)".format(
            n=PQ_M, pairs=", ".join(f"{m}, c{m}" for m in range(PQ_M))
        ),
    )

    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    d_probe = F.expr(
        _l2_full_dist("q_emb", "cent_emb", "element_at({col}, {i})")
    )
    pw = Window.partitionBy("query_id").orderBy(
        d_probe.asc(), F.col("cell_id").asc()
    )
    probes = (
        queries.crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= NPROBE)
        .select("query_id", "cell_id")
    )
    dists = [
        _pq_dist_terms("q_emb", "c_emb", m, "element_at({col}, {i})")
        for m in range(PQ_M)
    ]
    dtab = queries.crossJoin(F.broadcast(cb)).selectExpr(
        "query_id AS d_query_id",
        "code_id",
        "stack({n}, {pairs}) AS (d_m, d)".format(
            n=PQ_M,
            pairs=", ".join(f"{m}, CAST(({d}) AS DOUBLE)" for m, d in enumerate(dists)),
        ),
    )

    cand = cells.join(F.broadcast(probes), "cell_id").select("query_id", "vec_id")
    paired = (
        cand.join(codes, "vec_id")
        .join(
            F.broadcast(dtab),
            (F.col("query_id") == F.col("d_query_id"))
            & (F.col("m") == F.col("d_m"))
            & (F.col("c") == F.col("code_id")),
        )
        .select("query_id", "vec_id", F.col("m").alias("mm"), "d")
        .groupBy("query_id", "vec_id")
        .agg(
            F.sort_array(F.collect_list(F.struct(F.col("mm"), F.col("d")))).alias(
                "ds"
            )
        )
        .select(
            "query_id",
            "vec_id",
            F.expr(
                "aggregate(transform(ds, __x -> __x.d),"
                " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
            ).alias("adc_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        paired.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .select("query_id", "vec_id", "adc_dist")
    )


# Recall@k of IVFPQ against exact L2 — prune + quantize both cost recall,
# so this is the honest end-to-end number (lower than sim_recall_pq by the
# cell-miss rate; rises with NPROBE and trained centroids).
query(
    "sim_recall_ivfpq", oracle=_recall_oracle("sim_l2_topk_ivfpq", _exact_l2_sql())
)(_recall_query("sim_l2_topk_ivfpq", _exact_l2_topk))


# --------------------------------------------------------------------------
# k-NN classification: majority label among the cosine top-k neighbors —
# the eval/labeling step a vector index ultimately serves (label transfer,
# weak supervision, retrieval-based classification).
# --------------------------------------------------------------------------
def _knn_oracle() -> str:
    from ..registry import ORACLES

    topk = ORACLES["sim_cosine_topk_bruteforce"]
    return f"""
    WITH topk AS ({topk}),
    votes AS (
        SELECT t.query_id, e.label, count(*) AS n_votes
        FROM topk t
        JOIN embeddings e ON e.vec_id = t.vec_id
        WHERE t.vec_id >= {N_QUERIES}
        GROUP BY t.query_id, e.label
    )
    SELECT query_id,
           CAST((min(struct_pack(negv := -n_votes, lab := label))).lab AS INTEGER)
               AS predicted_label,
           CAST(max(n_votes) AS BIGINT) AS n_votes
    FROM votes
    GROUP BY query_id
    """


@query("knn_classify", oracle=_knn_oracle())
def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-based classification: each query takes the majority label
    of its cosine top-k corpus neighbors (self-matches excluded), ties
    broken by the smaller label — fully deterministic. Composes the
    REGISTERED brute-force top-k (engine and oracle sides both reuse it,
    so classifier and index can never drift apart).

    At 100 TB the neighbor search dominates and swaps freely for any
    registered ANN variant (LSH/IVF/PQ/IVFPQ) — the vote is a tiny
    per-query aggregation over k rows."""
    from ..registry import QUERIES

    topk = QUERIES["sim_cosine_topk_bruteforce"](spark, sf_dir).filter(
        F.col("vec_id") >= N_QUERIES
    )
    labels = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    # broadcast the TOP-K side (N_QUERIES x TOPK rows) — the label table is
    # corpus-sized at scale and must keep streaming through the probe
    votes = (
        labels.join(F.broadcast(topk), "vec_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    return votes.groupBy("query_id").agg(
        F.min(F.struct((-F.col("n_votes")).alias("negv"), F.col("label").alias("lab")))[
            "lab"
        ]
        .cast("int")
        .alias("predicted_label"),
        F.max("n_votes").cast("long").alias("n_votes"),
    )


# --------------------------------------------------------------------------
# Per-label centroids: the class prototype / IVF-centroid-init primitive.
# --------------------------------------------------------------------------
@query(
    "emb_centroids",
    oracle=f"""
    WITH x AS (
        SELECT label, vec_id,
               unnest(generate_series(1, {DIM})) AS dim,
               embedding
        FROM embeddings
    ), q AS (
        SELECT label, dim,
               CAST(round(CAST(embedding[dim] AS DOUBLE) * {_FXP_SCALE})
                    AS BIGINT) AS qv
        FROM x
    ), g AS (
        SELECT label, dim,
               count(*) AS n_vecs,
               CAST(sum(qv) AS BIGINT) AS sq
        FROM q GROUP BY label, dim
    )
    SELECT label,
           CAST(dim AS BIGINT) AS dim,
           CAST(n_vecs AS BIGINT) AS n_vecs,
           CAST(sq AS DOUBLE) / (n_vecs * {_FXP_SCALE}) AS centroid
    FROM g
    """,
)
def emb_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding, one row per (label, dimension) — the class
    prototype used for nearest-centroid classification and the natural
    initializer for IVF/k-means cells. The centroid is the mean of the
    2^-20 fixed-point quantized coordinates (quantization error <= 2^-21
    per coordinate, far below float32 input noise).

    Scale posture: coordinates quantize to integer 2^-20ths, so the
    per-group accumulator is a PLAIN integer sum — order-free,
    engine-exact, and partial-aggregatable map-side, with O(1) state per
    (label, dim) group regardless of corpus size (the previous
    vec_id-sorted collect_list fold buffered every vector of the group).
    Plan: posexplode stays in its partition; ONE shuffle on (label, dim).
    |q| <= 2^21 is guarded at runtime; int64 headroom then lasts to
    ~2^42 vectors per label — widen to DECIMAL(38,0) beyond that."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "val")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("dim"),
        F.col("val").cast("double").alias("x"),
    )
    g = x.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(_fxp_q(F.col("x"), "emb_centroids")).alias("sq"),
    )
    return g.select(
        "label",
        F.col("dim").cast("long").alias("dim"),
        F.col("n_vecs").cast("long").alias("n_vecs"),
        (
            F.col("sq").cast("double") / (F.col("n_vecs") * F.lit(_FXP_SCALE))
        ).alias("centroid"),
    )


# --------------------------------------------------------------------------
# Nearest-centroid classification + confusion matrix: the cheapest useful
# embedding classifier (Rocchio), and the eval table that says whether the
# label space is separable before anyone trains a probe.
# --------------------------------------------------------------------------
def _ncc_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH cent AS MATERIALIZED ({ORACLES['emb_centroids']}),
    x AS (
        SELECT vec_id, label AS true_label,
               unnest(generate_series(1, {DIM})) AS dim,
               embedding
        FROM embeddings
    ), d AS (
        SELECT x.vec_id, x.true_label, c.label AS cand_label,
               list_reduce(
                   [0.0] || list_transform(
                       list_sort(list(struct_pack(
                           dm := x.dim,
                           t := (CAST(x.embedding[x.dim] AS DOUBLE) - c.centroid)
                              * (CAST(x.embedding[x.dim] AS DOUBLE) - c.centroid)))),
                       __s -> __s.t),
                   (a, b) -> a + b) AS dist
        FROM x JOIN cent c USING (dim)
        GROUP BY x.vec_id, x.true_label, c.label
    ), pred AS (
        SELECT vec_id, true_label,
               (min(struct_pack(ds := dist, lab := cand_label))).lab AS pred_label
        FROM d GROUP BY vec_id, true_label
    )
    SELECT CAST(true_label AS INTEGER) AS true_label,
           CAST(pred_label AS INTEGER) AS pred_label,
           count(*) AS n_vecs
    FROM pred
    GROUP BY 1, 2
    """


@query("nearest_centroid_confusion", oracle=_ncc_oracle())
def nearest_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio / nearest-centroid classification of every vector against
    the per-label mean embeddings, rolled up as a confusion matrix — the
    is-this-label-space-separable check that runs before anyone trains a
    real probe. Composes the REGISTERED emb_centroids on both engine and
    oracle sides.

    Determinism: per-(vector, candidate-label) distance folds the
    dimension terms in dim-sorted order with a 0.0 seed (centroids are
    themselves order-pinned doubles), and the argmin tie-breaks on the
    smaller label — both engines agree bit-for-bit. Plan: the exploded
    dim join keys on dim against the tiny centroid table (broadcast);
    distances aggregate per (vec, label); the confusion rollup is a
    handful of rows. At production scale the centroid table stays
    broadcast-sized (labels × dims) and the scan dominates."""
    from ..registry import QUERIES

    cent = QUERIES["emb_centroids"](spark, sf_dir).select(
        F.col("label").alias("cand_label"), "dim", "centroid"
    )
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.posexplode("embedding").alias("pos0", "val"),
    ).select(
        "vec_id",
        "true_label",
        (F.col("pos0") + 1).cast("long").alias("dim"),
        F.col("val").cast("double").alias("x"),
    )
    term = (F.col("x") - F.col("centroid")) * (F.col("x") - F.col("centroid"))
    d = (
        x.join(F.broadcast(cent), "dim")
        .select("vec_id", "true_label", "cand_label", F.col("dim").alias("dm"), term.alias("t"))
        .groupBy("vec_id", "true_label", "cand_label")
        .agg(
            F.expr(
                "aggregate(transform(sort_array(collect_list(struct(dm, t))),"
                " __s -> __s.t), CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
            ).alias("dist")
        )
    )
    pred = d.groupBy("vec_id", "true_label").agg(
        F.min(F.struct(F.col("dist").alias("ds"), F.col("cand_label").alias("lab")))[
            "lab"
        ].alias("pred_label")
    )
    return (
        pred.groupBy(
            F.col("true_label").cast("int").alias("true_label"),
            F.col("pred_label").cast("int").alias("pred_label"),
        )
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )


# --------------------------------------------------------------------------
# Per-label diagonal-covariance outlier scan: the embedding-space QA pass
# (corrupt vectors, wrong-label shards) run before any ANN index build.
# --------------------------------------------------------------------------
_ZOUT_THRESHOLD = 3.0
_ZOUT_EPS = 1e-9


@query(
    "emb_outlier_zscore",
    oracle=f"""
    WITH x AS (
        SELECT label, vec_id,
               unnest(generate_series(1, {DIM})) AS dim,
               embedding
        FROM embeddings
    ), v AS (
        SELECT label, vec_id, dim,
               CAST(embedding[dim] AS DOUBLE) AS xv
        FROM x
    ), vq AS (
        SELECT label, vec_id, dim, xv,
               CAST(round(xv * {_FXP_SCALE}) AS BIGINT) AS qv
        FROM v
    ), g AS (
        SELECT label, dim, count(*) AS n,
               CAST(sum(qv) AS BIGINT) AS sq,
               CAST(sum(qv * qv) AS BIGINT) AS sqq
        FROM vq GROUP BY label, dim
    ), stats AS (
        SELECT label, dim, n,
               CAST(sq AS DOUBLE) / (n * {_FXP_SCALE}) AS mu,
               CAST(sqq AS DOUBLE) / (n * {_FXP_SCALE_SQ}) AS ex2
        FROM g
    ), z AS (
        SELECT v.label, v.vec_id,
               abs(v.xv - s.mu)
                   / sqrt(greatest(s.ex2 - s.mu * s.mu, 0.0) + {_ZOUT_EPS})
                   AS zv
        FROM v JOIN stats s ON v.label = s.label AND v.dim = s.dim
    ), per_vec AS (
        SELECT label, vec_id, max(zv) AS max_z FROM z GROUP BY label, vec_id
    )
    SELECT label,
           count(*) AS n_vecs,
           CAST(sum(CASE WHEN max_z > {_ZOUT_THRESHOLD} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           max(max_z) AS worst_z
    FROM per_vec GROUP BY label
    """,
)
def emb_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outliers under a per-(label, dimension) z-score: a vector
    is flagged when ANY of its coordinates sits more than 3 standard
    deviations from its label's per-dimension mean (diagonal-covariance
    Mahalanobis). Reports per-label vector/outlier counts and the worst
    score — the shard-QA table read before building an ANN index over a
    new embedding drop.

    Determinism + scale posture: mean and E[x²] come from 2^-20
    fixed-point quantized coordinates accumulated with PLAIN integer sums
    — order-free, engine-exact, partial-aggregatable, O(1) state per
    (label, dim) group at any corpus size (the previous vec_id-sorted
    collect_list fold buffered every vector of the group). Variance, the
    epsilon-stabilized sqrt, and every |z| > 3 comparison then evaluate
    on bit-identical doubles in both engines. Plan shape: one
    (label, dim) shuffle for the moment table (bounded: labels × {DIM}
    rows), which broadcasts back onto the exploded scan; the per-vector
    max and the label rollup key on (label, vec_id) — max() is
    order-insensitive, so those aggs need no pinning. |q| <= 2^21 is
    guarded at runtime; the q² sum has int64 headroom to ~2^21 vectors
    per label — widen that accumulator to DECIMAL(38,0) beyond that."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "label", "vec_id", F.posexplode("embedding").alias("pos0", "val")
    ).select(
        "label",
        "vec_id",
        (F.col("pos0") + 1).alias("dim"),
        F.col("val").cast("double").alias("xv"),
    )
    vq = v.withColumn("qv", _fxp_q(F.col("xv"), "emb_outlier_zscore"))
    g = vq.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qv").alias("sq"),
        F.sum(F.col("qv") * F.col("qv")).alias("sqq"),
    )
    stats = g.select(
        "label",
        "dim",
        (F.col("sq").cast("double") / (F.col("n") * F.lit(_FXP_SCALE))).alias(
            "mu"
        ),
        (
            F.col("sqq").cast("double") / (F.col("n") * F.lit(_FXP_SCALE_SQ))
        ).alias("ex2"),
    )
    z = v.join(F.broadcast(stats), ["label", "dim"]).select(
        "label",
        "vec_id",
        (
            F.abs(F.col("xv") - F.col("mu"))
            / F.sqrt(
                F.greatest(
                    F.col("ex2") - F.col("mu") * F.col("mu"), F.lit(0.0)
                )
                + F.lit(_ZOUT_EPS)
            )
        ).alias("zv"),
    )
    per_vec = z.groupBy("label", "vec_id").agg(F.max("zv").alias("max_z"))
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(
            F.when(F.col("max_z") > _ZOUT_THRESHOLD, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
        F.max("max_z").alias("worst_z"),
    )


# --------------------------------------------------------------------------
# Reciprocal-rank fusion: merge two ANN candidate lists into one ranking
# (the standard hybrid-retrieval combiner; Cormack et al.'s RRF).
# --------------------------------------------------------------------------
_RRF_K = 60
_RRF_TOP = 5


def _rrf_oracle() -> str:
    from ..registry import ORACLES

    rank = (
        "row_number() OVER (PARTITION BY query_id"
        " ORDER BY cosine DESC, vec_id)"
    )
    return f"""
    WITH la AS MATERIALIZED ({ORACLES['sim_cosine_topk_lsh']}),
    lb AS MATERIALIZED ({ORACLES['sim_cosine_topk_ivf']}),
    ra AS (SELECT query_id, vec_id, {rank} AS r FROM la),
    rb AS (SELECT query_id, vec_id, {rank} AS r FROM lb),
    u AS (SELECT * FROM ra UNION ALL SELECT * FROM rb),
    s AS (
        SELECT query_id, vec_id,
               sum(1.0 / ({_RRF_K} + r)) AS rrf_score,
               CAST(count(*) AS BIGINT) AS n_lists
        FROM u GROUP BY query_id, vec_id
    )
    SELECT query_id, vec_id, rrf_score, n_lists FROM (
        SELECT s.*,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rrf_score DESC, vec_id) AS rn
        FROM s
    ) WHERE rn <= {_RRF_TOP}
    """


@query("sim_rank_fusion_rrf", oracle=_rrf_oracle())
def sim_rank_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the LSH and IVF candidate lists with
    reciprocal-rank fusion (score = Σ 1/(60 + rank)) and keep the top-5
    per query. Composes the two REGISTERED indexes on both engine and
    oracle sides, so the fusion can never drift from what the indexes
    actually return; each pair contributes at most two IEEE terms, whose
    addition is order-insensitive bitwise, and every ranking carries a
    vec_id tiebreak.

    At 100 TB both inputs are per-query top-k lists (N_QUERIES × TOPK
    rows — driver-scale, not corpus-scale), so the fusion itself is a
    tiny keyed aggregation; the heavy lifting stays inside the composed
    index scans, which swap freely for any registered ANN variant."""
    from ..registry import QUERIES

    def ranked(name: str) -> DataFrame:
        lst = QUERIES[name](spark, sf_dir)
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
        return lst.select(
            "query_id", "vec_id", F.row_number().over(w).alias("r")
        )

    u = ranked("sim_cosine_topk_lsh").unionAll(ranked("sim_cosine_topk_ivf"))
    s = u.groupBy("query_id", "vec_id").agg(
        F.sum(F.lit(1.0) / (F.lit(_RRF_K) + F.col("r"))).alias("rrf_score"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("vec_id"))
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RRF_TOP)
        .select("query_id", "vec_id", "rrf_score", "n_lists")
    )


# --------------------------------------------------------------------------
# Label margin: per query, best same-label vs best other-label cosine —
# the separability score that predicts kNN/centroid classifier quality.
# --------------------------------------------------------------------------
def _label_margin_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH topk AS MATERIALIZED ({ORACLES['sim_cosine_topk_bruteforce']}),
    lab AS (SELECT vec_id, label FROM embeddings),
    tagged AS (
        SELECT t.query_id, t.vec_id, t.cosine,
               CAST(ln.label = lq.label AS INT) AS same_label
        FROM topk t
        JOIN lab ln ON ln.vec_id = t.vec_id
        JOIN lab lq ON lq.vec_id = t.query_id
        WHERE t.vec_id <> t.query_id
    )
    SELECT query_id,
           max(CASE WHEN same_label = 1 THEN cosine END) AS best_same,
           max(CASE WHEN same_label = 0 THEN cosine END) AS best_other,
           coalesce(max(CASE WHEN same_label = 1 THEN cosine END), -1.0)
             - coalesce(max(CASE WHEN same_label = 0 THEN cosine END), -1.0)
             AS margin,
           CAST(sum(same_label) AS BIGINT) AS n_same_in_topk
    FROM tagged
    GROUP BY query_id
    """


@query("sim_label_margin", oracle=_label_margin_oracle())
def sim_label_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval separability: for each query, the best same-label and
    best other-label cosine among its top-k neighbors (self excluded),
    their margin, and how many of the top-k share the query's label. A
    positive margin everywhere means nearest-neighbor classification is
    easy; negative margins localize label noise. Composes the REGISTERED
    brute-force top-k on both sides; max() over rounded cosines is
    order-insensitive, missing cases pinned via coalesce(-1).

    At 100 TB: the top-k list is query-scale; the two label lookups are
    equi-joins of that tiny list against a 2-column projection of the
    CORPUS-cardinality embeddings table — so the broadcast decision is
    deliberately left to size statistics / AQE (auto-broadcast at test
    scale, shuffle join at corpus scale; a forced broadcast of all
    vec_ids would OOM a 100 TB corpus even as two columns). The
    corpus-scale work stays inside the composed index, swappable for any
    registered ANN variant."""
    from ..registry import QUERIES

    topk = QUERIES["sim_cosine_topk_bruteforce"](spark, sf_dir).filter(
        F.col("vec_id") != F.col("query_id")
    )
    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    tagged = (
        topk.join(lab.withColumnRenamed("label", "n_label"), "vec_id")
        .join(
            (
                lab.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("label").alias("q_label"),
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            "cosine",
            (F.col("n_label") == F.col("q_label")).cast("int").alias("same_label"),
        )
    )
    best_same = F.max(F.when(F.col("same_label") == 1, F.col("cosine")))
    best_other = F.max(F.when(F.col("same_label") == 0, F.col("cosine")))
    return tagged.groupBy("query_id").agg(
        best_same.alias("best_same"),
        best_other.alias("best_other"),
        (
            F.coalesce(best_same, F.lit(-1.0))
            - F.coalesce(best_other, F.lit(-1.0))
        ).alias("margin"),
        F.sum("same_label").cast("long").alias("n_same_in_topk"),
    )


# --------------------------------------------------------------------------
# Top principal component by power iteration: the distributed linear
# algebra flagship — exact covariance from order-pinned folds, then an
# unrolled matrix-vector loop (used for PCA whitening, OPQ rotation
# initialization, and embedding-drift monitoring).
# --------------------------------------------------------------------------
_PCA_ITERS = 3


def _pca_oracle() -> str:
    fold_vec = (
        "list_reduce([0.0] || list_transform(list_sort(list(struct_pack("
        "k := {key}, t := {term}))), __x -> __x.t), (a, b) -> a + b)"
    )
    ctes = [
        f"""x AS (
        SELECT vec_id, unnest(generate_series(1, {DIM})) AS i, embedding
        FROM embeddings
    )""",
        """v AS (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS xi FROM x
    )""",
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS nv FROM embeddings)",
        f"""vq0 AS (
        SELECT vec_id, i, CAST(round(xi * {_FXP_SCALE}) AS BIGINT) AS q0 FROM v
    )""",
        f"""mu AS (
        SELECT i, CAST(CAST(sum(q0) AS BIGINT) AS DOUBLE)
                      / (max(n.nv) * {_FXP_SCALE}) AS m
        FROM vq0 CROSS JOIN n GROUP BY i
    )""",
        """xc AS (
        SELECT v.vec_id, v.i, v.xi - mu.m AS c
        FROM v JOIN mu ON mu.i = v.i
    )""",
        """xq AS (
        SELECT vec_id, i, CAST(round(c * 1048576.0) AS BIGINT) AS q FROM xc
    )""",
        """cov AS (
        SELECT a.i AS i, b.i AS j,
               CAST(sum(a.q * b.q) AS DOUBLE)
                   / (max(n.nv) * 1099511627776.0) AS cij
        FROM xq a JOIN xq b ON a.vec_id = b.vec_id
        CROSS JOIN n
        GROUP BY a.i, b.i
    )""",
        f"v0 AS (SELECT i AS dim, 1.0 / {DIM // 8}.0 AS w FROM mu)",
    ]
    prev = "v0"
    for it in range(1, _PCA_ITERS + 1):
        ctes.append(
            f"""w{it} AS (
        SELECT c.i AS dim, {fold_vec.format(key='c.j', term='c.cij * p.w')} AS w
        FROM cov c JOIN {prev} p ON p.dim = c.j GROUP BY c.i
    )"""
        )
        ctes.append(
            f"""nrm{it} AS (
        SELECT sqrt({fold_vec.format(key='dim', term='w * w')}) AS nn FROM w{it}
    )"""
        )
        ctes.append(
            f"v{it} AS (SELECT dim, w / nn AS w FROM w{it} CROSS JOIN nrm{it})"
        )
        prev = f"v{it}"
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT CAST(dim AS BIGINT) AS dim, w AS component FROM {prev}"
    )


@query("emb_pca_top_component", oracle=_pca_oracle())
def emb_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus: mean and
    mean-centered covariance both over 2^-20 fixed-point values (plain
    integer sums — order-free AND engine-exact, no per-group list state;
    the sorted-fold covariance variant measured 3x slower), then 3
    unrolled power-iteration steps with
    a normalize after each (the norm itself a dim-sorted fold over DIM
    bounded terms). The
    uniform start 1/8 = 1/sqrt(64) is binary-exact; every subsequent
    quantity is the same IEEE expression over bit-identical operands on
    both engines, so even the eigenvector's sign matches.

    Plan shape: the covariance build is the expensive step — each
    vector's DIM² outer products expand IN-ROW (chained posexplode over
    the per-row centered q-array; no self-join, no vec_id shuffle)
    followed by ONE (i, j) shuffle whose integer-sum state is
    partial-aggregatable map-side; the mean step is the same discipline
    on one (i) shuffle (O(1) state per dimension — no collect_list over
    the corpus). |q| <= 2^21 is guarded at runtime in both steps; at
    larger n widen the covariance accumulator to DECIMAL(38,0) before
    int64 headroom (~2^21 vectors) runs out. The iteration loop then
    runs entirely on DIM²-row relations — driver-scale, like
    markov_stationary."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("p0", "val")
    ).select(
        "vec_id", (F.col("p0") + 1).alias("i"), F.col("val").cast("double").alias("xi")
    )
    n = emb.agg(F.count(F.lit(1)).cast("double").alias("nv"))
    fold = (
        "aggregate(transform(ds, __x -> __x.t), CAST(0.0 AS DOUBLE),"
        " (a, b) -> a + b)"
    )
    mu = (
        x.groupBy("i")
        .agg(F.sum(_fxp_q(F.col("xi"), "emb_pca mean")).alias("sq"))
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            (
                F.col("sq").cast("double") / (F.col("nv") * F.lit(_FXP_SCALE))
            ).alias("m"),
        )
    )
    # Fixed-point covariance: centered values quantize to integer
    # 2^20ths (identical round on identical doubles), so the per-cell
    # accumulation is a PLAIN integer sum — order-free, partial-
    # aggregatable, no per-cell list state. Worst-case |sum| is
    # n * (2^21)^2 ≈ 2^53 at this corpus — inside int64, and the
    # |c| <= 2 assumption is now a guarded runtime error, not a comment.
    #
    # Round 8 (guide §2.4): the outer products assemble IN-ROW instead of
    # through a per-vector self-join — the old a.join(b, "vec_id") shuffled
    # the exploded (vec_id, i, q) relation twice by vec_id and built an
    # n×DIM² join intermediate; here each vector's centered q-array is
    # computed once per row (the 64-value mean vector broadcasts as one
    # array literal) and two chained posexplodes expand the DIM² products
    # inside the scan partition, leaving ONE partial-aggregatable (i, j)
    # shuffle of DIM² grouped rows as the only exchange. Same integer
    # q values, same order-free sums — bit-identical cij.
    mu_arr = mu.agg(
        F.array_sort(F.collect_list(F.struct("i", "m"))).alias("ms")
    ).select(F.transform("ms", lambda s: s["m"]).alias("ms"))
    qrow = emb.crossJoin(F.broadcast(mu_arr)).select(
        F.zip_with(
            "embedding",
            "ms",
            lambda x, m: _fxp_q(x.cast("double") - m, "emb_pca covariance"),
        ).alias("qs")
    )
    cov = (
        qrow.select(F.posexplode("qs").alias("i0", "aq"), "qs")
        .select("i0", "aq", F.posexplode("qs").alias("j0", "bq"))
        .groupBy(
            (F.col("i0") + 1).alias("i"), (F.col("j0") + 1).alias("j")
        )
        .agg(F.sum(F.col("aq") * F.col("bq")).alias("sq"))
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            (F.col("sq").cast("double") / (F.col("nv") * float(1 << 40))).alias(
                "cij"
            ),
        )
        # Eagerly checkpoint the DIM²-row covariance (round 8, guide §5):
        # every power-iteration step's plan references cov, so without
        # truncation the final action replayed the corpus-sized outer-
        # product build once per iteration branch.
        .localCheckpoint(eager=True)
    )
    v = mu.select(F.col("i").alias("dim"), F.lit(1.0 / (DIM // 8)).alias("w"))
    for _ in range(_PCA_ITERS):
        w = (
            cov.join(
                F.broadcast(v.select(F.col("dim").alias("j"), F.col("w").alias("vw"))),
                "j",
            )
            .groupBy("i")
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("j").alias("k"),
                            (F.col("cij") * F.col("vw")).alias("t"),
                        )
                    )
                ).alias("ds")
            )
            .select(F.col("i").alias("dim"), F.expr(fold).alias("w"))
        )
        nrm = w.agg(
            F.sqrt(
                F.expr(
                    "aggregate(transform(sort_array(collect_list("
                    "struct(dim AS k, w * w AS t))), __x -> __x.t),"
                    " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
                )
            ).alias("nn")
        )
        # DIM-row eager checkpoint per step: w feeds both the norm agg and
        # the next step, and v0's lineage roots in the corpus-scan mean —
        # untruncated, each later iteration replayed every earlier one.
        v = w.crossJoin(F.broadcast(nrm)).select(
            "dim", (F.col("w") / F.col("nn")).alias("w")
        ).localCheckpoint(eager=True)
    return v.select(F.col("dim").cast("long").alias("dim"), F.col("w").alias("component"))


# --------------------------------------------------------------------------
# IVF cell balance: the index-health table read before trusting IVF probe
# latency — skewed cells make nprobe latency unpredictable.
# --------------------------------------------------------------------------
@query(
    "ivf_cell_balance",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, embedding, {_sql_norm('embedding')} AS nrm
        FROM embeddings
    ), cent AS (
        SELECT vec_id AS cell_id, embedding AS c_emb, nrm AS c_nrm
        FROM base
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CELLS}
    ), assign AS (
        SELECT vec_id, cell_id FROM (
            SELECT b.vec_id, c.cell_id,
                   row_number() OVER (
                       PARTITION BY b.vec_id
                       ORDER BY round({_sql_dot('b.embedding', 'c.c_emb')} / (b.nrm * c.c_nrm), 4) DESC,
                                c.cell_id) AS crn
            FROM base b CROSS JOIN cent c
        ) WHERE crn = 1
    ), g AS (
        SELECT cell_id, count(*) AS n_vecs FROM assign GROUP BY cell_id
    ), t AS (
        SELECT CAST(sum(n_vecs) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_cells
        FROM g
    )
    SELECT g.cell_id, g.n_vecs,
           round(CAST(g.n_vecs AS DOUBLE) / t.total, 6) AS share,
           round(CAST(g.n_vecs AS DOUBLE) * t.n_cells / t.total, 6)
               AS balance_ratio
    FROM g CROSS JOIN t
    """,
)
def ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index health: per-cell vector counts from the SAME deterministic
    assignment rule as sim_cosine_topk_ivf, with each cell's share and its
    balance ratio (share x n_cells — 1.0 is perfectly even). Skewed cells
    are the IVF failure mode at scale: probe latency is proportional to
    the probed cells' populations, so one mega-cell makes nprobe latency
    unpredictable and the fix (split the cell, re-train centroids) starts
    from exactly this table.

    Plan shape: the N x C assignment is map-side against the broadcast
    centroid table + one per-vector argmax window, then a C-key count —
    strictly cheaper than the search query that shares the build."""
    base = _with_norm(load_table(spark, sf_dir, "embeddings"))
    cent = base.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + N_CELLS)
    ).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    c_cos = F.round(
        _dot(F.col("embedding"), F.col("c_emb")) / (F.col("nrm") * F.col("c_nrm")), 4
    )
    aw = Window.partitionBy("vec_id").orderBy(F.desc("_ccos"), F.asc("cell_id"))
    assign = (
        base.crossJoin(F.broadcast(cent))
        .withColumn("_ccos", c_cos)
        .withColumn("_crn", F.row_number().over(aw))
        .filter(F.col("_crn") == 1)
        .select("vec_id", "cell_id")
    )
    g = assign.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n_vecs"))
    t = g.agg(
        F.sum("n_vecs").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    return g.crossJoin(F.broadcast(t)).select(
        "cell_id",
        "n_vecs",
        F.round(F.col("n_vecs").cast("double") / F.col("total"), 6).alias(
            "share"
        ),
        F.round(
            F.col("n_vecs").cast("double") * F.col("n_cells") / F.col("total"),
            6,
        ).alias("balance_ratio"),
    )


# --------------------------------------------------------------------------
# Embedding drift monitor: per-label centroid distance between two corpus
# halves — the check that catches a changed encoder or a shifted data mix
# before an index rebuild.
# --------------------------------------------------------------------------
@query(
    "emb_drift_by_split",
    oracle=f"""
    WITH x AS (
        SELECT label, vec_id % 2 AS half, vec_id,
               unnest(generate_series(1, {DIM})) AS dim,
               embedding
        FROM embeddings
    ), q AS (
        SELECT label, half, dim,
               CAST(round(CAST(embedding[dim] AS DOUBLE) * {_FXP_SCALE})
                    AS BIGINT) AS qv
        FROM x
    ), g AS (
        SELECT label, half, dim, count(*) AS n,
               CAST(sum(qv) AS BIGINT) AS sq
        FROM q GROUP BY label, half, dim
    ), m AS (
        SELECT label, half, dim,
               CAST(sq AS DOUBLE) / (n * {_FXP_SCALE}) AS mu, n
        FROM g
    ), j AS (
        SELECT a.label, a.dim,
               (a.mu - b.mu) * (a.mu - b.mu) AS d2,
               a.n AS n_a, b.n AS n_b
        FROM m a JOIN m b
          ON a.label = b.label AND a.dim = b.dim
         AND a.half = 0 AND b.half = 1
    )
    SELECT label,
           CAST(max(n_a) AS BIGINT) AS n_even,
           CAST(max(n_b) AS BIGINT) AS n_odd,
           round(sqrt(list_reduce(
               [0.0] || list_transform(
                   list_sort(list(struct_pack(k := dim, t := d2))),
                   __s -> __s.t),
               (acc, v) -> acc + v)), 6) AS drift_l2
    FROM j GROUP BY label
    """,
)
def emb_drift_by_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: per label, the L2 distance between the
    centroid of the even-vec_id half and the odd-vec_id half of the
    corpus (a deterministic stand-in for "last week's shard vs this
    week's" — a real deployment keys the halves by ingestion date). Large
    drift on a label means the encoder or the data mix moved — rebuild or
    re-balance the index before trusting recall numbers.

    Determinism: per-half means use the guarded fixed-point integer-sum
    discipline (O(1) group state, engine-exact — the emb_centroids path);
    the per-label distance folds DIM bounded squared-difference terms in
    dim order (the bounded-group sorted-fold discipline), so the sqrt and
    6-dp round see identical doubles. Plan: ONE (label, half, dim)
    shuffle; the join and rollup run on the labels x 2 x DIM mean table —
    metadata-scale at any corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("p0", "val"),
    ).select(
        "label",
        "half",
        (F.col("p0") + 1).alias("dim"),
        F.col("val").cast("double").alias("xv"),
    )
    g = x.groupBy("label", "half", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_fxp_q(F.col("xv"), "emb_drift_by_split")).alias("sq"),
    )
    m = g.select(
        "label",
        "half",
        "dim",
        "n",
        (F.col("sq").cast("double") / (F.col("n") * F.lit(_FXP_SCALE))).alias(
            "mu"
        ),
    )
    a = m.filter(F.col("half") == 0).select(
        "label", "dim", F.col("mu").alias("mu_a"), F.col("n").alias("n_a")
    )
    b = m.filter(F.col("half") == 1).select(
        "label", "dim", F.col("mu").alias("mu_b"), F.col("n").alias("n_b")
    )
    j = a.join(b, ["label", "dim"]).select(
        "label",
        "dim",
        ((F.col("mu_a") - F.col("mu_b")) * (F.col("mu_a") - F.col("mu_b"))).alias(
            "d2"
        ),
        "n_a",
        "n_b",
    )
    fold = (
        "aggregate(transform(sort_array(collect_list(struct(dim AS k, d2 AS t))),"
        " __s -> __s.t), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return j.groupBy("label").agg(
        F.max("n_a").cast("long").alias("n_even"),
        F.max("n_b").cast("long").alias("n_odd"),
        F.round(F.sqrt(F.expr(fold)), 6).alias("drift_l2"),
    )


# ---------------------------------------------------------------------------
# Int8 symmetric quantization audit — the vector-storage compression step.
# ---------------------------------------------------------------------------
@query(
    "emb_int8_quantize",
    oracle="""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), s AS (
        SELECT vec_id, label, v,
               list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        FROM e
    ), err AS (
        SELECT vec_id, label, scale,
               CAST(len(v) AS INTEGER) AS n_dims,
               CASE WHEN scale = 0.0
                    THEN list_transform(v, x -> 0.0)
                    ELSE list_transform(v, x ->
                        abs(x - greatest(-127.0, least(127.0,
                                floor(x / scale + 0.5))) * scale))
               END AS errs
        FROM s
    )
    SELECT vec_id, label, n_dims, scale,
           list_max(errs) AS max_abs_err,
           list_reduce([0.0] || errs, (a, b) -> a + b) AS l1_err
    FROM err
    """,
)
def emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization audit: scale = max|x|/127,
    code = clamp(round(x/scale), ±127), reported as the reconstruction
    error per vector (max and L1) — the measurement that decides whether a
    4× smaller vector store (the standard ANN-at-scale compression,
    coarser than PQ's codebooks but transparent to distance math) is
    safe for a given corpus. Rounding is floor(x/scale + 0.5), not
    round(): floor is an exact IEEE op with identical semantics on both
    engines, where round() ties differ (HALF_UP vs banker's) — the
    same trap c2_bround_bankers documents.

    Exactness: abs/floor/min/max and the final multiply-subtract are all
    exact-rounded IEEE ops in pinned order; the L1 fold runs in array
    index order (deterministic, DIM-bounded — never a fact-scale
    collect). Zero vectors short-circuit to zero error instead of
    NaN-ing through the division.

    Plan: map-only — zero shuffles, zero joins; every expression is
    JVM-side array code inside one projection over the scan. The
    per-vector output keys downstream rollups; at 100 TB this is the
    embarrassingly-parallel shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    s = e.select(
        "vec_id",
        "label",
        "v",
        (F.array_max(F.transform("v", F.abs)) / F.lit(127.0)).alias("scale"),
    )
    err = s.select(
        "vec_id",
        "label",
        "scale",
        F.size("v").alias("n_dims"),
        F.when(
            F.col("scale") == 0.0, F.transform("v", lambda x: F.lit(0.0))
        )
        .otherwise(
            F.expr(
                "transform(v, x -> abs(x - greatest(CAST(-127.0 AS DOUBLE),"
                " least(CAST(127.0 AS DOUBLE),"
                " floor(x / scale + 0.5))) * scale))"
            )
        )
        .alias("errs"),
    )
    return err.select(
        "vec_id",
        "label",
        "n_dims",
        "scale",
        F.array_max("errs").alias("max_abs_err"),
        F.expr(
            "aggregate(errs, CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("l1_err"),
    )


# ---------------------------------------------------------------------------
# Matryoshka / prefix-dimension retrieval: search on the first 16 of 64
# dims, measure what that truncation costs in recall.
# ---------------------------------------------------------------------------
PREFIX_DIM = 16


def _sql_prefix_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {PREFIX_DIM}), "
        f"__i -> CAST({a}[__i] AS DOUBLE) * {b}[__i]))"
    )


def _sql_prefix_norm(emb: str) -> str:
    return (
        f"sqrt(list_sum(list_transform(generate_series(1, {PREFIX_DIM}), "
        f"__i -> CAST({emb}[__i] AS DOUBLE) * {emb}[__i])))"
    )


@query(
    "sim_cosine_topk_prefix",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, embedding, {_sql_prefix_norm('embedding')} AS nrm
        FROM embeddings
    ), q AS (
        SELECT * FROM base WHERE vec_id < {N_QUERIES}
    )
    SELECT query_id, vec_id, cosine FROM (
        SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
               round({_sql_prefix_dot('q.embedding', 'b.embedding')}
                     / (q.nrm * b.nrm), 4) AS cosine,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round({_sql_prefix_dot('q.embedding', 'b.embedding')}
                            / (q.nrm * b.nrm), 4) DESC,
                            b.vec_id) AS rn
        FROM q CROSS JOIN base b
    ) WHERE rn <= {TOPK}
    """,
)
def sim_cosine_topk_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-k over only the FIRST 16 of 64 dimensions — the
    Matryoshka-representation retrieval pattern: embeddings trained
    front-loaded let the index store/scan a 4× smaller prefix, rerank on
    full vectors later. This operator is the cheap first stage; its
    honest price tag is sim_recall_dim_prefix. Same plan shape as the
    brute force (tiny query set broadcast against a corpus scan, window
    top-k per query) but every distance touches 16 components — at
    100 TB that is 4× less memory bandwidth on the hot loop, the whole
    point of the trick.

    Determinism: prefix dot and norm accumulate in index order 1..16
    (the _dot fold discipline), cosine rounds to 4 dp before the
    rank-order tie-break on vec_id."""
    emb = load_table(spark, sf_dir, "embeddings")
    pref = F.slice("embedding", 1, PREFIX_DIM)
    base = emb.select(
        "vec_id",
        pref.alias("p"),
        F.sqrt(_dot(pref, pref)).alias("nrm"),
    )
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("p").alias("q_p"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = F.round(
        _dot(F.col("q_p"), F.col("p")) / (F.col("q_nrm") * F.col("nrm")), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        base.crossJoin(F.broadcast(q))
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .select("query_id", "vec_id", "cosine")
    )


# recall@k of the truncated-prefix search vs the full-dimension exact
# top-k — same factory as sim_recall_lsh/ivf, so metric and operators
# cannot drift apart.
query("sim_recall_dim_prefix", oracle=_recall_oracle("sim_cosine_topk_prefix"))(
    _recall_query("sim_cosine_topk_prefix")
)


# ---------------------------------------------------------------------------
# Two-stage retrieval: prefix-dim shortlist -> full-dim exact rerank.
# ---------------------------------------------------------------------------
RERANK_SHORTLIST = 50


@query(
    "sim_prefix_rerank",
    oracle=f"""
    WITH pbase AS (
        SELECT vec_id, embedding, {_sql_prefix_norm('embedding')} AS pnrm,
               {_sql_norm('embedding')} AS nrm
        FROM embeddings
    ), q AS (
        SELECT * FROM pbase WHERE vec_id < {N_QUERIES}
    ), shortlist AS (
        SELECT query_id, vec_id, nrm, embedding, q_emb, q_nrm FROM (
            SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
                   b.nrm, b.embedding,
                   q.embedding AS q_emb, q.nrm AS q_nrm,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round({_sql_prefix_dot('q.embedding', 'b.embedding')}
                                / (q.pnrm * b.pnrm), 4) DESC,
                                b.vec_id) AS rn
            FROM q CROSS JOIN pbase b
        ) WHERE rn <= {RERANK_SHORTLIST}
    )
    SELECT query_id, vec_id, cosine FROM (
        SELECT query_id, vec_id,
               round({_sql_dot('q_emb', 'embedding')} / (q_nrm * nrm), 4)
                   AS cosine,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round({_sql_dot('q_emb', 'embedding')}
                            / (q_nrm * nrm), 4) DESC, vec_id) AS rn
        FROM shortlist
    ) WHERE rn <= {TOPK}
    """,
)
def sim_prefix_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production two-stage ANN shape: a cheap prefix-dimension scan
    shortlists 50 candidates per query, then ONLY those rows pay the
    full 64-dimension exact cosine, and the final top-10 comes from
    the rerank. This is coarse-quantizer + rerank exactly as FAISS/HNSW
    deployments run it — stage 1 bounds memory bandwidth, stage 2 bounds
    rank error; sim_recall_prefix_rerank prices the whole cascade
    against the exact brute force (reranking cannot recover a true
    neighbor the shortlist missed, so its recall is the shortlist's
    hit rate at 10 — strictly >= the raw prefix search's).

    Plan: the corpus is scanned ONCE (stage-1 window over the broadcast
    query set); stage 2 touches 50·|Q| rows — index-scale, not
    corpus-scale — so the expensive full-dim fold runs on a vanishing
    fraction of the data. Both windows partition by query_id. The
    full-vector payload rides the shortlist rows, trading shuffle bytes
    for a second corpus join; at 100 TB flip to re-joining the corpus by
    vec_id if vectors are wide enough that the carry outweighs the join
    (documented knob, same result either way)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pref = F.slice("embedding", 1, PREFIX_DIM)
    base = emb.select(
        "vec_id",
        "embedding",
        pref.alias("p"),
        F.sqrt(_dot(pref, pref)).alias("pnrm"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("p").alias("q_p"),
        F.col("pnrm").alias("q_pnrm"),
        F.col("nrm").alias("q_nrm"),
    )
    pcos = F.round(
        _dot(F.col("q_p"), F.col("p")) / (F.col("q_pnrm") * F.col("pnrm")), 4
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("prefix_cos"), F.asc("vec_id")
    )
    shortlist = (
        base.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "vec_id",
            "embedding",
            "nrm",
            "q_emb",
            "q_nrm",
            pcos.alias("prefix_cos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= RERANK_SHORTLIST)
    )
    cos = F.round(
        _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm")),
        4,
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        shortlist.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= TOPK)
        .select("query_id", "vec_id", "cosine")
    )


query(
    "sim_recall_prefix_rerank", oracle=_recall_oracle("sim_prefix_rerank")
)(_recall_query("sim_prefix_rerank"))


# ---------------------------------------------------------------------------
# Retrieval over int8-quantized vectors: what the 4x-smaller store costs.
# ---------------------------------------------------------------------------
def _sql_deq(emb: str, scale: str) -> str:
    """Dequantized element stream: clamp(floor(x/s + 0.5), ±127) * s."""
    return (
        f"list_transform({emb}, __x -> greatest(-127.0, least(127.0, "
        f"floor(CAST(__x AS DOUBLE) / {scale} + 0.5))) * {scale})"
    )


@query(
    "sim_cosine_topk_int8",
    oracle=f"""
    WITH s AS (
        SELECT vec_id,
               list_max(list_transform(embedding,
                   __x -> abs(CAST(__x AS DOUBLE)))) / 127.0 AS scale,
               embedding
        FROM embeddings
    ), dq AS (
        SELECT vec_id, {_sql_deq('embedding', 'scale')} AS v FROM s
        WHERE scale > 0.0
    ), base AS (
        SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, __x -> __x * __x))) AS nrm
        FROM dq
    ), q AS (
        SELECT * FROM base WHERE vec_id < {N_QUERIES}
    )
    SELECT query_id, vec_id, cosine FROM (
        SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
               round(list_sum(list_transform(generate_series(1, {DIM}),
                         __i -> q.v[__i] * b.v[__i]))
                     / (q.nrm * b.nrm), 4) AS cosine,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round(list_sum(list_transform(
                                generate_series(1, {DIM}),
                                __i -> q.v[__i] * b.v[__i]))
                            / (q.nrm * b.nrm), 4) DESC,
                            b.vec_id) AS rn
        FROM q CROSS JOIN base b
    ) WHERE rn <= {TOPK}
    """,
)
def sim_cosine_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-k over int8-quantized-then-dequantized vectors — the
    search emb_int8_quantize's storage decision actually buys: every
    stored component is one of 255 values code*scale, 4x less memory
    than float32, and the ranking error that introduces is priced by
    sim_recall_int8 against the full-precision brute force. (A real
    store keeps the int8 codes + one scale per vector and dequantizes
    in-register at scan time; computing on code*scale doubles here is
    numerically identical and keeps the plan pure-expression.)

    Determinism: quantization uses the exact-IEEE floor(x/s + 0.5)
    clamp (emb_int8_quantize's discipline), dot/norm fold in index
    order, cosine rounds to 4 dp before the vec_id tie-break. Zero
    vectors (scale = 0) cannot be direction-normalized and drop on both
    engines.

    Plan: identical shape to the brute force — broadcast query set, one
    corpus scan, per-query top-k window. The quantize+dequantize is
    scan-stage array math; nothing new shuffles."""
    emb = load_table(spark, sf_dir, "embeddings")
    s = emb.select(
        "vec_id",
        "embedding",
        (
            F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
            / F.lit(127.0)
        ).alias("scale"),
    ).filter(F.col("scale") > 0.0)
    dq = s.select(
        "vec_id",
        F.expr(
            "transform(embedding, __x -> greatest(CAST(-127.0 AS DOUBLE),"
            " least(CAST(127.0 AS DOUBLE),"
            " floor(CAST(__x AS DOUBLE) / scale + 0.5))) * scale)"
        ).alias("v"),
    )
    base = dq.select(
        "vec_id", "v", F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm")
    )
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = F.round(
        _dot(F.col("q_v"), F.col("v")) / (F.col("q_nrm") * F.col("nrm")), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        base.crossJoin(F.broadcast(q))
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .select("query_id", "vec_id", "cosine")
    )


query("sim_recall_int8", oracle=_recall_oracle("sim_cosine_topk_int8"))(
    _recall_query("sim_cosine_topk_int8")
)


# ---------------------------------------------------------------------------
# IVF tuning curve: mean recall@k as a function of nprobe.
# ---------------------------------------------------------------------------
NPROBE_CURVE = (1, 2, 4)


def _nprobe_curve_oracle() -> str:
    from ..registry import ORACLES

    def topn(np_: int) -> str:
        return f"""(
        SELECT query_id, vec_id FROM (
            SELECT p.query_id, a.vec_id,
                   row_number() OVER (
                       PARTITION BY p.query_id
                       ORDER BY round({_sql_dot('p.q_emb', 'a.embedding')}
                                / (p.q_nrm * a.nrm), 4) DESC,
                                a.vec_id) AS rn
            FROM probesr p JOIN assign a ON p.cell_id = a.cell_id
            WHERE p.prn <= {np_}
        ) WHERE rn <= {TOPK})"""

    per_np = "\n    UNION ALL\n".join(
        f"""    SELECT {np_} AS nprobe,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS mean_recall
    FROM ex e LEFT JOIN {topn(np_)} a
      ON a.query_id = e.query_id AND a.vec_id = e.vec_id"""
        for np_ in NPROBE_CURVE
    )
    return f"""
    WITH base AS (
        SELECT vec_id, embedding, {_sql_norm('embedding')} AS nrm
        FROM embeddings
    ), cent AS (
        SELECT vec_id AS cell_id, embedding AS c_emb, nrm AS c_nrm
        FROM base
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CELLS}
    ), assign AS (
        SELECT vec_id, embedding, nrm, cell_id FROM (
            SELECT b.vec_id, b.embedding, b.nrm, c.cell_id,
                   row_number() OVER (
                       PARTITION BY b.vec_id
                       ORDER BY round({_sql_dot('b.embedding', 'c.c_emb')} / (b.nrm * c.c_nrm), 4) DESC,
                                c.cell_id) AS crn
            FROM base b CROSS JOIN cent c
        ) WHERE crn = 1
    ), probesr AS (
        SELECT query_id, q_emb, q_nrm, cell_id, prn FROM (
            SELECT q.vec_id AS query_id, q.embedding AS q_emb, q.nrm AS q_nrm,
                   c.cell_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round({_sql_dot('q.embedding', 'c.c_emb')} / (q.nrm * c.c_nrm), 4) DESC,
                                c.cell_id) AS prn
            FROM (SELECT * FROM base WHERE vec_id < {N_QUERIES}) q
            CROSS JOIN cent c
        ) WHERE prn <= {max(NPROBE_CURVE)}
    ), ex AS MATERIALIZED ({ORACLES['sim_cosine_topk_bruteforce']})
{per_np}
    """


@query("sim_ivf_nprobe_curve", oracle=_nprobe_curve_oracle())
def sim_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF tuning table: mean recall@10 at nprobe ∈ {1, 2, 4} against
    the exact brute force — the latency/recall frontier every IVF
    deployment reads before fixing its probe count (candidates scanned
    scale linearly with nprobe; recall saturates). One row per setting,
    so the operator IS the tuning curve, not a single point like
    sim_recall_ivf.

    Exactness: mean recall = Σ hits / (|Q|·k) — the per-query k is
    constant, so the query-mean collapses to exact integer counting with
    ONE final division; no float accumulation over queries at all.

    Plan: the index builds ONCE — base/centroid assignment and the
    ranked probe list persist (eagerly, the composed-cache contract) and
    every nprobe setting rides them with one cell-keyed join + window;
    the exact side is the registered brute force, also computed once.
    Probe count only changes a FILTER on the ranked probe list — the
    curve costs barely more than its most expensive point."""
    from ..registry import QUERIES

    base = _with_norm(load_table(spark, sf_dir, "embeddings")).persist()
    base.count()
    cent = base.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + N_CELLS)
    ).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    c_cos = F.round(
        _dot(F.col("embedding"), F.col("c_emb")) / (F.col("nrm") * F.col("c_nrm")), 4
    )
    aw = Window.partitionBy("vec_id").orderBy(F.desc("_ccos"), F.asc("cell_id"))
    assign = (
        base.crossJoin(F.broadcast(cent))
        .withColumn("_ccos", c_cos)
        .withColumn("_crn", F.row_number().over(aw))
        .filter(F.col("_crn") == 1)
        .select("vec_id", "embedding", "nrm", "cell_id")
        .persist()
    )
    assign.count()
    q_cos = F.round(
        _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm")), 4
    )
    pw = Window.partitionBy("query_id").orderBy(F.desc("_qcos"), F.asc("cell_id"))
    probesr = (
        base.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
        .crossJoin(F.broadcast(cent))
        .withColumn("_qcos", q_cos)
        .withColumn("prn", F.row_number().over(pw))
        .filter(F.col("prn") <= max(NPROBE_CURVE))
        .select("query_id", "q_emb", "q_nrm", "cell_id", "prn")
        .persist()
    )
    probesr.count()
    exact = (
        QUERIES["sim_cosine_topk_bruteforce"](spark, sf_dir)
        .select("query_id", "vec_id")
        .persist()
    )
    exact.count()
    cos = F.round(
        _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm")), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    out = None
    for np_ in NPROBE_CURVE:
        topn = (
            assign.join(
                F.broadcast(probesr.filter(F.col("prn") <= np_)), "cell_id"
            )
            .select("query_id", "vec_id", cos.alias("cosine"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TOPK)
            .select("query_id", "vec_id")
            .withColumn("hit", F.lit(1))
        )
        row = (
            exact.join(topn, ["query_id", "vec_id"], "left")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_exact"),
                F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"),
                (
                    F.sum(F.coalesce("hit", F.lit(0))).cast("double")
                    / F.count(F.lit(1))
                ).alias("mean_recall"),
            )
            .select(F.lit(np_).alias("nprobe"), "n_exact", "n_hits", "mean_recall")
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# Contrastive negative-sampling audit: deterministic negatives + the
# false-negative (label-collision) rate that poisons InfoNCE training.
# ---------------------------------------------------------------------------
NEG_K = 5


def _neg_audit_oracle() -> str:
    from ..functions.hashing import sql_hash48

    h = sql_hash48(
        "CAST(query_id AS VARCHAR) || '#' || CAST(j AS VARCHAR)"
    )
    return f"""
    WITH corpus AS (
        SELECT vec_id, label,
               row_number() OVER (ORDER BY vec_id) - 1 AS pos
        FROM embeddings
    ), n AS (
        SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM corpus
    ), q AS (
        SELECT vec_id AS query_id, label AS q_label
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ), draws AS (
        SELECT q.query_id, q.q_label, j.j,
               {h} % n.n_corpus AS pos
        FROM q CROSS JOIN n
        CROSS JOIN (SELECT unnest(generate_series(0, {NEG_K - 1})) AS j) j
    ), negs AS (
        SELECT d.query_id, d.q_label, c.vec_id AS neg_id, c.label AS n_label
        FROM draws d JOIN corpus c ON c.pos = d.pos
        WHERE c.vec_id <> d.query_id
    )
    SELECT query_id,
           CAST(count(*) AS BIGINT) AS n_negatives,
           CAST(count(*) FILTER (WHERE n_label = q_label) AS BIGINT)
               AS n_label_collisions,
           CAST(count(*) FILTER (WHERE n_label = q_label) AS DOUBLE)
               / count(*) AS collision_rate
    FROM negs GROUP BY query_id
    """


@query("contrastive_negative_audit", oracle=_neg_audit_oracle())
def contrastive_negative_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative sampling for contrastive training, audited: each query
    draws 5 DETERMINISTIC uniform negatives (hash of (query, draw) →
    corpus position — reproducible across runs and engines, no RNG
    state), and the audit reports how many drawn "negatives" actually
    share the anchor's label — the false-negative rate that silently
    caps InfoNCE embedding quality and motivates label-aware or
    hard-negative mining. Accidental self-draws are excluded (so
    n_negatives can dip below 5 — visible, not silently resampled).

    Plan: position assignment is one corpus-ordered row_number (a
    vector-table-sized window, same posture as top-V ranks); draws are
    queries × 5 rows joining the corpus on position; all counts exact
    integers, one division. At 100 TB the corpus side would pre-store
    positions (a layout column), making this a pure equi-join probe."""
    from ..functions.hashing import hash48

    emb = load_table(spark, sf_dir, "embeddings")
    w = Window.orderBy("vec_id")
    corpus = emb.select(
        "vec_id", "label", (F.row_number().over(w) - 1).alias("pos")
    ).persist()
    corpus.count()
    n = corpus.agg(F.count(F.lit(1)).cast("long").alias("n_corpus"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    draws = (
        q.crossJoin(F.broadcast(n))
        .crossJoin(
            F.broadcast(
                emb.sparkSession.range(NEG_K).select(
                    F.col("id").cast("int").alias("j")
                )
            )
        )
        .select(
            "query_id",
            "q_label",
            (
                hash48(
                    F.concat_ws(
                        "#",
                        F.col("query_id").cast("string"),
                        F.col("j").cast("string"),
                    )
                )
                % F.col("n_corpus")
            ).alias("pos"),
        )
    )
    negs = draws.join(F.broadcast(corpus), "pos").filter(
        F.col("vec_id") != F.col("query_id")
    )
    return negs.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_negatives"),
        F.sum((F.col("label") == F.col("q_label")).cast("int"))
        .cast("long")
        .alias("n_label_collisions"),
        (
            F.sum((F.col("label") == F.col("q_label")).cast("int")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("collision_rate"),
    )


# ---------------------------------------------------------------------------
# One Lloyd iteration of k-means, with the objective decrease measured —
# the iterative-ML training step, engine-exact.
# ---------------------------------------------------------------------------
def _sql_d2(v: str, c: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {DIM}), "
        f"__i -> (CAST({v}[__i] AS DOUBLE) - {c}[__i])"
        f" * (CAST({v}[__i] AS DOUBLE) - {c}[__i])))"
    )


@query(
    "kmeans_lloyd_iteration",
    oracle=f"""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding, __x -> CAST(__x AS DOUBLE)) AS v
        FROM embeddings
    ), cent0 AS (
        SELECT vec_id - {N_QUERIES} AS cell_id, v AS c
        FROM base
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CELLS}
    ), a0 AS (
        SELECT vec_id, v, cell_id, d2 FROM (
            SELECT b.vec_id, b.v, c.cell_id,
                   {_sql_d2('b.v', 'c.c')} AS d2,
                   row_number() OVER (
                       PARTITION BY b.vec_id
                       ORDER BY {_sql_d2('b.v', 'c.c')}, c.cell_id) AS rn
            FROM base b CROSS JOIN cent0 c
        ) WHERE rn = 1
    ), obj0 AS (
        SELECT cell_id,
               CAST(count(*) AS BIGINT) AS n_before,
               CAST(sum(CAST(round(d2 * {_FXP_SCALE}) AS BIGINT))
                    AS BIGINT) AS q0
        FROM a0 GROUP BY cell_id
    ), qd AS (
        SELECT a0.cell_id,
               unnest(generate_series(1, {DIM})) AS dim,
               a0.v
        FROM a0
    ), means AS (
        SELECT cell_id, dim,
               CAST(sum(CAST(round(v[dim] * {_FXP_SCALE}) AS BIGINT))
                    AS DOUBLE)
                   / (count(*) * {_FXP_SCALE}) AS m
        FROM qd GROUP BY cell_id, dim
    ), cent1 AS (
        SELECT c0.cell_id,
               coalesce(mn.arr, c0.c) AS c
        FROM cent0 c0
        LEFT JOIN (
            SELECT cell_id,
                   list_transform(
                       list_sort(list(struct_pack(dim := dim, m := m))),
                       __x -> __x.m) AS arr
            FROM means GROUP BY cell_id
        ) mn ON mn.cell_id = c0.cell_id
    ), a1 AS (
        SELECT vec_id, cell_id, d2 FROM (
            SELECT b.vec_id, c.cell_id,
                   {_sql_d2('b.v', 'c.c')} AS d2,
                   row_number() OVER (
                       PARTITION BY b.vec_id
                       ORDER BY {_sql_d2('b.v', 'c.c')}, c.cell_id) AS rn
            FROM base b CROSS JOIN cent1 c
        ) WHERE rn = 1
    ), obj1 AS (
        SELECT cell_id,
               CAST(count(*) AS BIGINT) AS n_after,
               CAST(sum(CAST(round(d2 * {_FXP_SCALE}) AS BIGINT))
                    AS BIGINT) AS q1
        FROM a1 GROUP BY cell_id
    )
    SELECT c0.cell_id,
           CAST(coalesce(o0.n_before, 0) AS BIGINT) AS n_before,
           CAST(coalesce(o1.n_after, 0) AS BIGINT) AS n_after,
           CAST(coalesce(o0.q0, 0) AS DOUBLE) / {_FXP_SCALE} AS obj_before,
           CAST(coalesce(o1.q1, 0) AS DOUBLE) / {_FXP_SCALE} AS obj_after
    FROM cent0 c0
    LEFT JOIN obj0 o0 ON o0.cell_id = c0.cell_id
    LEFT JOIN obj1 o1 ON o1.cell_id = c0.cell_id
    """,
)
def kmeans_lloyd_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd iteration of k-means over the embedding corpus —
    assignment → fixed-point centroid update → re-assignment — with the
    within-cluster sum of squares reported per cell BEFORE and AFTER,
    so the monotone objective decrease (Lloyd's convergence guarantee)
    is a measured, property-tested fact, not a comment. Seeds are the
    deterministic IVF centroid slice; this IS the training step that
    would produce real IVF/PQ codebooks from the engine's own
    machinery.

    Engine-exactness, stage by stage: distances fold in index order
    (bit-identical doubles → identical argmins, ties on cell_id);
    centroid updates are the emb_centroids discipline (2^-20 quantized
    coords, plain integer sums — order-free, partial-aggregatable, no
    per-group list state); objectives quantize each distance² to the
    same grid and integer-sum, so even the objective is order-free.
    Empty cells keep their previous centroid (visible as n_before = 0).

    Plan: two broadcast-centroid assignment passes (map-side N×K
    distance math + per-vector argmin window) and ONE (cell, dim)-keyed
    integer-sum shuffle for the update — the canonical distributed
    k-means step; iterating = looping this plan with cent1 fed back,
    exactly the bounded-rounds pattern of kcore/HITS."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).persist()
    base.count()
    cent0 = base.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + N_CELLS)
    ).select(
        (F.col("vec_id") - N_QUERIES).alias("cell_id"), F.col("v").alias("c")
    )

    def d2(v: Column, c: Column) -> Column:
        return F.aggregate(
            F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    def assign(cent: DataFrame) -> DataFrame:
        w = Window.partitionBy("vec_id").orderBy("d2", "cell_id")
        return (
            base.crossJoin(F.broadcast(cent))
            .select(
                "vec_id",
                "v",
                "cell_id",
                d2(F.col("v"), F.col("c")).alias("d2"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    a0 = assign(cent0).persist()
    a0.count()  # objective branch AND the update read it
    qd2 = F.expr(f"CAST(round(d2 * {_FXP_SCALE}) AS BIGINT)")
    obj0 = a0.groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_before"),
        F.sum(qd2).cast("long").alias("q0"),
    )
    means = (
        a0.select(
            "cell_id", F.posexplode("v").alias("dim0", "x")
        )
        .groupBy("cell_id", "dim0")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_fxp_q(F.col("x"), "kmeans_lloyd_iteration")).alias("sq"),
        )
        .select(
            "cell_id",
            "dim0",
            (F.col("sq").cast("double") / (F.col("n") * _FXP_SCALE)).alias("m"),
        )
    )
    mean_arrs = means.groupBy("cell_id").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(dim0, m))), x -> x.m)"
        ).alias("arr")
    )
    cent1 = cent0.join(mean_arrs, "cell_id", "left").select(
        "cell_id", F.coalesce("arr", F.col("c")).alias("c")
    )
    a1 = assign(cent1)
    obj1 = a1.groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_after"),
        F.sum(qd2).cast("long").alias("q1"),
    )
    return (
        cent0.select("cell_id")
        .join(obj0, "cell_id", "left")
        .join(obj1, "cell_id", "left")
        .select(
            "cell_id",
            F.coalesce("n_before", F.lit(0)).cast("long").alias("n_before"),
            F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
            (F.coalesce("q0", F.lit(0)).cast("double") / F.lit(_FXP_SCALE)).alias(
                "obj_before"
            ),
            (F.coalesce("q1", F.lit(0)).cast("double") / F.lit(_FXP_SCALE)).alias(
                "obj_after"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Embedding isotropy health: off-diagonal covariance mass ratio.
# ---------------------------------------------------------------------------
@query(
    "emb_covariance_offdiag_mass",
    oracle=f"""
    WITH x AS (
        SELECT vec_id, unnest(generate_series(1, {DIM})) AS i, embedding
        FROM embeddings
    ), v AS (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS xi FROM x
    ), n AS (
        SELECT CAST(count(*) AS DOUBLE) AS nv FROM embeddings
    ), vq0 AS (
        SELECT vec_id, i, CAST(round(xi * {_FXP_SCALE}) AS BIGINT) AS q0
        FROM v
    ), mu AS (
        SELECT i, CAST(CAST(sum(q0) AS BIGINT) AS DOUBLE)
                      / (nv * {_FXP_SCALE}) AS m
        FROM vq0 CROSS JOIN n GROUP BY i, nv
    ), xc AS (
        SELECT v.vec_id, v.i,
               CAST(round((v.xi - mu.m) * {_FXP_SCALE}) AS BIGINT) AS q
        FROM v JOIN mu ON mu.i = v.i
    ), cov AS (
        SELECT a.i AS i, b.i AS j,
               CAST(sum(a.q * b.q) AS BIGINT) AS s
        FROM xc a JOIN xc b ON a.vec_id = b.vec_id
        GROUP BY a.i, b.i
    ), mass AS (
        SELECT
            CAST(sum(CAST(abs(s) AS DECIMAL(38,0)))
                 FILTER (WHERE i = j) AS DOUBLE) AS diag,
            CAST(sum(CAST(abs(s) AS DECIMAL(38,0)))
                 FILTER (WHERE i <> j) AS DOUBLE) AS offdiag
        FROM cov
    )
    SELECT CAST({DIM} AS BIGINT) AS n_dims,
           diag / {_FXP_SCALE_SQ} AS diag_mass,
           offdiag / {_FXP_SCALE_SQ} AS offdiag_mass,
           offdiag / (diag * {DIM - 1}.0) AS anisotropy
    FROM mass
    """,
)
def emb_covariance_offdiag_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy health: |off-diagonal| covariance mass against
    the diagonal (variance) mass, normalized per off-diagonal cell —
    the representation-collapse smoke test. An isotropic embedding
    space has anisotropy near zero (dimensions decorrelated, the
    whitened ideal contrastive training aims for); a collapsing one
    concentrates mass off-diagonal as dimensions co-vary. Reuses
    emb_pca_top_component's exact covariance discipline without the
    eigen-iteration, so the health check is strictly cheaper than the
    diagnosis.

    Exactness: both masses are sums of |integer covariance numerators|
    (centered coordinates quantized to the 2^-20 grid, per-cell sums
    plain integer) accumulated in DECIMAL(38,0) — order-free end to
    end; the two final divisions are the only float ops beyond the
    mean-centering step.

    Plan: ONE (i,j)-keyed shuffle of integer products (the N·DIM²
    covariance pass, partial-aggregatable map-side) then a 2-cell
    rollup of the DIM²-row table. At 100 TB identical posture to the
    registered PCA — this is its first stage plus a constant-size
    reduction."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("i0", "xif")
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.col("xif").cast("double").alias("xi"),
    )
    n = emb.agg(F.count(F.lit(1)).cast("double").alias("nv"))
    mu = (
        x.select("i", F.expr(f"CAST(round(xi * {_FXP_SCALE}) AS BIGINT)").alias("q0"))
        .groupBy("i")
        .agg(F.sum("q0").cast("long").alias("sq"))
        .crossJoin(F.broadcast(n))
        .select("i", (F.col("sq").cast("double") / (F.col("nv") * _FXP_SCALE)).alias("m"))
    )
    xc = x.join(F.broadcast(mu), "i").select(
        "vec_id",
        "i",
        _fxp_q(F.col("xi") - F.col("m"), "emb_covariance_offdiag_mass").alias(
            "q"
        ),
    ).persist()
    xc.count()  # both sides of the self-join read it
    a = xc.select("vec_id", F.col("i").alias("ai"), F.col("q").alias("aq"))
    b = xc.select("vec_id", F.col("i").alias("bj"), F.col("q").alias("bq"))
    cov = (
        a.join(b, "vec_id")
        .groupBy("ai", "bj")
        .agg(F.sum(F.col("aq") * F.col("bq")).cast("long").alias("s"))
    )
    mass = cov.agg(
        F.sum(
            F.when(F.col("ai") == F.col("bj"), F.abs("s").cast("decimal(38,0)"))
        ).alias("diag"),
        F.sum(
            F.when(F.col("ai") != F.col("bj"), F.abs("s").cast("decimal(38,0)"))
        ).alias("offdiag"),
    )
    return mass.select(
        F.lit(DIM).cast("long").alias("n_dims"),
        (F.col("diag").cast("double") / F.lit(_FXP_SCALE_SQ)).alias("diag_mass"),
        (F.col("offdiag").cast("double") / F.lit(_FXP_SCALE_SQ)).alias(
            "offdiag_mass"
        ),
        (
            F.col("offdiag").cast("double")
            / (F.col("diag").cast("double") * F.lit(float(DIM - 1)))
        ).alias("anisotropy"),
    )


# ---------------------------------------------------------------------------
# Effective dimensionality (participation ratio) — how many dimensions the
# embedding space actually uses.
# ---------------------------------------------------------------------------
@query(
    "emb_effective_rank",
    oracle=f"""
    WITH x AS (
        SELECT vec_id, unnest(generate_series(1, {DIM})) AS i, embedding
        FROM embeddings
    ), v AS (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS xi FROM x
    ), n AS (
        SELECT CAST(count(*) AS DOUBLE) AS nv FROM embeddings
    ), vq0 AS (
        SELECT vec_id, i, CAST(round(xi * {_FXP_SCALE}) AS BIGINT) AS q0
        FROM v
    ), mu AS (
        SELECT i, CAST(CAST(sum(q0) AS BIGINT) AS DOUBLE)
                      / (nv * {_FXP_SCALE}) AS m
        FROM vq0 CROSS JOIN n GROUP BY i, nv
    ), xc AS (
        SELECT v.vec_id, v.i,
               CAST(round((v.xi - mu.m) * {_FXP_SCALE}) AS BIGINT) AS q
        FROM v JOIN mu ON mu.i = v.i
    ), cov AS (
        SELECT a.i AS i, b.i AS j,
               CAST(sum(a.q * b.q) AS BIGINT) AS s
        FROM xc a JOIN xc b ON a.vec_id = b.vec_id
        GROUP BY a.i, b.i
    ), agg AS (
        SELECT CAST(sum(s) FILTER (WHERE i = j) AS BIGINT) AS tr,
               CAST(CAST(sum(CAST(s AS DECIMAL(38,0)) * s) AS VARCHAR)
                    AS DOUBLE) AS ss
        FROM cov
    )
    SELECT CAST({DIM} AS BIGINT) AS n_dims,
           CAST(tr AS DOUBLE) * CAST(tr AS DOUBLE) / ss
               AS effective_rank,
           CAST(tr AS DOUBLE) * CAST(tr AS DOUBLE) / ss
               / CAST({DIM} AS DOUBLE) AS rank_fraction
    FROM agg
    """,
)
def emb_effective_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective dimensionality of the embedding space via the
    participation ratio PR = (tr C)² / tr(C²) = (Σλ)²/Σλ² — equal to
    DIM when variance spreads evenly over dimensions and to 1 under
    total collapse, WITHOUT computing a single eigenvalue (tr(C²) is
    just Σ_ij C_ij², so the whole estimate falls out of the covariance
    numerators). The single-number companion to
    emb_covariance_offdiag_mass's anisotropy and emb_pca_top_component's
    leading direction: anisotropy says dimensions co-vary, this says
    how many INDEPENDENT directions survive — the intrinsic-dimension
    audit run before sizing a PQ codebook or a Matryoshka prefix.

    Exactness: the fixed common scale (FXP²·n) cancels in the ratio, so
    PR computes directly on the INTEGER covariance numerators: tr is a
    BIGINT sum (int64→double correctly rounded), Σs² accumulates in
    DECIMAL(38,0) and converts through VARCHAR on both engines (the
    HUGEINT→DOUBLE rounding trap), then (tr·tr)/ss is a pinned
    multiply+divide of identical doubles.

    Plan: the covariance pass (one (i,j)-keyed integer-product shuffle,
    map-side partial) plus a 1-row reduction of the DIM²-cell table."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("i0", "xif")
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.col("xif").cast("double").alias("xi"),
    )
    n = emb.agg(F.count(F.lit(1)).cast("double").alias("nv"))
    mu = (
        x.select(
            "i",
            F.expr(f"CAST(round(xi * {_FXP_SCALE}) AS BIGINT)").alias("q0"),
        )
        .groupBy("i")
        .agg(F.sum("q0").cast("long").alias("sq"))
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            (F.col("sq").cast("double") / (F.col("nv") * _FXP_SCALE)).alias(
                "m"
            ),
        )
    )
    xc = (
        x.join(F.broadcast(mu), "i")
        .select(
            "vec_id",
            "i",
            _fxp_q(F.col("xi") - F.col("m"), "emb_effective_rank").alias("q"),
        )
        .persist()
    )
    xc.count()  # both sides of the self-join read it
    a = xc.select("vec_id", F.col("i").alias("ai"), F.col("q").alias("aq"))
    b = xc.select("vec_id", F.col("i").alias("bj"), F.col("q").alias("bq"))
    cov = (
        a.join(b, "vec_id")
        .groupBy("ai", "bj")
        .agg(F.sum(F.col("aq") * F.col("bq")).cast("long").alias("s"))
    )
    agg = cov.agg(
        F.sum(F.when(F.col("ai") == F.col("bj"), F.col("s")))
        .cast("long")
        .alias("tr"),
        F.expr(
            "CAST(CAST(sum(CAST(s AS DECIMAL(38,0)) * s) AS STRING)"
            " AS DOUBLE)"
        ).alias("ss"),
    )
    pr = (
        F.col("tr").cast("double") * F.col("tr").cast("double") / F.col("ss")
    )
    return agg.select(
        F.lit(DIM).cast("long").alias("n_dims"),
        pr.alias("effective_rank"),
        (pr / F.lit(float(DIM))).alias("rank_fraction"),
    )


# ---------------------------------------------------------------------------
# Fisher discriminant ratio: is the label structure actually separable?
# ---------------------------------------------------------------------------
@query(
    "emb_fisher_ratio",
    oracle=f"""
    WITH x AS (
        SELECT label, vec_id,
               unnest(generate_series(1, {DIM})) AS i, embedding
        FROM embeddings
    ), q AS (
        SELECT label, i,
               CAST(round(CAST(embedding[i] AS DOUBLE) * {_FXP_SCALE})
                    AS BIGINT) AS qv
        FROM x
    ), cls AS (
        SELECT label, i,
               CAST(count(*) AS BIGINT) AS n_c,
               CAST(sum(qv) AS BIGINT) AS s_c,
               CAST(sum(CAST(qv AS DECIMAL(38,0)) * qv) AS DOUBLE) AS ss_c
        FROM q GROUP BY label, i
    ), tot AS (
        SELECT i,
               CAST(sum(n_c) AS BIGINT) AS n,
               CAST(sum(s_c) AS BIGINT) AS s
        FROM cls GROUP BY i
    ), per_dim AS (
        -- within = Σ_c (ss_c - s_c²/n_c); between = Σ_c n_c·(μ_c - μ)²
        --        = Σ_c s_c²/n_c - s²/n  (all from the same exact sums)
        SELECT c.i,
               sum(c.ss_c - CAST(c.s_c AS DOUBLE) * c.s_c / c.n_c)
                   AS within_q,
               sum(CAST(c.s_c AS DOUBLE) * c.s_c / c.n_c) AS cross_q,
               max(CAST(t.s AS DOUBLE) * t.s / t.n) AS grand_q
        FROM cls c JOIN tot t ON t.i = c.i
        GROUP BY c.i
    ), folded AS (
        SELECT CAST(count(*) AS BIGINT) AS n_dims,
               list_reduce([0.0] || list_transform(
                   list_sort(list(struct_pack(i := i, w := within_q))),
                   __x -> __x.w), (a, b) -> a + b) AS within_mass,
               list_reduce([0.0] || list_transform(
                   list_sort(list(struct_pack(i := i,
                                              b := cross_q - grand_q))),
                   __x -> __x.b), (a, b) -> a + b) AS between_mass
        FROM per_dim
    )
    SELECT n_dims,
           round(within_mass / {_FXP_SCALE_SQ}, 6) AS within_mass,
           round(between_mass / {_FXP_SCALE_SQ}, 6) AS between_mass,
           round(between_mass / nullif(within_mass, 0.0), 6)
               AS fisher_ratio
    FROM folded
    """,
)
def emb_fisher_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher discriminant ratio of the labeled embedding space:
    between-class scatter over within-class scatter, summed across
    dimensions — the one-number answer to "is there actually label
    structure in these vectors?" that should be read BEFORE trusting
    knn_classify's accuracy or nearest_centroid_confusion's diagonal.
    Near zero = labels are noise in this space; large = linearly
    separable structure.

    Exactness: every scatter term derives from the same exact integer
    sums (2^-20-quantized coordinates; Σq and Σq² per (label, dim),
    the ss in DECIMAL) via the algebraic identities within =
    Σ(ss_c − s_c²/n_c), between = Σs_c²/n_c − s²/n — per-dim values
    are pinned doubles, the DIM-bounded cross-dimension fold runs in
    sorted dim order (entropy_fold discipline), outputs round to 6 dp.

    Plan: ONE (label, dim)-keyed shuffle of integer partials (the
    emb_centroids shape carrying one extra ss column), a dim-keyed
    rollup over label×DIM rows, one bounded fold. Strictly cheaper
    than any classifier it sanity-checks."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "label", F.posexplode("embedding").alias("i0", "xif")
    ).select(
        "label",
        (F.col("i0") + 1).alias("i"),
        F.col("xif").cast("double").alias("xi"),
    )
    q = x.select(
        "label", "i", _fxp_q(F.col("xi"), "emb_fisher_ratio").alias("qv")
    )
    cls = q.groupBy("label", "i").agg(
        F.count(F.lit(1)).cast("long").alias("n_c"),
        F.sum("qv").cast("long").alias("s_c"),
        F.sum(F.col("qv").cast("decimal(38,0)") * F.col("qv"))
        .cast("double")
        .alias("ss_c"),
    )
    tot = cls.groupBy("i").agg(
        F.sum("n_c").cast("long").alias("n"),
        F.sum("s_c").cast("long").alias("s"),
    )
    per_dim = (
        cls.join(tot, "i")
        .groupBy("i")
        .agg(
            F.sum(
                F.col("ss_c")
                - F.col("s_c").cast("double") * F.col("s_c") / F.col("n_c")
            ).alias("within_q"),
            F.sum(
                F.col("s_c").cast("double") * F.col("s_c") / F.col("n_c")
            ).alias("cross_q"),
            F.max(
                F.col("s").cast("double") * F.col("s") / F.col("n")
            ).alias("grand_q"),
        )
    )
    folded = per_dim.agg(
        F.count(F.lit(1)).cast("long").alias("n_dims"),
        F.expr(
            "aggregate(transform(sort_array(collect_list("
            "struct(i, within_q AS w))), x -> x.w),"
            " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("within_mass"),
        F.expr(
            "aggregate(transform(sort_array(collect_list("
            "struct(i, cross_q - grand_q AS b))), x -> x.b),"
            " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("between_mass"),
    )
    return folded.select(
        "n_dims",
        F.round(F.col("within_mass") / F.lit(_FXP_SCALE_SQ), 6).alias(
            "within_mass"
        ),
        F.round(F.col("between_mass") / F.lit(_FXP_SCALE_SQ), 6).alias(
            "between_mass"
        ),
        F.round(
            F.col("between_mass") / F.nullif(F.col("within_mass"), F.lit(0.0)),
            6,
        ).alias("fisher_ratio"),
    )


# ---------------------------------------------------------------------------
# NDCG@k of the IVF index against brute-force truth — graded ranking
# quality, where recall@k only counts set overlap.
# ---------------------------------------------------------------------------
def _ndcg_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH truth AS MATERIALIZED ({ORACLES['sim_cosine_topk_bruteforce']}),
    appr AS MATERIALIZED ({ORACLES['sim_cosine_topk_ivf']}),
    t AS (
        SELECT query_id, vec_id,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, vec_id) AS BIGINT) AS rt
        FROM truth
    ), a AS (
        SELECT query_id, vec_id,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, vec_id) AS BIGINT) AS ra
        FROM appr
    ), j AS (
        SELECT a.query_id, a.ra, t.rt
        FROM a LEFT JOIN t ON t.query_id = a.query_id
         AND t.vec_id = a.vec_id
    ), d AS (
        SELECT query_id,
               CAST(count(rt) AS BIGINT) AS n_hit,
               sum(CASE WHEN rt IS NULL THEN 0.0
                        ELSE CAST({TOPK} - rt + 1 AS DOUBLE)
                             / CAST(1 << (ra - 1) AS DOUBLE) END) AS dcg
        FROM j GROUP BY query_id
    ), i AS (
        SELECT query_id,
               sum(CAST({TOPK} - rt + 1 AS DOUBLE)
                   / CAST(1 << (rt - 1) AS DOUBLE)) AS idcg
        FROM t GROUP BY query_id
    )
    SELECT d.query_id, d.n_hit, d.dcg, i.idcg,
           d.dcg / i.idcg AS ndcg
    FROM d JOIN i ON i.query_id = d.query_id
    """


@query("sim_ndcg_ivf", oracle=_ndcg_oracle())
def sim_ndcg_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@k of the IVF ranking against brute-force truth — the GRADED
    ranking audit: sim_recall_ivf counts set overlap only, but an index
    that returns the right 10 vectors in the wrong order still degrades
    downstream rerankers. Relevance of an approximate hit = its reversed
    truth rank (k − rt + 1, misses 0); positions are discounted
    EXPONENTIALLY (gain/2^(i−1)) rather than by the textbook 1/log2(i+1):
    the dyadic discount makes every term an exact dyadic rational
    (integer / 2^(i−1)), so DCG sums are bit-exact on both engines with
    NO transcendental evaluation and NO fold-order pinning needed —
    addition of dyadics with bounded exponent range is associative-exact.
    NDCG = DCG/IDCG is then ONE division per query.

    Plan: composes the two REGISTERED queries (index build + search cost
    dominates); both re-rank windows run over k-row-per-query lists and
    the hit join is (query_id, vec_id)-keyed at query-set scale."""
    from ..registry import QUERIES

    truth = QUERIES["sim_cosine_topk_bruteforce"](spark, sf_dir)
    appr = QUERIES["sim_cosine_topk_ivf"](spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    t = truth.select(
        "query_id", "vec_id", F.row_number().over(w).cast("long").alias("rt")
    )
    a = appr.select(
        "query_id", "vec_id", F.row_number().over(w).cast("long").alias("ra")
    )
    j = a.join(t, ["query_id", "vec_id"], "left")
    gain = (F.lit(TOPK) - F.col("rt") + 1).cast("double")
    d = j.groupBy("query_id").agg(
        F.count("rt").cast("long").alias("n_hit"),
        F.sum(
            F.when(F.col("rt").isNull(), F.lit(0.0)).otherwise(
                gain / F.expr("CAST(shiftleft(1, ra - 1) AS DOUBLE)")
            )
        ).alias("dcg"),
    )
    i = t.groupBy("query_id").agg(
        F.sum(
            gain / F.expr("CAST(shiftleft(1, rt - 1) AS DOUBLE)")
        ).alias("idcg")
    )
    return d.join(i, "query_id").select(
        "query_id",
        "n_hit",
        "dcg",
        "idcg",
        (F.col("dcg") / F.col("idcg")).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# Hubness of the embedding space: k-occurrence skewness over the bucketed
# kNN graph — the intrinsic-dimensionality health check for ANN indexes.
# ---------------------------------------------------------------------------
HUB_K = 5  # neighbors per vector in the k-occurrence graph


@query(
    "emb_hubness",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, embedding, {_sql_norm('embedding')} AS nrm,
               {_sql_bucket('embedding')} AS bucket
        FROM embeddings
    ), knn AS (
        SELECT b_id FROM (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY round({_sql_dot('a.embedding', 'b.embedding')}
                                      / (a.nrm * b.nrm), 4) DESC,
                                b.vec_id) AS rn
            FROM base a JOIN base b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        ) WHERE rn <= {HUB_K}
    ), occ AS (
        SELECT base.vec_id,
               CAST(coalesce(c.n, 0) AS BIGINT) AS c
        FROM base LEFT JOIN (
            SELECT b_id, CAST(count(*) AS BIGINT) AS n
            FROM knn GROUP BY b_id
        ) c ON c.b_id = base.vec_id
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s1,
               CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS BIGINT) AS s2,
               CAST(sum(CAST(c AS DECIMAL(38,0)) * c * c) AS BIGINT) AS s3,
               CAST(max(c) AS BIGINT) AS c_max,
               CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_isolated
        FROM occ
    )
    SELECT n AS n_vectors, CAST({HUB_K} AS BIGINT) AS k,
           CAST(s1 AS DOUBLE) / n AS mean_kocc,
           c_max AS max_kocc, n_isolated,
           CAST(CAST(n AS DECIMAL(38,0)) * n * s3
                - 3 * CAST(n AS DECIMAL(38,0)) * s1 * s2
                + 2 * CAST(s1 AS DECIMAL(38,0)) * s1 * s1 AS DOUBLE)
               / (CAST(n AS DOUBLE) * n * n)
               / nullif(
                   (CAST(CAST(n AS DECIMAL(38,0)) * s2
                         - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
                    / (CAST(n AS DOUBLE) * n))
                   * sqrt(CAST(CAST(n AS DECIMAL(38,0)) * s2
                               - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
                          / (CAST(n AS DOUBLE) * n)), 0.0) AS skew_kocc
    FROM m
    """,
)
def emb_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit: the k-occurrence distribution of the (bucketed) kNN
    graph — how often each vector appears in other vectors' top-k. High
    intrinsic dimensionality concentrates in-degree on a few "hub"
    vectors (skewness >> 0) and strands "anti-hubs" (n_isolated), which
    silently degrades kNN classifiers, ANN recall, and dedup-by-cosine.
    Neighbor lists come from the SAME sign-LSH bucketing the index ops
    use, so the audit measures the graph those operators actually see.

    Exactness: in-degrees c are exact integers (zeros included via the
    corpus left join — dropping them would bias every moment); raw
    moments S1..S3 are integer sums with DECIMAL-routed products; mean,
    m2, m3 and Fisher skewness g1 = m3/m2^1.5 assemble from pinned
    divisions (m2·√m2 avoids pow). Max and isolation count are exact.

    Plan: the kNN build is the bucket-equi-join + per-vector top-k
    window (no cross product — dedup_embedding_cosine's shape); the
    k-occurrence rollup keys on the neighbor id; the moment pass is one
    partial-aggregatable reduction. At 100 TB the bucket join IS the
    scalable surrogate for exact all-pairs kNN; more planes shrink
    buckets to keep the join linear."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        _bucket_expr(F.col("embedding")).alias("bucket"),
    ).persist()
    base.count()  # materialize: both join sides + the zero join read this
    a = base.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
        "bucket",
    )
    b = base.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
        "bucket",
    )
    cos = F.round(
        _dot(F.col("a_emb"), F.col("b_emb")) / (F.col("a_nrm") * F.col("b_nrm")),
        4,
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("cosine"), F.asc("b_id"))
    knn = (
        a.join(b, ["bucket"])
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HUB_K)
    )
    counts = knn.groupBy("b_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    occ = (
        base.select("vec_id")
        .join(counts, base["vec_id"] == counts["b_id"], "left")
        .select(
            "vec_id", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("c")
        )
    )
    m = occ.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("long")
        .alias("s2"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c"))
        .cast("long")
        .alias("s3"),
        F.max("c").cast("long").alias("c_max"),
        F.sum(F.when(F.col("c") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_isolated"),
    )
    nd = F.col("n").cast("double")
    m2 = (
        (
            F.col("n").cast("decimal(38,0)") * F.col("s2")
            - F.col("s1").cast("decimal(38,0)") * F.col("s1")
        ).cast("double")
        / (nd * F.col("n"))
    )
    m3 = (
        (
            F.col("n").cast("decimal(38,0)") * F.col("n") * F.col("s3")
            - 3 * F.col("n").cast("decimal(38,0)") * F.col("s1") * F.col("s2")
            + 2 * F.col("s1").cast("decimal(38,0)") * F.col("s1") * F.col("s1")
        ).cast("double")
        / (nd * F.col("n") * F.col("n"))
    )
    return m.select(
        F.col("n").alias("n_vectors"),
        F.lit(HUB_K).cast("long").alias("k"),
        (F.col("s1").cast("double") / F.col("n")).alias("mean_kocc"),
        F.col("c_max").alias("max_kocc"),
        "n_isolated",
        (m3 / F.nullif(m2 * F.sqrt(m2), F.lit(0.0))).alias("skew_kocc"),
    )


# ---------------------------------------------------------------------------
# Label-noise audit: kNN label disagreement over the whole corpus.
# ---------------------------------------------------------------------------
@query(
    "knn_label_noise",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, label, embedding, {_sql_norm('embedding')} AS nrm,
               {_sql_bucket('embedding')} AS bucket
        FROM embeddings
    ), knn AS (
        SELECT a_id, b_id FROM (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY round({_sql_dot('a.embedding', 'b.embedding')}
                                      / (a.nrm * b.nrm), 4) DESC,
                                b.vec_id) AS rn
            FROM base a JOIN base b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        ) WHERE rn <= {HUB_K}
    ), votes AS (
        SELECT k.a_id, nb.label, CAST(count(*) AS BIGINT) AS n_votes
        FROM knn k JOIN base nb ON nb.vec_id = k.b_id
        GROUP BY k.a_id, nb.label
    ), pred AS (
        SELECT a_id,
               CAST((min(struct_pack(negv := -n_votes, lab := label))).lab
                    AS INTEGER) AS knn_label
        FROM votes GROUP BY a_id
    )
    SELECT b.label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(count(p.knn_label) AS BIGINT) AS n_scored,
           CAST(coalesce(sum(CASE WHEN p.knn_label IS NOT NULL
                                   AND p.knn_label <> b.label
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_disagree,
           CAST(coalesce(sum(CASE WHEN p.knn_label IS NOT NULL
                                   AND p.knn_label <> b.label
                             THEN 1 ELSE 0 END), 0) AS DOUBLE)
               / nullif(CAST(count(p.knn_label) AS DOUBLE), 0.0)
               AS disagree_rate
    FROM base b LEFT JOIN pred p ON p.a_id = b.vec_id
    GROUP BY b.label
    """,
)
def knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit: every vector's own label vs the majority label
    of its k nearest (bucketed) neighbors — the standard kNN-
    disagreement estimator for mislabeled training examples (confident-
    learning's cheap cousin). Per-label disagreement rates localize
    which class's labels are suspect; on this fixture labels are random,
    so rates sit near the (1 − 1/n_labels) chance line — the honest
    reading, asserted in the property replay.

    Composes the SAME bucketed-kNN graph as emb_hubness (one definition
    of "neighbor" across the audit family) and knn_classify's
    deterministic majority vote (ties → smaller label). Vectors whose
    bucket holds no neighbor are counted (n_vectors − n_scored) but
    excluded from the rate's denominator.

    Exactness: votes/majorities/disagreements are exact integers; the
    rate is ONE division. Plan: bucket equi-join + per-vector top-k
    window (never a cross product), one vote rollup keyed on (vector,
    label), one struct-min argmax, one label-keyed report rollup."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        "label",
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        _bucket_expr(F.col("embedding")).alias("bucket"),
    ).persist()
    base.count()  # both kNN sides, the label probe, and the report read it
    a = base.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
        "bucket",
    )
    b = base.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
        "bucket",
    )
    cos = F.round(
        _dot(F.col("a_emb"), F.col("b_emb")) / (F.col("a_nrm") * F.col("b_nrm")),
        4,
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("cosine"), F.asc("b_id"))
    knn = (
        a.join(b, ["bucket"])
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HUB_K)
        .select("a_id", "b_id")
    )
    votes = (
        knn.join(
            base.select(F.col("vec_id").alias("b_id"), "label"), "b_id"
        )
        .groupBy("a_id", "label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_votes"))
    )
    pred = votes.groupBy("a_id").agg(
        F.min(
            F.struct(
                (-F.col("n_votes")).alias("negv"), F.col("label").alias("lab")
            )
        )["lab"]
        .cast("int")
        .alias("knn_label")
    )
    joined = base.select("vec_id", "label").join(
        pred, base["vec_id"] == pred["a_id"], "left"
    )
    disagree = F.when(
        F.col("knn_label").isNotNull()
        & (F.col("knn_label") != F.col("label")),
        1,
    ).otherwise(0)
    return joined.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.count("knn_label").cast("long").alias("n_scored"),
        F.sum(disagree).cast("long").alias("n_disagree"),
        (
            F.sum(disagree).cast("double")
            / F.nullif(F.count("knn_label").cast("double"), F.lit(0.0))
        ).alias("disagree_rate"),
    )


# --------------------------------------------------------------------------
# Maximal Marginal Relevance: diversity-aware top-k selection.
# --------------------------------------------------------------------------
MMR_QUERY_ID = 0  # the query vector
MMR_K = 5  # selections
MMR_POOL = 64  # relevance prefilter (the production rerank window)


def _mmr_oracle() -> str:
    dot_q = _sql_dot("q0.embedding", "b.embedding")
    dot_s = _sql_dot("c.embedding", "s.embedding")
    parts = [
        f"""base AS (
        SELECT vec_id, embedding, {_sql_norm('embedding')} AS nrm
        FROM embeddings
    ), q0 AS (
        SELECT * FROM base WHERE vec_id = {MMR_QUERY_ID}
    ), pool AS (
        SELECT vec_id, embedding, nrm, rel FROM (
            SELECT b.vec_id, b.embedding, b.nrm,
                   round({dot_q} / (q0.nrm * b.nrm), 4) AS rel,
                   row_number() OVER (
                       ORDER BY round({dot_q} / (q0.nrm * b.nrm), 4) DESC,
                                b.vec_id) AS prn
            FROM base b CROSS JOIN q0
            WHERE b.vec_id <> {MMR_QUERY_ID}
        ) WHERE prn <= {MMR_POOL}
    ), sel1 AS (
        SELECT vec_id, embedding, nrm, rel, 0.0 AS max_sim,
               rel AS mmr_score, 1 AS rn
        FROM pool ORDER BY rel DESC, vec_id LIMIT 1
    )"""
    ]
    for j in range(2, MMR_K + 1):
        prev = f"sel{j - 1}"
        parts.append(
            f"""m{j} AS (
        SELECT c.vec_id, c.embedding, c.nrm, c.rel,
               max(round({dot_s} / (c.nrm * s.nrm), 4)) AS max_sim
        FROM pool c CROSS JOIN {prev} s
        WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})
        GROUP BY c.vec_id, c.embedding, c.nrm, c.rel
    ), pick{j} AS (
        SELECT vec_id, embedding, nrm, rel, max_sim,
               0.5 * (rel - max_sim) AS mmr_score, {j} AS rn
        FROM m{j} ORDER BY mmr_score DESC, vec_id LIMIT 1
    ), sel{j} AS (
        SELECT * FROM {prev} UNION ALL SELECT * FROM pick{j}
    )"""
        )
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT CAST(rn AS INTEGER) AS rn, vec_id, rel AS relevance,
           max_sim, mmr_score
    FROM sel{MMR_K}
    """
    )


@query("sim_mmr_diverse_topk", oracle=_mmr_oracle())
def sim_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance selection: greedily pick K results for
    query vec_id 0 that trade relevance against redundancy — each round
    selects argmax of λ·rel(v) − (1−λ)·max_{s∈selected} cos(v, s) with
    λ = 1/2, from a relevance-prefiltered pool (the production rerank
    window: MMR never scans the corpus, it diversifies the top-M of a
    cheaper retriever). The standard diversified-retrieval operator for
    RAG result lists and for picking varied exemplars from a near-dup
    cluster.

    Exactness: cosines round to 4 decimals (the certified discipline of
    every sim_* query); max over rounded values is order-free; λ = 1/2
    is a power of two so the score multiply is exact; ties break on
    vec_id. The greedy argmax collects ONE row per round — the same
    legitimate iterative-scalar pattern as bpe_merge_steps.

    Plan: one broadcast of the query row, one pool prefilter via
    TakeOrderedAndProject, then K−1 rounds of (≤M pool rows ×
    ≤K broadcast selected rows) → max-agg → TakeOrdered(1). At 100 TB
    only the prefilter touches the corpus; the loop runs on M rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = _with_norm(emb)
    q0 = base.filter(F.col("vec_id") == MMR_QUERY_ID).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    rel = F.round(
        _dot(F.col("q_emb"), F.col("embedding"))
        / (F.col("q_nrm") * F.col("nrm")),
        4,
    )
    pool = (
        base.filter(F.col("vec_id") != MMR_QUERY_ID)
        .crossJoin(F.broadcast(q0))
        .select("vec_id", "embedding", "nrm", rel.alias("rel"))
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(MMR_POOL)
        .persist()
    )
    pool.count()
    picked: list[tuple] = []
    ids: list[int] = []
    for rn in range(1, MMR_K + 1):
        if rn == 1:
            row = (
                pool.orderBy(F.desc("rel"), F.asc("vec_id"))
                .select("vec_id", "rel")
                .first()
            )
            picked.append((1, row["vec_id"], row["rel"], 0.0, row["rel"]))
        else:
            sel = pool.filter(F.col("vec_id").isin(ids)).select(
                F.col("vec_id").alias("s_id"),
                F.col("embedding").alias("s_emb"),
                F.col("nrm").alias("s_nrm"),
            )
            sim = F.round(
                _dot(F.col("embedding"), F.col("s_emb"))
                / (F.col("nrm") * F.col("s_nrm")),
                4,
            )
            row = (
                pool.filter(~F.col("vec_id").isin(ids))
                .crossJoin(F.broadcast(sel))
                .select("vec_id", "rel", sim.alias("sim"))
                .groupBy("vec_id", "rel")
                .agg(F.max("sim").alias("max_sim"))
                .select(
                    "vec_id",
                    "rel",
                    "max_sim",
                    (F.lit(0.5) * (F.col("rel") - F.col("max_sim"))).alias(
                        "score"
                    ),
                )
                .orderBy(F.desc("score"), F.asc("vec_id"))
                .first()
            )
            picked.append(
                (rn, row["vec_id"], row["rel"], row["max_sim"], row["score"])
            )
        ids.append(picked[-1][1])
    pool.unpersist()
    return spark.createDataFrame(
        picked,
        schema=(
            "rn int, vec_id long, relevance double, "
            "max_sim double, mmr_score double"
        ),
    )


# --------------------------------------------------------------------------
# Silhouette estimate over the label clustering, from a bounded anchor set.
# --------------------------------------------------------------------------
SIL_ANCHORS = 256  # anchors = vec_id < 256: a BOUNDED broadcast at any scale


def _silhouette_oracle() -> str:
    dot = _sql_dot("a.embedding", "b.embedding")
    return f"""
    WITH base AS (
        SELECT vec_id, label, embedding, {_sql_norm('embedding')} AS nrm
        FROM embeddings
    ), anchors AS (
        SELECT * FROM base WHERE vec_id < {SIL_ANCHORS}
    ), pair AS (
        SELECT a.vec_id AS aid, a.label AS a_label, b.label AS b_label,
               CAST(round((1.0 - round({dot} / (a.nrm * b.nrm), 4))
                          * 10000.0) AS BIGINT) AS dq
        FROM anchors a CROSS JOIN base b
        WHERE a.vec_id <> b.vec_id
    ), per_label AS (
        SELECT aid, a_label, b_label,
               CAST(sum(dq) AS BIGINT) AS sq, CAST(count(*) AS BIGINT) AS n
        FROM pair GROUP BY aid, a_label, b_label
    ), ab AS (
        SELECT aid, a_label,
               max(CASE WHEN b_label = a_label THEN
                   CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0)
               END) AS a_mean,
               min(CASE WHEN b_label <> a_label THEN
                   CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0)
               END) AS b_mean
        FROM per_label GROUP BY aid, a_label
    ), sil AS (
        SELECT aid, a_label, a_mean, b_mean,
               CAST(round(((b_mean - a_mean)
                           / nullif(greatest(a_mean, b_mean), 0.0))
                          * 1048576.0) AS BIGINT) AS sq
        FROM ab WHERE a_mean IS NOT NULL AND b_mean IS NOT NULL
    )
    SELECT a_label AS label, CAST(count(*) AS BIGINT) AS n_anchors,
           CAST(sum(sq) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1048576.0)
               AS mean_silhouette,
           CAST(sum(CASE WHEN sq < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_negative
    FROM sil GROUP BY a_label
    """


@query("emb_silhouette_by_label", oracle=_silhouette_oracle())
def emb_silhouette_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silhouette health of the label clustering, estimated from a
    BOUNDED anchor set (vec_id < 256): for each anchor, a = mean cosine
    distance to its own label, b = the closest other label's mean
    distance, s = (b−a)/max(a,b); reported per label as the anchor-mean
    silhouette and the count of negative-silhouette anchors (points
    sitting closer to a foreign label — the mislabeled/overlapping
    mass). Complements emb_fisher_ratio (global separability) with the
    per-point geometry view clustering audits use.

    Exactness: pairwise cosines keep the certified 4-decimal rounding;
    distances quantize to integer 1e-4ths so the per-(anchor, label)
    mean is an exact integer sum with one final division; the silhouette
    itself re-quantizes to the 2^-20 grid before the per-label mean —
    both folds are order-free integer sums, never IEEE accumulations.

    Plan: the anchor table is a CONSTANT-size broadcast (the estimator's
    accuracy knob — fix the anchor count, not a rate, so the broadcast
    is bounded at 100 TB), nested-loop-joined against one corpus scan;
    then two keyed reductions, each input already anchor-bounded."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = _with_norm(emb).join(emb.select("vec_id", "label"), "vec_id")
    anchors = base.filter(F.col("vec_id") < SIL_ANCHORS).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("a_label"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    cos = F.round(
        _dot(F.col("a_emb"), F.col("embedding"))
        / (F.col("a_nrm") * F.col("nrm")),
        4,
    )
    pair = (
        base.crossJoin(F.broadcast(anchors))
        .filter(F.col("aid") != F.col("vec_id"))
        .select(
            "aid",
            "a_label",
            F.col("label").alias("b_label"),
            F.round((F.lit(1.0) - cos) * F.lit(10000.0))
            .cast("long")
            .alias("dq"),
        )
    )
    per_label = pair.groupBy("aid", "a_label", "b_label").agg(
        F.sum("dq").cast("long").alias("sq"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    mean_d = F.col("sq").cast("double") / (
        F.col("n").cast("double") * F.lit(10000.0)
    )
    ab = per_label.groupBy("aid", "a_label").agg(
        F.max(
            F.when(F.col("b_label") == F.col("a_label"), mean_d)
        ).alias("a_mean"),
        F.min(
            F.when(F.col("b_label") != F.col("a_label"), mean_d)
        ).alias("b_mean"),
    )
    sil = (
        ab.filter(
            F.col("a_mean").isNotNull() & F.col("b_mean").isNotNull()
        )
        .select(
            "a_label",
            F.round(
                (
                    (F.col("b_mean") - F.col("a_mean"))
                    / F.nullif(
                        F.greatest(F.col("a_mean"), F.col("b_mean")),
                        F.lit(0.0),
                    )
                )
                * F.lit(_FXP_SCALE)
            )
            .cast("long")
            .alias("sq"),
        )
    )
    return sil.groupBy(F.col("a_label").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        (
            F.sum("sq").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(_FXP_SCALE))
        ).alias("mean_silhouette"),
        F.sum(F.when(F.col("sq") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_negative"),
    )


# --------------------------------------------------------------------------
# MRR of the IVF index against brute-force truth: where does the ONE true
# nearest neighbor land in the approximate ranking?
# --------------------------------------------------------------------------
MRR_SCALE = 2520  # lcm(1..10): MRR_SCALE/r is an exact integer for r <= TOPK


def _mrr_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH truth AS MATERIALIZED ({ORACLES['sim_cosine_topk_bruteforce']}),
    appr AS MATERIALIZED ({ORACLES['sim_cosine_topk_ivf']}),
    t1 AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, vec_id) AS rn
            FROM truth) WHERE rn = 1
    ), a AS (
        SELECT query_id, vec_id,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, vec_id) AS BIGINT) AS ra
        FROM appr
    )
    SELECT t1.query_id, t1.vec_id AS true_vec_id,
           CAST(coalesce(a.ra, 0) AS BIGINT) AS approx_rank,
           CAST(coalesce({MRR_SCALE} // a.ra, 0) AS BIGINT) AS rr_x2520
    FROM t1 LEFT JOIN a
      ON a.query_id = t1.query_id AND a.vec_id = t1.vec_id
    """


@query("sim_mrr_ivf", oracle=_mrr_oracle())
def sim_mrr_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of the true nearest neighbor in the IVF ranking —
    the single-number "does the index put THE right answer first" audit
    (recall@k says the truth set is present; NDCG grades the whole list;
    MRR isolates the top answer a retrieval pipeline actually serves).

    Exactness: ranks are integers, and the reciprocal is carried on the
    lcm(1..k) = 2520 integer grid (2520/r is exact for every r <= 10), so
    rr terms — and any downstream mean — are exact integer arithmetic,
    never an order-sensitive float sum of 1/3 + 1/7 + ... A miss is the
    0 sentinel on both columns (rank NULL-free for the hash compare).

    Plan: composes the two REGISTERED queries (index cost dominates);
    the truth top-1 filter and approx ranking are k-row-per-query
    windows, and the hit join is (query_id, vec_id)-keyed at query-set
    scale — AQE broadcasts it."""
    from ..registry import QUERIES

    truth = QUERIES["sim_cosine_topk_bruteforce"](spark, sf_dir)
    appr = QUERIES["sim_cosine_topk_ivf"](spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    t1 = (
        truth.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("vec_id").alias("true_vec_id"))
    )
    a = appr.select(
        F.col("query_id").alias("q2"),
        F.col("vec_id").alias("v2"),
        F.row_number().over(w).cast("long").alias("ra"),
    )
    j = t1.join(
        a,
        (F.col("query_id") == F.col("q2")) & (F.col("true_vec_id") == F.col("v2")),
        "left",
    )
    return j.select(
        "query_id",
        "true_vec_id",
        F.coalesce(F.col("ra"), F.lit(0)).cast("long").alias("approx_rank"),
        F.coalesce(F.expr(f"{MRR_SCALE} DIV ra"), F.lit(0))
        .cast("long")
        .alias("rr_x2520"),
    )


# --------------------------------------------------------------------------
# Rank-biased overlap between two ANN rankings — the top-weighted list
# agreement measure (Webber et al., TOIS 2010), exact at p = 1/2.
# --------------------------------------------------------------------------
_RBO_P_INV = 2  # persistence p = 1/2 makes every RBO term an exact dyadic
_RBO_SCALE = 2520 * 1024  # lcm(1..10) * 2^10: common denominator of d * 2^d
# Suffix weights: W[m] = sum_{d=m..TOPK} SCALE / (d * 2^d) — the total RBO
# mass a document entering the prefix intersection at depth m contributes.
_RBO_W = [
    sum(_RBO_SCALE // (d * 2**d) for d in range(m, TOPK + 1))
    for m in range(1, TOPK + 1)
]
# All-overlap maximum: identical lists give ov_d = d, so the truncated RBO
# tops out at sum_d 1/2^d = 1 - 2^-TOPK — the rbo_norm denominator.
_RBO_MAX = _RBO_SCALE * (2**TOPK - 1) // 2**TOPK


def _rbo_oracle() -> str:
    from ..registry import ORACLES

    rank = (
        "row_number() OVER (PARTITION BY query_id"
        " ORDER BY cosine DESC, vec_id)"
    )
    wlist = ", ".join(str(w) for w in _RBO_W)
    return f"""
    WITH la AS MATERIALIZED ({ORACLES['sim_cosine_topk_lsh']}),
    lb AS MATERIALIZED ({ORACLES['sim_cosine_topk_ivf']}),
    ra AS (SELECT query_id, vec_id, {rank} AS r FROM la),
    rb AS (SELECT query_id, vec_id, {rank} AS r FROM lb),
    m AS (
        SELECT ra.query_id, greatest(ra.r, rb.r) AS md
        FROM ra JOIN rb USING (query_id, vec_id)
    ), agg AS (
        SELECT query_id,
               CAST(count(*) AS BIGINT) AS n_matched,
               CAST(sum(([{wlist}])[md]) AS BIGINT) AS sw
        FROM m GROUP BY query_id
    ), qs AS (
        SELECT DISTINCT query_id FROM (
            SELECT query_id FROM ra UNION ALL SELECT query_id FROM rb
        )
    )
    SELECT qs.query_id,
           coalesce(agg.n_matched, 0) AS n_matched,
           CAST(coalesce(agg.sw, 0) AS DOUBLE) / {_RBO_SCALE}.0 AS rbo,
           CAST(coalesce(agg.sw, 0) AS DOUBLE) / {_RBO_MAX}.0 AS rbo_norm
    FROM qs LEFT JOIN agg USING (query_id)
    """


@query("sim_rbo_overlap", oracle=_rbo_oracle())
def sim_rbo_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (truncated, persistence p = 1/2) between the
    LSH and IVF top-k rankings per query: RBO = (1-p) Σ_d p^(d-1)·ov_d/d
    with ov_d the size of the depth-d prefix intersection — the
    top-weighted agreement number for comparing two ANN indexes (recall
    asks "is the truth present"; RBO asks "do the two indexes agree, and
    at the top"). rbo_norm divides by the all-overlap maximum so 1.0
    means the prefixes agree at every depth.

    Exactness: p = 1/2 makes every term ov_d/(d·2^d) a rational with
    denominator dividing lcm(1..10)·2^10 = 2580480, and swapping the
    d-sum with the per-document sum turns RBO into Σ_matched W[max(ra,rb)]
    over EXACT INTEGER suffix weights (a doc enters the prefix
    intersection at depth max of its two ranks) — integer arithmetic end
    to end, one final division, no float accumulation on either engine.

    Plan: both inputs are registered per-query top-k lists (query-set
    scale, never corpus scale), so the whole measure is one tiny
    (query_id, vec_id) equi-join plus an element_at weight lookup — the
    corpus-scale work stays inside the composed index scans, swappable
    for any registered ANN pair."""
    from ..registry import QUERIES

    def ranked(name: str) -> DataFrame:
        lst = QUERIES[name](spark, sf_dir)
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("vec_id")
        )
        return lst.select(
            "query_id", "vec_id", F.row_number().over(w).alias("r")
        )

    ra = ranked("sim_cosine_topk_lsh")
    rb = ranked("sim_cosine_topk_ivf").select(
        F.col("query_id").alias("qb"),
        F.col("vec_id").alias("vb"),
        F.col("r").alias("rbk"),
    )
    wlit = F.array(*[F.lit(w) for w in _RBO_W])
    m = ra.join(
        rb,
        (F.col("query_id") == F.col("qb")) & (F.col("vec_id") == F.col("vb")),
    ).select(
        "query_id",
        F.greatest(F.col("r"), F.col("rbk")).alias("md"),
    )
    agg = m.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.sum(F.element_at(wlit, F.col("md"))).cast("long").alias("sw"),
    )
    qs = (
        ra.select("query_id")
        .unionAll(rb.select(F.col("qb").alias("query_id")))
        .distinct()
    )
    return qs.join(agg, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_matched"), F.lit(0)).cast("long").alias(
            "n_matched"
        ),
        (
            F.coalesce(F.col("sw"), F.lit(0)).cast("double")
            / F.lit(float(_RBO_SCALE))
        ).alias("rbo"),
        (
            F.coalesce(F.col("sw"), F.lit(0)).cast("double")
            / F.lit(float(_RBO_MAX))
        ).alias("rbo_norm"),
    )


# --------------------------------------------------------------------------
# Does normalization matter here? RBO between raw-dot-product and cosine
# rankings — the metric-choice audit for an embedding store.
# --------------------------------------------------------------------------
def _norm_effect_oracle() -> str:
    from ..registry import ORACLES

    rank = (
        "row_number() OVER (PARTITION BY query_id"
        " ORDER BY {s} DESC, vec_id)"
    )
    wlist = ", ".join(str(w) for w in _RBO_W)
    return (
        _SQL_BASE_CTE
        + f"""
    , cosr AS (
        SELECT query_id, vec_id,
               {rank.format(s='cosine')} AS r
        FROM ({ORACLES['sim_cosine_topk_bruteforce']})
    ), dotk AS (
        SELECT query_id, vec_id, dot FROM (
            SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
                   round({_sql_dot('q.embedding', 'b.embedding')}, 4) AS dot,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round({_sql_dot('q.embedding', 'b.embedding')}, 4)
                                DESC, b.vec_id) AS rn
            FROM q CROSS JOIN base b
        ) WHERE rn <= {TOPK}
    ), dotr AS (
        SELECT query_id, vec_id, {rank.format(s='dot')} AS r FROM dotk
    ), m AS (
        SELECT c.query_id, greatest(c.r, d.r) AS md
        FROM cosr c JOIN dotr d USING (query_id, vec_id)
    ), agg AS (
        SELECT query_id, CAST(count(*) AS BIGINT) AS n_matched,
               CAST(sum(([{wlist}])[md]) AS BIGINT) AS sw
        FROM m GROUP BY query_id
    ), qs AS (SELECT DISTINCT query_id FROM cosr)
    SELECT qs.query_id,
           coalesce(agg.n_matched, 0) AS n_matched,
           CAST(coalesce(agg.sw, 0) AS DOUBLE) / {_RBO_MAX}.0 AS rbo_norm
    FROM qs LEFT JOIN agg USING (query_id)
    """
    )


@query("sim_norm_effect_rbo", oracle=_norm_effect_oracle())
def sim_norm_effect_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-choice audit: rank-biased overlap (p = 1/2, normalized)
    between the RAW dot-product ranking and the cosine ranking for each
    query — the one-number answer to "can this store skip
    normalization?". rbo_norm near 1 means vector norms are uniform
    enough that dot ≈ cosine (skip the normalize pass and its storage);
    low values mean norm variation is steering results and cosine (or
    pre-normalized vectors) is mandatory. Uses sim_rbo_overlap's exact
    integer suffix-weight identity; the cosine side is the REGISTERED
    brute force, the dot side the same broadcast scan minus the norm
    division.

    Plan: two broadcast-query scans of the corpus (one shared at 100 TB
    via a cached projection), per-query top-k windows, a query-scale
    weight-lookup join — no new corpus-scale work."""
    from ..registry import QUERIES

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    cosr = (
        QUERIES["sim_cosine_topk_bruteforce"](spark, sf_dir)
        .select("query_id", "vec_id", F.row_number().over(w).alias("r"))
    )
    base = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    dot = F.round(_dot(F.col("q_emb"), F.col("embedding")), 4)
    wd = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("vec_id"))
    dotr = (
        base.crossJoin(F.broadcast(q))
        .select("query_id", "vec_id", dot.alias("dot"))
        .withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= TOPK)
        .select(
            F.col("query_id").alias("qd"),
            F.col("vec_id").alias("vd"),
            F.col("rn").alias("rd"),
        )
    )
    wlit = F.array(*[F.lit(x) for x in _RBO_W])
    m = cosr.join(
        dotr,
        (F.col("query_id") == F.col("qd")) & (F.col("vec_id") == F.col("vd")),
    ).select("query_id", F.greatest(F.col("r"), F.col("rd")).alias("md"))
    agg = m.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.sum(F.element_at(wlit, F.col("md"))).cast("long").alias("sw"),
    )
    qs = cosr.select("query_id").distinct()
    return qs.join(agg, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_matched"), F.lit(0)).cast("long").alias(
            "n_matched"
        ),
        (
            F.coalesce(F.col("sw"), F.lit(0)).cast("double")
            / F.lit(float(_RBO_MAX))
        ).alias("rbo_norm"),
    )


# --------------------------------------------------------------------------
# PQ distortion audit: what the 12-bit compression costs, per subspace.
# --------------------------------------------------------------------------
def _pq_distortion_oracle() -> str:
    dists = [
        _pq_dist_terms("e.embedding", "cb.c_emb", m, "{col}[{i}]")
        for m in range(PQ_M)
    ]
    mins = ", ".join(
        f"(min(struct_pack(d := {d}, c := cb.code_id))).d AS d{m},"
        f" (min(struct_pack(d := {d}, c := cb.code_id))).c AS c{m}"
        for m, d in enumerate(dists)
    )
    per_m = "\n    UNION ALL\n".join(
        f"""    SELECT {m} AS subspace,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(count(DISTINCT c{m}) AS BIGINT) AS n_codes_used,
           CAST(sum(CAST(round(d{m} * 1000000.0) AS BIGINT)) AS BIGINT)
               AS sq_err_grid,
           CAST(sum(CAST(round(d{m} * 1000000.0) AS BIGINT)) AS DOUBLE)
               / (CAST(count(*) AS DOUBLE) * 1000000.0) AS mean_sq_err
    FROM assigned"""
        for m in range(PQ_M)
    )
    return f"""
    WITH cb AS (
        SELECT vec_id - {N_QUERIES} AS code_id, embedding AS c_emb
        FROM embeddings
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + PQ_K}
    ), assigned AS (
        SELECT e.vec_id, {mins}
        FROM embeddings e CROSS JOIN cb
        GROUP BY e.vec_id
    )
{per_m}
    """


@query("sim_pq_distortion", oracle=_pq_distortion_oracle())
def sim_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ reconstruction-distortion audit: mean squared L2 error between
    each vector's subspace slice and its assigned codeword, per subspace
    — the quantization-quality number that decides PQ_K/PQ_M sizing
    (recall audits like sim_recall_pq price the SEARCH loss; this prices
    the CODE loss directly, and a subspace with distortion far above its
    peers is the one whose codebook needs more codewords or a rotation).
    n_codes_used doubles as codebook-collapse detection (dead codewords
    = wasted bits).

    Exactness: per-vector min distance is an argmin over 8 explicit
    expressions whose text is identical on both engines (min of doubles
    is order-free); distances then quantize to the 1e-6 integer grid
    and sum as exact integers (order-free partial aggregation — the
    emb_silhouette discipline), with ONE division at the end.

    Plan: one broadcast cross join against the 8-row codebook, one
    vec_id-keyed argmin aggregation carrying (distance, code) structs,
    then a 4-row per-subspace rollup — corpus-scan-bound, no row
    shuffle beyond the argmin's."""
    base = load_table(spark, sf_dir, "embeddings")
    pairs = base.crossJoin(F.broadcast(_pq_codebook(base)))
    aggs = []
    for m in range(PQ_M):
        s = F.min(
            F.struct(
                F.expr(
                    _pq_dist_terms(
                        "embedding", "c_emb", m, "element_at({col}, {i})"
                    )
                ).alias("d"),
                F.col("code_id").alias("c"),
            )
        )
        aggs.append(s["d"].alias(f"d{m}"))
        aggs.append(s["c"].alias(f"c{m}"))
    assigned = pairs.groupBy("vec_id").agg(*aggs)
    out = None
    for m in range(PQ_M):
        grid = F.expr(f"CAST(round(d{m} * 1000000.0) AS BIGINT)")
        row = assigned.agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.countDistinct(f"c{m}").cast("long").alias("n_codes_used"),
            F.sum(grid).cast("long").alias("sq_err_grid"),
        ).select(
            F.lit(m).alias("subspace"),
            "n_vectors",
            "n_codes_used",
            "sq_err_grid",
            (
                F.col("sq_err_grid").cast("double")
                / (F.col("n_vectors").cast("double") * F.lit(1000000.0))
            ).alias("mean_sq_err"),
        )
        out = row if out is None else out.unionAll(row)
    return out
