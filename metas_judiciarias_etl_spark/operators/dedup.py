"""Deduplication operators for training-data pipelines, over ``documents``.

Four families, each designed for the 100 TB path first and verified against
a DuckDB oracle built from the *same* hash/shingle constants
(functions/hashing.py):

* exact       — content-hash groupBy. One shuffle on a 128-bit key; at scale
                the winning strategy for byte-identical dups.
* MinHash+LSH — shingle → k minhashes → band → bucket agg. Candidate
                generation groups docs by (band, signature) and expands
                pairs inside each (capped) bucket: only colliding docs
                meet, never all-pairs. The verify step computes exact
                shingle Jaccard on candidates only.
* SimHash     — 16-bit fingerprint from per-token 48-bit hashes; near-dups
                collide on equal fingerprints (hamming-0 buckets).
* n-gram Jaccard — the exact verifier exposed standalone (LSH-candidates →
                pair Jaccard), i.e. the scale-safe form of all-pairs Jaccard.

Physical shape (deliberate): signatures are computed via explode→groupBy —
one md5 per shingle, cheap affine permutations, map-side partial MIN, one
shuffle keyed by doc_id — instead of nested higher-order functions. The HOF
form re-expands the whole hash expression tree into every band branch and
join side (Catalyst CollapseProject), which blew compile time up ~100x.
The shingle table is persisted (it feeds the signature build and both
sides of the Jaccard verify join); at 100 TB it becomes a materialized
table.

No UDFs anywhere: hash aggs + bucket expansion + shuffle joins, whole-stage
codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..functions.hashing import (
    MINHASH_P,
    SQL_TOKENS,
    affine_min_aggs,
    band_keys,
    hash48,
    sql_affine_min_aggs,
    sql_hash48,
    sql_word_shingles,
    tokens,
    word_shingles,
)
from ..memo import shared
from ..registry import query
from ..sources.parquet import load_table

NUM_HASHES = 9
BANDS = 3
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5

_SQL_TOKS = SQL_TOKENS.format(expr="text")
_SQL_SHINGLES = f"list_distinct({sql_word_shingles(_SQL_TOKS, SHINGLE_K)})"


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text); keeper = min doc_id.

    One shuffle keyed by the content hash — uniform by construction, so no
    skew even at 100 TB (identical docs colliding on one key IS the job)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("content_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


def _shingle_plan(docs: DataFrame) -> DataFrame:
    """Pure (doc_id, shingles array) plan over any (doc_id, text) frame:
    tokenize → k-slice zip → array_distinct. No persist/memo — for
    derived or synthetic frames; whole-corpus consumers use
    ``_doc_shingles``."""
    return docs.select("doc_id", tokens(F.col("text")).alias("toks")).select(
        "doc_id",
        F.array_distinct(word_shingles(F.col("toks"), SHINGLE_K)).alias(
            "shingles"
        ),
    )


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingles array) for the FULL documents table — memoized
    per (session, sf_dir): the shingle build (tokenize → k-slice zip →
    array_distinct) is the shared root of every MinHash/SSJoin/containment
    query, and before round 6 each of ~11 consumers persisted its own
    copy, so one bench rep of dedup_lsh_band_sweep paid the tokenizer
    twice (its own signatures + the truth set's). Eager materialization
    matters even per-query: an unmaterialized cache gets computed
    concurrently (= repeatedly) by a self-join's stages instead of once."""
    return shared(
        spark, sf_dir, "doc_shingles",
        lambda: _shingle_plan(load_table(spark, sf_dir, "documents")),
    )


def _verify_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle sets for pair VERIFICATION as int64 hash48 codes — memoized
    per (session, sf_dir) like the string table it derives from.

    Why: every detector's exact verify is ``array_intersect`` over the two
    docs' shingle sets at candidate-pair scale; on ~25-byte strings that is
    the single hottest loop in the dedup tier (round-7 probe at sf0.1:
    310k candidate pairs verify in 12.98 s on string arrays vs 0.84 s on
    int64 arrays — guide §2.3 "narrower types", applied to the per-task
    hot loop and to the verify join's shuffle payload).

    Why it is EXACT, not approximate: the build first certifies that
    hash48 is injective over the corpus's shingle vocabulary
    (count_distinct(shingle) == count_distinct(hash48(shingle)) — one
    aggregate over the exploded memo). Under injectivity every per-doc
    hashed set has the same cardinality as its string set and every
    pairwise intersection/union has the same size, so Jaccard/containment
    computed from the codes is bit-identical to the string form. If the
    certificate ever fails (expected only under adversarial vocabularies:
    ~n²/2^49 collision odds), the build returns the STRING table and every
    consumer transparently verifies on strings — correctness never rests
    on a probabilistic argument. The certificate runs ONCE per (session,
    sf_dir): after a cache eviction the memo re-persists the same
    DataFrame without re-running build(), which is safe because the
    fixture inputs are immutable per sf_dir — the re-materialized rows
    are the same rows the certificate already covered (ADVICE r7)."""

    def build() -> DataFrame:
        sh = _doc_shingles(spark, sf_dir)
        # hash once: materialize the code table first, read BOTH distinct
        # counts from cached arrays (the string side from the _doc_shingles
        # memo), so the certificate costs two cache-scan aggregates, not a
        # second 260k-row md5+conv pass.
        hashed = sh.select(
            "doc_id",
            F.array_distinct(
                F.transform("shingles", lambda c: hash48(c))
            ).alias("shingles"),
        ).persist()
        nh = (
            hashed.select(F.explode("shingles").alias("h"))
            .agg(F.count_distinct("h"))
            .first()[0]
        )
        ns = (
            sh.select(F.explode("shingles").alias("s"))
            .agg(F.count_distinct("s"))
            .first()[0]
        )
        if ns != nh:  # hash collision in vocabulary: stay exact
            hashed.unpersist()
            return sh.select("doc_id", "shingles")
        return hashed

    return shared(spark, sf_dir, "verify_shingles", build)


def _verify_is_hashed(vs: DataFrame) -> bool:
    from pyspark.sql import types as T

    return isinstance(vs.schema["shingles"].dataType.elementType, T.LongType)


def _signatures(shingled: DataFrame) -> DataFrame:
    """MinHash signature table: explode shingles → one hash48 per shingle →
    9 affine-permutation MINs in a single groupBy(doc_id). No persist:
    since candidate generation became a bucket agg (no self-join), the
    signature table is consumed exactly once per plan; whole-corpus
    consumers should go through ``_signatures_shared``."""
    h = (
        shingled.select("doc_id", F.explode("shingles").alias("shingle"))
        .select("doc_id", (hash48(F.col("shingle")) % MINHASH_P).alias("h"))
    )
    return h.groupBy("doc_id").agg(*affine_min_aggs("h", NUM_HASHES))


def _signatures_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized whole-corpus MinHash signature table (default NUM_HASHES
    family) — shared by the LSH detector, the banding sweep, the recall
    auditors, and the ER feature builds, which all band the SAME
    signatures differently. 10 long columns × corpus rows: persisting it
    is cheaper than ONE re-tokenization pass.

    Round 7: under the _verify_shingles injectivity certificate the
    stored int64 codes ARE hash48(shingle), so the signature build
    explodes the cached code arrays and skips re-computing 260k
    md5+conv per build; the affine-min values are identical by
    construction (h % P of the same integers)."""

    def build() -> DataFrame:
        vs = _verify_shingles(spark, sf_dir)
        if _verify_is_hashed(vs):
            h = vs.select(
                "doc_id", F.explode("shingles").alias("hs")
            ).select("doc_id", (F.col("hs") % MINHASH_P).alias("h"))
            return h.groupBy("doc_id").agg(*affine_min_aggs("h", NUM_HASHES))
        return _signatures(_doc_shingles(spark, sf_dir))

    return shared(
        spark, sf_dir, "mh_signatures", build,
        deps=(lambda: _verify_shingles(spark, sf_dir),),
    )


BUCKET_CAP = 200


def _lsh_candidates(mh: DataFrame, bucket_cap: int = BUCKET_CAP, bands: int = BANDS) -> DataFrame:
    """Band the signatures and bucket docs per band: docs sharing any full
    band become candidate pairs. The bucket key (band_idx, band_sig) is
    what makes this scale — candidates meet in a bucket, never in an
    all-pairs product.

    ``bucket_cap`` is the mega-bucket guard: a degenerate band signature
    (boilerplate shingles, near-empty docs) with m members contributes
    m²/2 candidate pairs — one million-doc bucket is 5×10¹¹ pairs and a
    straight-up job killer. Buckets above the cap are excluded from pair
    generation (their members still meet through their OTHER bands, which
    is why LSH uses several bands). The cap is a visible recall knob, not
    a silent truncation: set it from the band-population histogram
    (`groupBy(band).count()`), and the oracle applies the same cap.

    Physical shape: collect each bucket's member list in ONE hash agg
    (map-side combinable), then expand pairs with array expressions inside
    the row — no self-join, no window; the cap bounds the expansion at
    cap² structs per bucket. One shuffle total before the pair distinct."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws("|", *cols).alias("band_sig"),
            )
            for b, cols in band_keys(NUM_HASHES, bands)
        ]
    )
    banded = mh.select("doc_id", F.explode(band_structs).alias("bs")).select(
        "doc_id", "bs.band_idx", "bs.band_sig"
    )
    buckets = (
        banded.groupBy("band_idx", "band_sig")
        .agg(F.collect_list("doc_id").alias("members"))
        .filter((F.size("members") >= 2) & (F.size("members") <= bucket_cap))
    )
    ms = F.array_sort("members")
    pair_arr = F.flatten(
        F.transform(
            ms,
            lambda x: F.transform(
                ms, lambda y: F.struct(x.alias("a_id"), y.alias("b_id"))
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_arr).alias("p"))
        .filter(F.col("p.a_id") < F.col("p.b_id"))
        .select("p.a_id", "p.b_id")
        .distinct()
    )


def _pair_jaccard(pairs: DataFrame, shingled: DataFrame) -> DataFrame:
    """Exact per-pair Jaccard. ``shingled`` may be the string table or the
    injectivity-certified int64 table from ``_verify_shingles`` — the
    arithmetic below is type-agnostic and the values are identical under
    the certificate (see _verify_shingles)."""
    a = shingled.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh"))
    b = shingled.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh"))
    # |A∪B| = |A| + |B| − |A∩B| exactly (shingle arrays are distinct by
    # construction): skips materializing the union array per pair — the
    # verify bill is output-pair-proportional, so on dup-heavy corpora
    # this is the hot loop (measured on the 10x probe, SCALE.md r5).
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    return (
        pairs.join(a, "a_id")
        .join(b, "b_id")
        .select(
            "a_id",
            "b_id",
            (
                inter
                / (F.size("a_sh") + F.size("b_sh") - inter)
            ).alias("jaccard"),
        )
    )


def _minhash_oracle_ctes() -> str:
    """Oracle CTE chain mirroring the Spark pipeline stage for stage:
    shingle → unnest → hash48 mod P → grouped affine MINs → bands → cand.

    The corpus-tokenizing ``sh`` and the signature table ``mh`` are
    MATERIALIZED: DuckDB inlines CTEs by default, so every downstream
    reference (the three band projections read ``mh``; composers' verify
    joins read ``sh`` twice — and recursive composers re-read per
    iteration) re-ran the whole tokenize/hash chain. The hint is
    execution-only — results are bit-identical (round 8, verified
    old-vs-new over all 391 oracles; dedup_clusters alone 10.8 s → 1.3 s
    at sf0.01)."""
    mh_aggs = ",\n               ".join(sql_affine_min_aggs("h", NUM_HASHES))
    band_rows = "\n        UNION ALL BY NAME\n".join(
        f"        SELECT doc_id, {b} AS band_idx, "
        f"{' || chr(124) || '.join(cols)} AS band_sig FROM mh"
        for b, cols in band_keys(NUM_HASHES, BANDS)
    )
    return f"""
    WITH sh AS MATERIALIZED (
        SELECT doc_id, {_SQL_SHINGLES} AS shingles
        FROM documents
    ), ex AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), hv AS (
        SELECT doc_id, {sql_hash48("shingle")} % {MINHASH_P} AS h FROM ex
    ), mh AS MATERIALIZED (
        SELECT doc_id,
               {mh_aggs}
        FROM hv GROUP BY doc_id
    ), banded AS (
{band_rows}
    ), capped AS (
        SELECT * FROM (
            SELECT banded.*,
                   count(*) OVER (PARTITION BY band_idx, band_sig) AS _n
            FROM banded
        ) WHERE _n <= {BUCKET_CAP}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM capped a JOIN capped b
          ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
         AND a.doc_id < b.doc_id
    )
    """


@query(
    "dedup_minhash_lsh",
    oracle=_minhash_oracle_ctes()
    + f"""
    SELECT c.a_id, c.b_id,
           round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                 / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6) AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.a_id
    JOIN sh sb ON sb.doc_id = c.b_id
    WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
          / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs: shingle → 9 affine minhashes → 3 bands →
    bucket-join candidates → exact shingle-Jaccard verify ≥ 0.5.

    Memoized per (session, sf_dir): four registered queries re-consume
    the pair set (lsh_recall, source_matrix, minhash_estimate_error,
    detector_ensemble)."""
    return shared(
        spark, sf_dir, "minhash_lsh",
        lambda: _minhash_lsh_build(spark, sf_dir),
        deps=(
            lambda: _verify_shingles(spark, sf_dir),
            lambda: _signatures_shared(spark, sf_dir),
        ),
    )


def _minhash_lsh_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    shingled = _verify_shingles(spark, sf_dir)
    pairs = _lsh_candidates(_signatures_shared(spark, sf_dir))
    return (
        _pair_jaccard(pairs, shingled)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash: 16-bit fingerprint, generated from per-token 48-bit hashes.
# Physical shape: explode tokens → hash once per token → 16 conditional SUMs
# in one groupBy(doc_id) — one md5 per token, one shuffle, map-side combine.
# ---------------------------------------------------------------------------
SIMHASH_BITS = 16


def _simhash_fingerprints(docs: DataFrame) -> DataFrame:
    hv = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    ).select("doc_id", hash48(F.col("tok")).alias("h"))
    bit_sums = [
        F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = hv.groupBy("doc_id").agg(*bit_sums)
    packed = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return sums.select("doc_id", packed.cast("long").alias("simhash16"))


def _simhash_oracle() -> str:
    bit_sums = ", ".join(
        f"sum(((h >> {b}) & 1) * 2 - 1) AS s{b}" for b in range(SIMHASH_BITS)
    )
    packed = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS)
    )
    return f"""
    WITH tk AS (
        SELECT doc_id, unnest(list_distinct({_SQL_TOKS})) AS tok FROM documents
    ), hv AS (
        SELECT doc_id, {sql_hash48("tok")} AS h FROM tk
    ), bits AS (
        SELECT doc_id, {bit_sums} FROM hv GROUP BY doc_id
    ), fp AS (
        SELECT doc_id, CAST({packed} AS BIGINT) AS simhash16 FROM bits
    )
    """


@query("dedup_simhash", oracle=_simhash_oracle() + "SELECT doc_id, simhash16 FROM fp")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints: near-dup docs land on equal (or hamming-close)
    fingerprints; equal-fingerprint grouping is then a plain hash shuffle.

    Memoized per (session, sf_dir) since round 8: the hamming-1 detector's
    plan reads the fingerprint table FOUR times (probe, identity, and both
    verify sides), so an unmemoized fingerprint build paid the
    tokenize+md5 pass 4x per materialization (guide §5: an unmaterialized
    intermediate is computed once per consuming subtree)."""
    return shared(
        spark, sf_dir, "simhash_fp",
        lambda: _simhash_fingerprints(load_table(spark, sf_dir, "documents")),
    )


@query(
    "dedup_simhash_buckets",
    oracle=_simhash_oracle()
    + """
    SELECT simhash16, count(*) AS n_docs, min(doc_id) AS keeper_doc_id
    FROM fp GROUP BY simhash16
    """,
)
def dedup_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-simhash collision groups (the dedup 'bucket' view)."""
    df = dedup_simhash(spark, sf_dir)
    return df.groupBy("simhash16").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc_id")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=_minhash_oracle_ctes()
    + """
    SELECT c.a_id, c.b_id,
           round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                 / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6) AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.a_id
    JOIN sh sb ON sb.doc_id = c.b_id
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-token shingle) Jaccard over LSH candidate pairs —
    the scale-safe form of all-pairs Jaccard (candidates via banding, never
    a cross join)."""
    shingled = _verify_shingles(spark, sf_dir)
    pairs = _lsh_candidates(_signatures_shared(spark, sf_dir))
    return _pair_jaccard(pairs, shingled).select(
        "a_id", "b_id", F.round("jaccard", 6).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# Near-dup clusters: connected components over the verified pair graph —
# the step that turns pairwise matches into dedup groups (keep one doc per
# component). Iterative min-label propagation; each round is one join + one
# hash agg, all JVM-side. Rounds are bounded by the component diameter —
# near-dup graphs are shallow (dups of a dup are dups), so a handful of
# rounds closes even huge graphs; at extreme diameters switch to the
# large-star/small-star variant (same primitive, O(log n) rounds).
# Lineage is truncated every round (localCheckpoint) — iterative joins
# otherwise stack plans until the driver chokes.
# ---------------------------------------------------------------------------
def _connected_components(pairs: DataFrame, max_rounds: int = 25) -> DataFrame:
    """(doc_id, cluster_id = min doc_id reachable) for every doc in ≥1 pair."""
    spark = pairs.sparkSession
    edges = (
        pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        .union(pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    converged = False
    for _ in range(max_rounds):
        neigh = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        labels = (
            labels.join(neigh, labels.node == neigh.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
            .localCheckpoint()  # truncate lineage; also materializes
        )
        # labels only ever decrease: an unchanged monotone sum == fixpoint
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    edges.unpersist()
    if not converged:
        # Returning here would hand back WRONG (partially-propagated)
        # cluster labels with no diagnostic. A graph deeper than max_rounds
        # means min-label propagation is the wrong algorithm for it — fail
        # loudly and point at the O(log n) variant.
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} rounds "
            "(graph diameter exceeds the round budget); use "
            "_connected_components_star (large-star/small-star, O(log n) "
            "rounds) for high-diameter graphs"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


@query(
    "dedup_clusters",
    oracle=_minhash_oracle_ctes()
    + f"""
    , verified AS MATERIALIZED (
        SELECT c.a_id, c.b_id
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.a_id
        JOIN sh sb ON sb.doc_id = c.b_id
        WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
              / len(list_distinct(list_concat(sa.shingles, sb.shingles)))
              >= {JACCARD_THRESHOLD}
    )
    SELECT doc_id, cluster_id FROM (
        WITH RECURSIVE edges AS MATERIALIZED (
            SELECT a_id AS src, b_id AS dst FROM verified
            UNION
            SELECT b_id, a_id FROM verified
        ), reach AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT src AS doc_id,
               least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src
    )
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup groups: MinHash-LSH verified pairs → connected components
    (cluster_id = min doc_id in the component). The oracle walks the same
    graph with a recursive CTE.

    The labeling is memoized per (session, sf_dir): four registered
    queries compose it (cluster_sizes, keeper_quality, pointbiserial,
    the evaluation scored frame), and the iterative CC build is the
    expensive part worth paying once per process (VERDICT r4 item 5)."""
    # NO deps= here (round 8): _connected_components ends in a
    # localCheckpoint, so this frame's lineage reads checkpointed RDD
    # partitions — an eviction re-pin never touches the shingle/signature
    # memos, and re-pinning them first was ~5 serial driver jobs of pure
    # overhead per consumer (dedup_cluster_sizes 0.23 s -> 1.1 s in the
    # round-8 final sweeps until removed). The build path still
    # materializes them itself on first use.
    return shared(
        spark, sf_dir, "dedup_clusters",
        lambda: _dedup_clusters_build(spark, sf_dir),
    )


def _dedup_clusters_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    shingled = _verify_shingles(spark, sf_dir)
    pairs = (
        _pair_jaccard(_lsh_candidates(_signatures_shared(spark, sf_dir)), shingled)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("a_id", "b_id")
    )
    return _connected_components(pairs)


# ---------------------------------------------------------------------------
# Large-star/small-star connected components — the O(log n)-round variant
# for adversarial component diameters (simple propagation needs diameter
# rounds; star contraction halves tree heights each iteration). Both moves
# are one groupBy + in-row array math over the edge list; no joins at all.
# ---------------------------------------------------------------------------
def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: link every LARGER neighbor to min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    nb = sym.groupBy("src").agg(F.collect_set("dst").alias("nbrs"))
    m = F.array_min(F.array_union("nbrs", F.array("src")))
    return (
        nb.select(
            F.explode(F.filter("nbrs", lambda v: v > F.col("src"))).alias("_u"),
            m.alias("_m"),
        )
        .filter(F.col("_u") != F.col("_m"))
        .select(F.col("_u").alias("src"), F.col("_m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large→small, then per node link all smaller neighbors
    (and the node itself) to the minimum of the neighborhood."""
    canon = (
        edges.select(
            F.greatest("src", "dst").alias("_hi"), F.least("src", "dst").alias("_lo")
        )
        .filter(F.col("_hi") != F.col("_lo"))
        .select(F.col("_hi").alias("src"), F.col("_lo").alias("dst"))
        .distinct()
    )
    nb = canon.groupBy("src").agg(F.collect_set("dst").alias("nbrs"))
    with_self = F.array_union("nbrs", F.array("src"))
    m = F.array_min(with_self)
    return (
        nb.select(
            F.explode(F.filter(with_self, lambda v: v != m)).alias("_u"),
            m.alias("_m"),
        )
        .select(F.col("_u").alias("src"), F.col("_m").alias("dst"))
        .distinct()
    )


def _connected_components_star(pairs: DataFrame, max_rounds: int = 20) -> DataFrame:
    """(doc_id, cluster_id) via alternating large-star/small-star until the
    canonical edge set stops changing — then every edge is (node, component
    min). Convergence test is an order-insensitive checksum (count + sum of
    a per-edge hash), one tiny scalar agg per round."""
    edges = (
        pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )

    def _sig(e: DataFrame) -> tuple:
        r = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash(F.least("src", "dst"), F.greatest("src", "dst"))).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    sig = _sig(edges)
    for _ in range(max_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        new_sig = _sig(edges)
        if new_sig == sig:
            break
        sig = new_sig
    roots = edges.select(F.col("dst").alias("doc_id")).distinct().withColumn(
        "cluster_id", F.col("doc_id")
    )
    return edges.select(
        F.col("src").alias("doc_id"), F.col("dst").alias("cluster_id")
    ).union(roots).distinct()


@query(
    "dedup_fuzzy_levenshtein",
    oracle="""
    WITH names AS (
        SELECT DISTINCT p_name AS name FROM part
    ), keyed AS (
        SELECT name,
               unnest([CAST(floor(length(name) / 2) AS BIGINT),
                       CAST(floor(length(name) / 2) AS BIGINT) + 1]) AS k
        FROM names
    ), pairs AS (
        SELECT DISTINCT a.name AS name_a, b.name AS name_b
        FROM keyed a JOIN keyed b ON a.k = b.k AND a.name < b.name
    )
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
    FROM pairs
    WHERE levenshtein(name_a, name_b) <= 2
    """,
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy attribute dedup: name pairs within edit distance 2, blocked so
    the expensive comparison never goes all-pairs.

    Blocking is LOSSLESS for this radius: lev ≤ 2 bounds the length gap to
    2, so floor(len/2) differs by at most 1 — each name emits block keys
    {b, b+1} and every qualifying pair meets in some block. Pipeline:
    distinct values (fuzzy matching runs over the attribute DOMAIN, tiny
    vs the fact table) → explode 2 block keys → equi-join within block
    (a < b) → distinct → exact levenshtein only on candidates. The same
    recall-lossless blocking holds at any scale; widen the radius and the
    key set widens with it."""
    part = load_table(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    blk = F.floor(F.length("name") / 2).cast("long")
    keyed = names.select(
        "name", F.explode(F.array(blk, blk + 1)).alias("k")
    )
    a = keyed.select(F.col("name").alias("name_a"), "k")
    b = keyed.select(F.col("name").alias("name_b"), "k")
    pairs = (
        a.join(b, "k")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b")
    return pairs.filter(dist <= 2).select(
        "name_a", "name_b", dist.cast("long").alias("dist")
    )


# --------------------------------------------------------------------------
# Canonical-text ("fuzzy-exact") dedup: normalize then hash — the C4/CCNet
# recipe that catches case/punctuation/whitespace variants exact dedup
# misses, at exact-dedup cost.
# --------------------------------------------------------------------------
# Portable normalization pipeline (identical regex semantics on both
# engines): lowercase → strip everything but [a-z0-9 ] → collapse runs of
# spaces → trim.
_NORM_SPARK = lambda c: F.trim(  # noqa: E731
    F.regexp_replace(
        F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " "), " +", " "
    )
)
_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)


@query(
    "dedup_normalized_text",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, md5(text) AS raw_hash,
               md5({_NORM_SQL.format(c='text')}) AS norm_hash
        FROM documents
    )
    SELECT norm_hash,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
           count(*) AS n_docs,
           CAST(count(DISTINCT raw_hash) AS BIGINT) AS n_raw_variants
    FROM keyed
    GROUP BY norm_hash
    HAVING count(*) > 1
    """,
)
def dedup_normalized_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-text dedup (the C4/CCNet normalize-then-hash recipe):
    lowercase, strip punctuation, collapse whitespace, hash — groups that
    differ only in case/punctuation/spacing collapse to one key, catching
    the near-identical boilerplate exact dedup misses. ``n_raw_variants``
    counts how many byte-distinct texts each canonical group absorbed.

    Cost is identical to exact dedup at any scale: the normalization is a
    scan-stage projection (whole-stage codegen, no UDF), then ONE shuffle
    on the 128-bit canonical hash. Min-doc_id keeper is the same
    deterministic keeper rule the exact/MinHash paths use."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5("text").alias("raw_hash"),
        F.md5(_NORM_SPARK(F.col("text"))).alias("norm_hash"),
    )
    return (
        keyed.groupBy("norm_hash")
        .agg(
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("raw_hash").cast("long").alias("n_raw_variants"),
        )
        .filter(F.col("n_docs") > 1)
    )


# --------------------------------------------------------------------------
# Cluster-size distribution: the report a dedup run actually ships — how
# much of the corpus sits in singletons vs boilerplate mega-clusters, and
# how many docs dedup would remove at keeper-per-cluster.
# --------------------------------------------------------------------------
def _cluster_sizes_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH clusters AS MATERIALIZED ({ORACLES['dedup_clusters']}),
    sized AS (
        SELECT cluster_id, count(*) AS cluster_size FROM clusters
        GROUP BY cluster_id
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           count(*) AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS n_docs,
           CAST(sum(cluster_size - 1) AS BIGINT) AS n_removable
    FROM sized
    GROUP BY cluster_size
    """


@query("dedup_cluster_sizes", oracle=_cluster_sizes_oracle())
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram over the REGISTERED connected
    components (engine and oracle both compose dedup_clusters, so the
    report can never disagree with the clustering): per size, how many
    clusters, how many documents they hold, and how many docs a
    keeper-per-cluster policy removes. The shape that decides whether a
    corpus has a boilerplate problem before anyone deletes anything.
    Two tiny aggregations over the cluster assignment — cost lives in
    the clustering itself."""
    from ..registry import QUERIES

    clusters = QUERIES["dedup_clusters"](spark, sf_dir)
    sized = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sized.groupBy(F.col("cluster_size").cast("long").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("cluster_size").cast("long").alias("n_docs"),
            F.sum(F.col("cluster_size") - 1).cast("long").alias("n_removable"),
        )
    )


# --------------------------------------------------------------------------
# Incremental ingest dedup: the daily-batch production shape — new docs
# checked against the historical corpus without re-deduping history.
# --------------------------------------------------------------------------
INGEST_MOD = 5  # hash48(doc_id) % 5 == 0 → ~20% "incoming batch"


def _incremental_oracle() -> str:
    h = sql_hash48("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH keyed AS (
        SELECT doc_id, source,
               md5(text) AS raw_hash,
               md5({_NORM_SQL.format(c='text')}) AS norm_hash,
               {h} % {INGEST_MOD} = 0 AS is_incoming
        FROM documents
    ), history AS (
        SELECT DISTINCT raw_hash, norm_hash FROM keyed WHERE NOT is_incoming
    )
    SELECT k.source,
           count(*) AS n_incoming,
           CAST(sum(CASE WHEN h_raw.raw_hash IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dups,
           CAST(sum(CASE WHEN h_raw.raw_hash IS NULL
                              AND h_norm.norm_hash IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical_dups,
           CAST(sum(CASE WHEN h_raw.raw_hash IS NULL
                              AND h_norm.norm_hash IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
    FROM (SELECT * FROM keyed WHERE is_incoming) k
    LEFT JOIN (SELECT DISTINCT raw_hash FROM history) h_raw
           ON h_raw.raw_hash = k.raw_hash
    LEFT JOIN (SELECT DISTINCT norm_hash FROM history) h_norm
           ON h_norm.norm_hash = k.norm_hash
    GROUP BY k.source
    """


@query("dedup_incremental_ingest", oracle=_incremental_oracle())
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest dedup against the historical corpus: each incoming doc
    (a deterministic ~20% hash split plays the new batch) is classified
    exact-dup / canonical-dup (C4 normalize-then-hash) / novel against
    the history's hash index, per source. This is the PRODUCTION dedup
    shape — history is touched only through its distinct hash sets,
    never re-deduped, so the per-batch cost is O(batch + index probe).

    At 100 TB the history hash sets live as a compacted table keyed by
    hash; the probes are plain equi-joins on 128-bit keys (shuffle or
    broadcast depending on batch size) — here expressed exactly that
    way. Left joins preserve every incoming doc; the classification is
    mutually exclusive by construction."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("raw_hash"),
        F.md5(_NORM_SPARK(F.col("text"))).alias("norm_hash"),
        (hash48(F.col("doc_id").cast("string")) % INGEST_MOD == 0).alias(
            "is_incoming"
        ),
    )
    history = keyed.filter(~F.col("is_incoming"))
    h_raw = history.select("raw_hash").distinct().withColumn("hit_raw", F.lit(1))
    h_norm = (
        history.select("norm_hash").distinct().withColumn("hit_norm", F.lit(1))
    )
    incoming = keyed.filter("is_incoming")
    classified = (
        incoming.join(h_raw, "raw_hash", "left")
        .join(h_norm, "norm_hash", "left")
    )
    exact = F.col("hit_raw").isNotNull()
    canon = F.col("hit_raw").isNull() & F.col("hit_norm").isNotNull()
    novel = F.col("hit_raw").isNull() & F.col("hit_norm").isNull()
    return classified.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_incoming"),
        F.sum(exact.cast("int")).cast("long").alias("n_exact_dups"),
        F.sum(canon.cast("int")).cast("long").alias("n_canonical_dups"),
        F.sum(novel.cast("int")).cast("long").alias("n_novel"),
    )


# ---------------------------------------------------------------------------
# Near-dup source matrix: where does duplication live — inside a source
# (boilerplate/templates) or across sources (mirrors/scrapes)? The table
# that decides whether dedup should run per-source or globally.
# ---------------------------------------------------------------------------
def _source_matrix_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH pairs AS MATERIALIZED ({ORACLES['dedup_minhash_lsh']}),
    src AS (SELECT doc_id, source FROM documents),
    tagged AS (
        SELECT least(sa.source, sb.source) AS src_a,
               greatest(sa.source, sb.source) AS src_b,
               p.jaccard
        FROM pairs p
        JOIN src sa ON sa.doc_id = p.a_id
        JOIN src sb ON sb.doc_id = p.b_id
    )
    SELECT src_a, src_b,
           count(*) AS n_pairs,
           CAST(src_a = src_b AS INT) AS within_source,
           min(jaccard) AS min_jaccard,
           max(jaccard) AS max_jaccard
    FROM tagged
    GROUP BY src_a, src_b
    """


@query("dedup_source_matrix", oracle=_source_matrix_oracle())
def dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate source matrix: the verified MinHash-LSH pairs
    (composes the REGISTERED dedup_minhash_lsh on both sides) classified
    by the (source, source) pair they straddle, with least/greatest
    canonicalization so (a,b) and (b,a) land in one cell. Within-source
    mass means template boilerplate — dedup per source shard; off-diagonal
    mass means mirrored content — dedup must be global.

    Plan shape: the pair list is near-dup-sized, not corpus-sized; the
    two doc_id→source lookups are equi-joins against a 2-column
    projection of the CORPUS-cardinality documents table, so the
    broadcast decision is left to size statistics / AQE (auto-broadcast
    at test scale, shuffle join at corpus scale — forcing a broadcast of
    every doc_id would OOM at 100 TB even as two columns); the matrix
    rollup keys on the tiny (src_a, src_b) space. All the heavy lifting
    stays inside the composed LSH query with its bucketed candidate
    generation."""
    from ..registry import QUERIES

    pairs = QUERIES["dedup_minhash_lsh"](spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("a_id"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("b_id"), F.col("source").alias("sb"))
    tagged = (
        pairs.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
            "jaccard",
        )
    )
    return tagged.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (F.col("src_a") == F.col("src_b")).cast("int").alias("within_source"),
        F.min("jaccard").alias("min_jaccard"),
        F.max("jaccard").alias("max_jaccard"),
    )


# ---------------------------------------------------------------------------
# Prefix-filtering set-similarity join (SSJoin/PPJoin family): the EXACT
# sibling of MinHash-LSH — recall-lossless by theorem, not probabilistic.
# ---------------------------------------------------------------------------
def _prefix_filter_oracle() -> str:
    # pf_sh is read three times (pf_ex + both verify joins) and pf_ex
    # twice — MATERIALIZED stops DuckDB re-tokenizing the corpus per
    # reference (execution hint only; results bit-identical). The CTE
    # names carry a pf_ prefix because DuckDB hoists materialized CTEs:
    # composers embed this oracle NEXT TO _minhash_oracle_ctes' own
    # sh/ex/cand and unprefixed names collide ("Duplicate alias" binder
    # error in er_blocking_quality).
    return f"""
    WITH pf_sh AS MATERIALIZED (
        SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
    ), pf_ex AS MATERIALIZED (
        SELECT doc_id, unnest(shingles) AS shingle FROM pf_sh
    ), pf_dfreq AS (
        SELECT shingle, count(*) AS df FROM pf_ex GROUP BY shingle
    ), pf_ranked AS (
        SELECT e.doc_id, e.shingle,
               row_number() OVER (PARTITION BY e.doc_id
                                  ORDER BY d.df, e.shingle) AS rn,
               count(*) OVER (PARTITION BY e.doc_id) AS sz
        FROM pf_ex e JOIN pf_dfreq d USING (shingle)
    ), pf_prefix AS (
        SELECT doc_id, shingle, sz FROM pf_ranked
        WHERE rn <= sz - (sz + 1) // 2 + 1
    ), pf_cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM pf_prefix a JOIN pf_prefix b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         AND a.sz >= (b.sz + 1) // 2 AND b.sz >= (a.sz + 1) // 2
    )
    SELECT c.a_id, c.b_id,
           round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                 / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6) AS jaccard
    FROM pf_cand c
    JOIN pf_sh sa ON sa.doc_id = c.a_id
    JOIN pf_sh sb ON sb.doc_id = c.b_id
    WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
          / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= {JACCARD_THRESHOLD}
    """


@query("dedup_prefix_filter_jaccard", oracle=_prefix_filter_oracle())
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (the
    SSJoin/PPJoin candidate generator): shingles order globally by
    (document frequency, shingle) — rarest first — and a pair can reach
    Jaccard >= t ONLY if it shares a shingle inside each side's first
    |S| - ceil(t|S|) + 1 shingles (overlap >= ceil(t|S|) is implied by
    J >= t, and two sets with that overlap must collide in those
    prefixes). Candidates then verify exact Jaccard. Unlike
    dedup_minhash_lsh this is recall-LOSSLESS — the output IS every pair
    at J >= {JACCARD_THRESHOLD} — at the cost of an exact df build
    (property-tested against brute-force all-pairs).

    Scale posture: the df table and prefix extraction are two
    shingle-/doc-keyed shuffles; the candidate join keys on PREFIX
    shingles only, and because prefixes hold each document's RAREST
    shingles, join buckets are small by construction (a shingle of
    document frequency d contributes <= d²/2 pairs, and high-df
    boilerplate shingles are exactly the ones excluded from prefixes).
    No cap is applied — capping would break exactness; if a corpus has
    adversarial mass at tiny sizes, pre-filter by length or fall back to
    the capped LSH path.

    The result is memoized per (session, sf_dir): it is the lossless
    TRUTH SET for three recall auditors (dedup_lsh_recall,
    dedup_lsh_band_sweep, dedup_simhash_recall), and the exact SSJoin is
    the single most expensive dedup pass — pay it once per process
    (VERDICT r4 item 5)."""
    return shared(
        spark, sf_dir, "jaccard_truth",
        lambda: _prefix_filter_jaccard_build(spark, sf_dir),
        deps=(lambda: _verify_shingles(spark, sf_dir),),
    )


def _prefix_filter_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless prefix-filter candidate pairs (a_id, b_id) — the shared
    generation step of the exact truth build and the sampled estimator.

    Shingles reduce to int64 hashes IMMEDIATELY: the prefix-filter
    theorem holds under ANY global total order on shingles (pigeonhole),
    so ordering/joining on hash48 instead of the string changes only
    WHICH superset of candidates is generated, never the verified
    output — and it shrinks the window-rank's spill rows from ~25-byte
    strings to 8-byte longs (the sf10 probe hit the local temp-disk
    ceiling on the string form). A 48-bit collision merely merges two
    shingles' df counts (df is a heuristic for the order) or creates one
    spurious candidate (the exact verify drops it). |S| is carried from
    the un-exploded array: one window (the rank) instead of two over the
    exploded relation.

    Round 7: the exploded (doc_id, sz, h) relation reuses the MEMOIZED
    int64 table when its injectivity certificate holds (identical h
    multiset per doc ⇒ identical candidates; saves re-hashing 260k
    shingles per consumer), and df rides in as a count() window over h
    instead of a groupBy + join back on h (one fewer pass over ex, same
    values — measured 1.04 s → 0.63 s for the ranked stage at sf0.1)."""
    vs = _verify_shingles(spark, sf_dir)
    if _verify_is_hashed(vs):
        ex = vs.select(
            "doc_id",
            F.size("shingles").alias("sz"),
            F.explode("shingles").alias("h"),
        )
    else:
        ex = _doc_shingles(spark, sf_dir).select(
            "doc_id",
            F.size("shingles").alias("sz"),
            F.explode("shingles").alias("shingle"),
        ).select("doc_id", "sz", hash48(F.col("shingle")).alias("h"))
    wd = Window.partitionBy("doc_id")
    ranked = ex.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("h"))
    ).withColumn("rn", F.row_number().over(wd.orderBy("df", "h")))
    prefix = ranked.filter(
        F.col("rn") <= F.expr("sz - (sz + 1) div 2 + 1")
    ).select("doc_id", "h", "sz")
    a = prefix.select(
        F.col("doc_id").alias("a_id"), "h", F.col("sz").alias("a_sz")
    )
    b = prefix.select(
        F.col("doc_id").alias("b_id"), "h", F.col("sz").alias("b_sz")
    )
    # length filter (lossless): J >= t forces t <= |A|/|B| <= 1/t, so
    # size-mismatched collisions drop before the distinct + verify join
    return (
        a.join(b, "h")
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.col("a_sz") >= F.expr("(b_sz + 1) div 2"))
            & (F.col("b_sz") >= F.expr("(a_sz + 1) div 2"))
        )
        .select("a_id", "b_id")
        .distinct()
    )


def _prefix_filter_jaccard_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _verify_shingles(spark, sf_dir)
    cand = _prefix_filter_candidates(spark, sf_dir)
    return (
        _pair_jaccard(cand, sh)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Cluster keeper selection by quality: the step that turns connected
# components into an actual dedup decision.
# ---------------------------------------------------------------------------
def _cluster_keeper_oracle() -> str:
    from ..registry import ORACLES

    # force text_quality's registration: dedup imports before textstats in
    # load_all, and this builder runs at decoration time (textstats has no
    # import edge back into dedup, so this cannot cycle)
    from . import textstats  # noqa: F401

    return f"""
    WITH clusters AS MATERIALIZED ({ORACLES['dedup_clusters']}),
    q AS MATERIALIZED ({ORACLES['text_quality']}),
    scored AS (
        SELECT c.cluster_id, c.doc_id, q.quality
        FROM clusters c JOIN q USING (doc_id)
    )
    SELECT cluster_id,
           count(*) AS n_members,
           (min(struct_pack(nq := -quality, d := doc_id))).d AS keeper_doc_id,
           (min(struct_pack(nq := -quality, d := doc_id))).nq * -1.0
               AS keeper_quality,
           count(*) - 1 AS n_dropped
    FROM scored GROUP BY cluster_id
    """


@query("dedup_cluster_keeper_quality", oracle=_cluster_keeper_oracle())
def dedup_cluster_keeper_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION step: for each near-duplicate cluster (composes
    the REGISTERED connected-components labeling) keep the
    highest-quality member (composes the REGISTERED text_quality score;
    ties break to the smaller doc_id via a single struct-min), drop the
    rest. Min-doc_id keeper selection (dedup_exact's rule) is the right
    default for byte-identical copies; for NEAR-duplicates the copies
    genuinely differ, and keeping the best-scoring variant is what a
    production corpus prep actually does.

    Determinism: quality is the registered 6-dp-rounded double —
    identical on both engines — so the (max quality, min doc_id)
    struct-min picks the same keeper everywhere. Plan shape: the CC
    label table is near-dup-scale; the quality join keys on doc_id
    against a scan-stage projection; the rollup keys on cluster_id. All
    heavy lifting stays inside the composed CC query (O(log n)
    large-star/small-star rounds, bucketed candidates)."""
    from ..registry import QUERIES

    clusters = QUERIES["dedup_clusters"](spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    q = QUERIES["text_quality"](spark, sf_dir).select("doc_id", "quality")
    scored = clusters.join(q, "doc_id")
    pick = F.min(F.struct((-F.col("quality")).alias("nq"), F.col("doc_id").alias("d")))
    return scored.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        pick["d"].alias("keeper_doc_id"),
        (pick["nq"] * -1.0).alias("keeper_quality"),
        (F.count(F.lit(1)) - 1).alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# SimHash hamming<=1 pairs via multi-index probing: equal-fingerprint
# buckets miss near-misses; flipping each bit once catches them without
# any pairwise hamming scan.
# ---------------------------------------------------------------------------
def _simhash_h1_oracle() -> str:
    probes = ", ".join(
        ["simhash16"] + [f"xor(simhash16, {1 << b})" for b in range(SIMHASH_BITS)]
    )
    return (
        _simhash_oracle()
        + f""", probes AS (
        SELECT doc_id, unnest([{probes}]) AS key FROM fp
    ), ident AS (
        SELECT doc_id, simhash16 AS key, simhash16 FROM fp
    ), pairs AS (
        SELECT DISTINCT p.doc_id AS a_id, i.doc_id AS b_id
        FROM probes p JOIN ident i ON i.key = p.key AND p.doc_id < i.doc_id
    )
    SELECT pr.a_id, pr.b_id,
           CAST(bit_count(xor(fa.simhash16, fb.simhash16)) AS BIGINT)
               AS hamming
    FROM pairs pr
    JOIN fp fa ON fa.doc_id = pr.a_id
    JOIN fp fb ON fb.doc_id = pr.b_id
    """
    )


@query("dedup_simhash_hamming1", oracle=_simhash_h1_oracle())
def dedup_simhash_hamming1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-miss SimHash pairs at hamming distance <= 1 via MULTI-INDEX
    probing: each document emits its fingerprint plus all {SIMHASH_BITS}
    single-bit flips as probe keys; a probe colliding with another
    document's identity key certifies hamming <= 1 BY CONSTRUCTION (the
    output hamming column re-derives it from bit_count(xor) as a
    witness). This is the standard hamming-LSH trick (Manku et al.'s
    simhash dedup): candidates come from (1 + bits) equi-join keys per
    doc — never a pairwise hamming scan, which is quadratic and
    un-shardable.

    Scale posture: probe expansion multiplies rows by 17, not bytes; the
    key join is a plain hash shuffle whose buckets are fingerprint
    collision groups (for wider fingerprints / larger radii the same
    pattern splits the fingerprint into blocks — d+1 blocks guarantee a
    block match at distance d). Composes the REGISTERED dedup_simhash on
    both sides.

    Memoized per (session, sf_dir): dedup_simhash_recall and
    dedup_detector_ensemble both re-consume the pair set."""
    return shared(
        spark, sf_dir, "simhash_hamming1",
        lambda: _simhash_hamming1_build(spark, sf_dir),
        deps=(lambda: dedup_simhash(spark, sf_dir),),
    )


def _simhash_hamming1_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..registry import QUERIES

    fp = QUERIES["dedup_simhash"](spark, sf_dir)
    probe_keys = F.array(
        F.col("simhash16"),
        *[
            F.col("simhash16").bitwiseXOR(F.lit(1 << b))
            for b in range(SIMHASH_BITS)
        ],
    )
    probes = fp.select("doc_id", F.explode(probe_keys).alias("key"))
    ident = fp.select(
        F.col("doc_id").alias("b_id"), F.col("simhash16").alias("key")
    )
    pairs = (
        probes.join(ident, "key")
        .filter(F.col("doc_id") < F.col("b_id"))
        .select(F.col("doc_id").alias("a_id"), "b_id")
        .distinct()
    )
    fa = fp.select(F.col("doc_id").alias("a_id"), F.col("simhash16").alias("fa"))
    fb = fp.select(F.col("doc_id").alias("b_id"), F.col("simhash16").alias("fb"))
    return (
        pairs.join(fa, "a_id")
        .join(fb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
            .cast("long")
            .alias("hamming"),
        )
    )


# ---------------------------------------------------------------------------
# LSH recall audit: probabilistic candidates measured against the exact
# prefix-filter truth set — the honest-measurement pattern from sim_recall_*.
# ---------------------------------------------------------------------------
def _lsh_recall_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH t AS MATERIALIZED ({ORACLES['dedup_prefix_filter_jaccard']}),
    l AS MATERIALIZED ({ORACLES['dedup_minhash_lsh']}),
    h AS (
        SELECT count(*) AS n_hit
        FROM t WHERE EXISTS (
            SELECT 1 FROM l WHERE l.a_id = t.a_id AND l.b_id = t.b_id)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM t) AS n_truth,
           (SELECT CAST(count(*) AS BIGINT) FROM l) AS n_lsh,
           CAST(h.n_hit AS BIGINT) AS n_hit,
           CAST(h.n_hit AS DOUBLE)
               / nullif(CAST((SELECT count(*) FROM t) AS DOUBLE), 0.0)
               AS recall
    FROM h
    """


@query("dedup_lsh_recall", oracle=_lsh_recall_oracle())
def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the MinHash-LSH near-dup detector against the
    provably-complete truth set: dedup_prefix_filter_jaccard is
    recall-LOSSLESS by the prefix-filtering theorem, so every J >= 0.5
    pair it emits that LSH misses is a real false negative of the
    banding scheme (9 hashes / 3 bands + the BUCKET_CAP knob). This is
    the calibration number that justifies the band/row/cap parameters in
    production — the same honest-measurement pattern as sim_recall_lsh /
    sim_recall_ivf on the ANN side, applied to dedup. Both sides verify
    exact Jaccard at the same threshold, so the comparison is purely
    about candidate generation.

    Plan: both pair sets come from the registered queries (bucketed
    candidate generation end-to-end, nothing all-pairs); the hit count
    is ONE left-semi join on the (a_id, b_id) pair key; the three
    1-row aggregates meet through broadcast crossJoins. Pair tables are
    near-dup-scale (<< corpus), so this audit is cheap at any SF."""
    from ..registry import QUERIES

    truth = QUERIES["dedup_prefix_filter_jaccard"](spark, sf_dir).select(
        "a_id", "b_id"
    )
    lsh = QUERIES["dedup_minhash_lsh"](spark, sf_dir).select("a_id", "b_id")
    # both pair tables are pinned upstream by the registered queries'
    # memos — each feeds two consumers here (its count and the hit join)
    n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    n_lsh = lsh.agg(F.count(F.lit(1)).cast("long").alias("n_lsh"))
    n_hit = (
        truth.join(lsh, ["a_id", "b_id"], "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    return (
        n_hit.crossJoin(F.broadcast(n_truth))
        .crossJoin(F.broadcast(n_lsh))
        .select(
            "n_truth",
            "n_lsh",
            "n_hit",
            (
                F.col("n_hit").cast("double")
                / F.nullif(F.col("n_truth").cast("double"), F.lit(0.0))
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# Are duplicates lower-quality? Point-biserial correlation between the
# quality score and near-dup cluster membership.
# ---------------------------------------------------------------------------
def _quality_dup_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH q AS MATERIALIZED ({ORACLES['text_quality']}),
    cl AS MATERIALIZED ({ORACLES['dedup_clusters']}),
    j AS (
        SELECT CAST(round(q.quality * 1000000) AS BIGINT) AS x,
               CASE WHEN cl.doc_id IS NULL THEN 0 ELSE 1 END AS y
        FROM q LEFT JOIN cl ON cl.doc_id = q.doc_id
        WHERE q.quality IS NOT NULL
    ), m AS (
        SELECT count(*) AS n,
               -- DECIMAL intermediates: DuckDB's HUGEINT->DOUBLE cast is
               -- 1-ulp sloppy, DECIMAL->DOUBLE is not (corr_exact pattern)
               CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxy
        FROM j
    )
    SELECT n AS n_docs,
           CAST(sy AS BIGINT) AS n_dup,
           (n * sxy - sx * sy)
               / nullif(sqrt(n * sxx - sx * sx) * sqrt(n * sy - sy * sy),
                        0.0) AS pointbiserial
    FROM m
    """


@query("quality_dup_pointbiserial", oracle=_quality_dup_oracle())
def quality_dup_pointbiserial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-biserial correlation between the composite quality score and
    near-duplicate cluster membership — the question every dedup policy
    decision rests on: "are the documents we're about to drop actually
    worse?". A strongly negative value validates drop-the-dup; near zero
    says keeper selection must look at quality explicitly (which is what
    dedup_cluster_keeper_quality then does). Composes the two REGISTERED
    queries, so the audit moves when either definition moves.

    Exactness: quality is already 6-dp-rounded, so x = round(q·10⁶) is
    an unambiguous integer on both engines (the value sits within ~1e-9
    of an integer — no tie to disagree on); y ∈ {0,1}; all five moments
    are exact integer sums (y² = y), and the Pearson assembly follows
    corr_exact's pinned cast-then-arithmetic order. The degenerate
    all-dup / no-dup corpus nulls out via nullif instead of Inf.

    Plan: quality is map-only; the membership flag is ONE doc_id-keyed
    left join against the (near-dup-scale) cluster table; the moment
    rollup is a single partial-aggregatable pass. The CC iteration
    inside dedup_clusters dominates — this audit adds a join and an
    aggregate."""
    from ..registry import QUERIES

    q = QUERIES["text_quality"](spark, sf_dir).filter(
        F.col("quality").isNotNull()
    )
    cl = QUERIES["dedup_clusters"](spark, sf_dir).select("doc_id").withColumn(
        "is_dup", F.lit(1)
    )
    j = q.join(cl, "doc_id", "left").select(
        F.expr("CAST(round(quality * 1000000) AS BIGINT)").alias("x"),
        F.coalesce(F.col("is_dup"), F.lit(0)).alias("y"),
    )
    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y").cast("long") * F.col("x")).cast("double").alias("sxy"),
    )
    return m.select(
        F.col("n").alias("n_docs"),
        F.col("sy").cast("long").alias("n_dup"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.nullif(
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("sy") - F.col("sy") * F.col("sy")),
                F.lit(0.0),
            )
        ).alias("pointbiserial"),
    )


# ---------------------------------------------------------------------------
# LSH banding sweep: recall and candidate cost across (bands x rows)
# arrangements of the SAME 9-hash signature — the banding tuner.
# ---------------------------------------------------------------------------
BAND_SWEEP = (1, 3, 9)  # bands; rows per band = 9 // bands


def _sweep_band_ctes(bands: int, tag: str) -> str:
    """banded/capped/cand CTEs for a given band count, suffixed by tag
    (mirrors _minhash_oracle_ctes' stages from the shared mh table)."""
    band_rows = "\n        UNION ALL BY NAME\n".join(
        f"        SELECT doc_id, {b} AS band_idx, "
        f"{' || chr(124) || '.join(cols)} AS band_sig FROM mh"
        for b, cols in band_keys(NUM_HASHES, bands)
    )
    return f"""banded_{tag} AS MATERIALIZED (
{band_rows}
    ), capped_{tag} AS (
        SELECT * FROM (
            SELECT banded_{tag}.*,
                   count(*) OVER (PARTITION BY band_idx, band_sig) AS _n
            FROM banded_{tag}
        ) WHERE _n <= {BUCKET_CAP}
    ), cand_{tag} AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM capped_{tag} a JOIN capped_{tag} b
          ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
         AND a.doc_id < b.doc_id
    )"""


def _band_sweep_oracle() -> str:
    from ..registry import ORACLES

    mh_aggs = ",\n               ".join(sql_affine_min_aggs("h", NUM_HASHES))
    ctes = ",\n    ".join(
        _sweep_band_ctes(b, f"b{b}") for b in BAND_SWEEP
    )
    per_b = "\n    UNION ALL\n".join(
        f"""    SELECT {b} AS bands, {NUM_HASHES // b} AS rows_per_band,
           (SELECT CAST(count(*) AS BIGINT) FROM (
                SELECT band_idx, band_sig FROM banded_b{b}
                GROUP BY band_idx, band_sig HAVING count(*) > {BUCKET_CAP}))
               AS n_capped_buckets,
           (SELECT CAST(count(*) AS BIGINT) FROM cand_b{b}) AS n_candidates,
           (SELECT CAST(count(*) AS BIGINT)
            FROM t WHERE EXISTS (
                SELECT 1 FROM cand_b{b} c
                WHERE c.a_id = t.a_id AND c.b_id = t.b_id)) AS n_pairs,
           (SELECT CAST(count(*) AS BIGINT) FROM t) AS n_truth,
           CAST((SELECT count(*)
                 FROM t WHERE EXISTS (
                     SELECT 1 FROM cand_b{b} c
                     WHERE c.a_id = t.a_id AND c.b_id = t.b_id))
                AS DOUBLE)
               / nullif(CAST((SELECT count(*) FROM t) AS DOUBLE), 0.0)
               AS recall"""
        for b in BAND_SWEEP
    )
    return f"""
    WITH sh AS (
        SELECT doc_id, {_SQL_SHINGLES} AS shingles
        FROM documents
    ), ex AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), hv AS (
        SELECT doc_id, {sql_hash48("shingle")} % {MINHASH_P} AS h FROM ex
    ), mh AS (
        SELECT doc_id,
               {mh_aggs}
        FROM hv GROUP BY doc_id
    ),
    {ctes},
    t AS MATERIALIZED ({ORACLES['dedup_prefix_filter_jaccard']})
{per_b}
    """


@query("dedup_lsh_band_sweep", oracle=_band_sweep_oracle())
def dedup_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH banding tuner: ONE 9-hash signature table, re-banded three
    ways — (1×9) high-precision/low-recall, (3×3) the production
    default, (9×1) high-recall/candidate-flood — each scored by
    candidate volume (the verification bill), verified-pair count, and
    recall against the lossless prefix-filter truth. This is the table
    that PICKS the banding scheme; sim_ivf_nprobe_curve is the same
    instrument pointed at IVF. The S-curve P(collide) = 1-(1-J^r)^b is
    theory; this measures it on the actual corpus, cap included.

    Plan: memoized signatures (shared with the LSH detector), then ALL
    THREE schemes run in ONE pass — the scheme id rides in the bucket
    key, so one explode (every scheme's band structs at once), ONE
    (bands, band_idx, band_sig) aggregation, ONE in-row pair expansion +
    distinct, ONE pair-keyed semi join against the (memoized) truth set.
    Round 5 ran the loop per scheme (3 persists + 3 counts + 3 semi
    joins = ~9 serial driver-blocking jobs); the fused form is 2 jobs on
    3× the rows — far better parallelized on a small corpus and the same
    shuffle volume at any corpus size. The semi join yields BOTH n_pairs
    and recall: the truth set is by the prefix-filter theorem EXACTLY
    the pairs with J >= the threshold, so "candidates that pass exact
    verification" IS "candidates ∩ truth" — re-running a per-candidate
    set intersection (as earlier rounds did) recomputes what the
    memoized truth already knows, and for the (9x1) candidate-flood
    scheme that redundant bill was ~93k set intersections (the round-5
    bench tail). n_candidates remains the honest measure of what
    verification WOULD cost on a corpus without a truth oracle.
    n_capped_buckets makes the recall knob's bite visible per scheme
    (with zero capped buckets, finer banding is provably a candidate
    superset — the monotonicity the property test checks). Everything
    downstream of the corpus scan is signature-/pair-scale."""
    from ..registry import QUERIES

    mh = _signatures_shared(spark, sf_dir)
    truth = QUERIES["dedup_prefix_filter_jaccard"](spark, sf_dir).select(
        "a_id", "b_id"
    )  # pinned upstream by the registered query's memo (7 consumers here)
    n_truth_df = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    # every scheme's band structs in one explode: (bands, band_idx, band_sig)
    all_band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("bands"),
                F.lit(bi).alias("band_idx"),
                F.concat_ws("|", *cols).alias("band_sig"),
            )
            for b in BAND_SWEEP
            for bi, cols in band_keys(NUM_HASHES, b)
        ]
    )
    banded = mh.select("doc_id", F.explode(all_band_structs).alias("bs")).select(
        "doc_id", "bs.bands", "bs.band_idx", "bs.band_sig"
    )
    buckets = banded.groupBy("bands", "band_idx", "band_sig").agg(
        F.collect_list("doc_id").alias("members")
    )
    ms = F.array_sort("members")
    pair_arr = F.flatten(
        F.transform(
            ms,
            lambda x: F.transform(
                ms, lambda y: F.struct(x.alias("a_id"), y.alias("b_id"))
            ),
        )
    )
    cand = (
        buckets.filter(
            (F.size("members") >= 2) & (F.size("members") <= BUCKET_CAP)
        )
        .select("bands", F.explode(pair_arr).alias("p"))
        .filter(F.col("p.a_id") < F.col("p.b_id"))
        .select("bands", "p.a_id", "p.b_id")
        .distinct()
    )
    n_capped = buckets.filter(F.size("members") > BUCKET_CAP).groupBy(
        "bands"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_capped_buckets"))
    # ONE left join + grouped agg yields candidate count, verified-pair
    # count, and recall per scheme: truth IS the exact J >= threshold
    # pair set (see docstring). cand has exactly one consumer, so no
    # persist/eager-count job is needed.
    per_scheme = (
        cand.join(
            truth.withColumn("hit", F.lit(1)), ["a_id", "b_id"], "left"
        )
        .groupBy("bands")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hit"),
        )
    )
    schemes = spark.createDataFrame(
        [(b, NUM_HASHES // b) for b in BAND_SWEEP], "bands int, rows_per_band int"
    )
    return (
        schemes.join(F.broadcast(n_capped), "bands", "left")
        .join(F.broadcast(per_scheme), "bands", "left")
        .crossJoin(F.broadcast(n_truth_df))
        .select(
            "bands",
            "rows_per_band",
            F.coalesce("n_capped_buckets", F.lit(0)).alias("n_capped_buckets"),
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.coalesce("n_hit", F.lit(0)).alias("n_pairs"),
            "n_truth",
            (
                F.coalesce("n_hit", F.lit(0)).cast("double")
                / F.nullif(F.col("n_truth").cast("double"), F.lit(0.0))
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental connected components via graph contraction: merge a new batch
# of pairs into existing cluster labels WITHOUT re-walking the old graph.
# ---------------------------------------------------------------------------
def _incremental_clusters_oracle() -> str:
    from ..registry import ORACLES

    # the contract IS equality with the full recompute: same oracle.
    return ORACLES["dedup_clusters"]


@query("dedup_clusters_incremental", oracle=_incremental_clusters_oracle())
def dedup_clusters_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup clustering — the production shape when a new
    crawl batch lands on a corpus with billions of already-clustered
    docs: docs at or above the split point (half the id space here,
    standing in for "yesterday's corpus vs today's batch") arrive as new
    pairs, and instead of re-running connected components on the full
    graph, the old graph is CONTRACTED to its existing cluster labels:
    new pairs re-keyed through the old labels, self-loops (intra-cluster
    confirmations) dropped, and the iterative CC runs only on that
    contracted graph — whose size is bounded by the NEW batch's edge
    count, not the corpus. Final labels = old labels mapped through the
    contracted components. min-label semantics compose exactly (each
    old label IS its component's min doc id, new ids sort above old
    ones by construction of the split), so the result provably equals
    the full recompute — and the ORACLE IS the full-recompute oracle,
    making that equality the driver-checked contract, not a comment.

    Plan: one CC loop over history pairs (the amortized cost), one
    doc-keyed label join to contract, one CC loop over the contracted
    (batch-sized) graph, one label-keyed re-map join. At 100 TB the old
    labels live as a table and the history loop disappears entirely —
    exactly this code minus the first _connected_components call."""
    docs = load_table(spark, sf_dir, "documents")
    shingled = _verify_shingles(spark, sf_dir)
    pairs = (
        _pair_jaccard(_lsh_candidates(_signatures_shared(spark, sf_dir)), shingled)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("a_id", "b_id")
        .persist()
    )
    pairs.count()
    thr = docs.agg(
        F.expr("(max(doc_id) + 1) div 2").alias("k")
    )
    split = pairs.crossJoin(F.broadcast(thr)).persist()
    old_pairs = split.filter(F.col("b_id") < F.col("k")).select("a_id", "b_id")
    new_pairs = split.filter(F.col("b_id") >= F.col("k")).select("a_id", "b_id")
    old_labels = _connected_components(old_pairs).persist()
    old_labels.count()
    la = old_labels.select(
        F.col("doc_id").alias("a_id"), F.col("cluster_id").alias("la")
    )
    lb = old_labels.select(
        F.col("doc_id").alias("b_id"), F.col("cluster_id").alias("lb")
    )
    contracted = (
        new_pairs.join(la, "a_id", "left")
        .join(lb, "b_id", "left")
        .select(
            F.coalesce("la", F.col("a_id")).alias("ra"),
            F.coalesce("lb", F.col("b_id")).alias("rb"),
        )
        .filter(F.col("ra") != F.col("rb"))
        .select(
            F.least("ra", "rb").alias("a_id"),
            F.greatest("ra", "rb").alias("b_id"),
        )
        .distinct()
    )
    merged = _connected_components(contracted).persist()
    merged.count()
    # every clustered node's representative: its old label if it has one,
    # else itself (new node); final label = contracted component of the
    # representative when the new batch merged it, else the representative
    all_nodes = (
        pairs.select(F.col("a_id").alias("node"))
        .unionAll(pairs.select(F.col("b_id").alias("node")))
        .distinct()
    )
    reps = all_nodes.join(
        old_labels.withColumnRenamed("doc_id", "node"), "node", "left"
    ).select(
        "node", F.coalesce("cluster_id", F.col("node")).alias("rep")
    )
    return reps.join(
        merged.select(
            F.col("doc_id").alias("rep"), F.col("cluster_id").alias("mlabel")
        ),
        "rep",
        "left",
    ).select(
        F.col("node").alias("doc_id"),
        F.coalesce("mlabel", F.col("rep")).alias("cluster_id"),
    )


# ---------------------------------------------------------------------------
# MinHash estimator calibration: signature-agreement estimate vs exact
# Jaccard on every verified near-dup pair.
# ---------------------------------------------------------------------------
def _minhash_estimate_oracle() -> str:
    from ..registry import ORACLES

    mh_aggs = ",\n               ".join(sql_affine_min_aggs("h", NUM_HASHES))
    matches = " + ".join(
        f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)"
        for i in range(NUM_HASHES)
    )
    return f"""
    WITH p AS MATERIALIZED ({ORACLES['dedup_minhash_lsh']}),
    sh AS (
        SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
    ), ex AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), hv AS (
        SELECT doc_id, {sql_hash48("shingle")} % {MINHASH_P} AS h FROM ex
    ), mh AS (
        SELECT doc_id,
               {mh_aggs}
        FROM hv GROUP BY doc_id
    )
    SELECT p.a_id, p.b_id,
           CAST({matches} AS BIGINT) AS n_agree,
           CAST({matches} AS DOUBLE) / {NUM_HASHES} AS est_jaccard,
           p.jaccard AS exact_jaccard,
           abs(CAST({matches} AS DOUBLE) / {NUM_HASHES} - p.jaccard)
               AS abs_err
    FROM p
    JOIN mh a ON a.doc_id = p.a_id
    JOIN mh b ON b.doc_id = p.b_id
    """


@query("dedup_minhash_estimate_error", oracle=_minhash_estimate_oracle())
def dedup_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash as an ESTIMATOR, calibrated: for every verified near-dup
    pair, the signature-agreement estimate (matching components / 9)
    against the exact shingle Jaccard the pipeline verified — the error
    table that tells you whether 9 hashes suffice to SKIP verification
    at scale (E[est] = J exactly; sd = sqrt(J(1-J)/9) ≈ 0.17 at
    J = 0.5, which is why this engine verifies instead). Per-pair rows,
    so the reader can see the spread, not just a mean.

    Exactness: component agreement is integer equality on affine-min
    values both engines compute identically; the estimate is one
    division; exact_jaccard rides in from the registered query
    (6-dp-rounded there). No float aggregation anywhere.

    Plan: signatures are the SAME one-shuffle explode→groupBy build the
    detector uses; the pair table is near-dup-scale and joins twice on
    doc_id. Strictly cheaper than the detection it calibrates."""
    from ..registry import QUERIES

    pairs = QUERIES["dedup_minhash_lsh"](spark, sf_dir)
    mh = _signatures_shared(spark, sf_dir)  # memoized; both pair-side joins read it
    agree = sum(
        (F.col(f"a.mh{i}") == F.col(f"b.mh{i}")).cast("int")
        for i in range(NUM_HASHES)
    )
    return (
        pairs.join(mh.alias("a"), F.col("a.doc_id") == pairs.a_id)
        .join(mh.alias("b"), F.col("b.doc_id") == pairs.b_id)
        .select(
            "a_id",
            "b_id",
            agree.cast("long").alias("n_agree"),
            (agree.cast("double") / F.lit(float(NUM_HASHES))).alias(
                "est_jaccard"
            ),
            F.col("jaccard").alias("exact_jaccard"),
            F.abs(
                agree.cast("double") / F.lit(float(NUM_HASHES))
                - F.col("jaccard")
            ).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# Fellegi-Sunter-lite: per-feature match/unmatch agreement weights learned
# from the verified candidate pairs.
# ---------------------------------------------------------------------------
ER_LEN_BAND = 128  # chars per length band for the agreement feature
ER_BANDS = 9  # 9 bands x 1 row: the LOOSE banding, so non-matches enter the pool


_ER_FEATS = ("lang", "source", "len_band")


def _er_feat_ctes() -> str:
    """ver + feat CTEs shared by the ER queries: verified candidate pairs
    (cand_er from the loose 9x1 banding) with the 3 agreement flags."""
    feats = {
        "lang": "CASE WHEN da.lang = db.lang THEN 1 ELSE 0 END",
        "source": "CASE WHEN da.source = db.source THEN 1 ELSE 0 END",
        "len_band": (
            f"CASE WHEN da.n_chars // {ER_LEN_BAND}"
            f" = db.n_chars // {ER_LEN_BAND} THEN 1 ELSE 0 END"
        ),
    }
    feat_cols = ",\n               ".join(
        f"{expr} AS ag_{f}" for f, expr in feats.items()
    )
    return f""", shh_er AS (
        SELECT doc_id,
               list_distinct(list_transform(shingles,
                   __s -> {sql_hash48("__s")})) AS hsh
        FROM sh
    ), ver AS (
        SELECT c.a_id, c.b_id,
               CASE WHEN len(list_intersect(sa.hsh, sb.hsh))::DOUBLE
                         / len(list_distinct(list_concat(sa.hsh, sb.hsh)))
                         >= {JACCARD_THRESHOLD}
                    THEN 1 ELSE 0 END AS is_match
        FROM cand_er c
        JOIN shh_er sa ON sa.doc_id = c.a_id
        JOIN shh_er sb ON sb.doc_id = c.b_id
    ), feat AS (
        SELECT v.is_match,
               {feat_cols}
        FROM ver v
        JOIN documents da ON da.doc_id = v.a_id
        JOIN documents db ON db.doc_id = v.b_id
    )"""


_ER_TALLY_SQL = (
    "SELECT CAST(sum(is_match) AS BIGINT) AS n_m,\n"
    "               CAST(count(*) - sum(is_match) AS BIGINT) AS n_u,\n"
    "               "
    + ",\n               ".join(
        f"CAST(sum(ag_{f} * is_match) AS BIGINT) AS am_{f},"
        f" CAST(sum(ag_{f} * (1 - is_match)) AS BIGINT) AS au_{f}"
        for f in _ER_FEATS
    )
    + "\n        FROM feat"
)


def _er_feat_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized ER feature frame (round 8): er_match_weights reads it once
    and er_pattern_precision TWICE (pattern histogram + learned tally), so
    the unmemoized form paid the 9x1-flood candidate generation + verify
    three times per bench sweep — pair-scale rows (is_match + 3 flags),
    cheap to pin, rebuilt inside the timed region after every eviction
    like all shared() entries."""
    return shared(
        spark, sf_dir, "er_feat",
        lambda: _er_feat(spark, sf_dir),
        deps=(
            lambda: _verify_shingles(spark, sf_dir),
            lambda: _signatures_shared(spark, sf_dir),
        ),
    )


def _er_feat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _er_feat_ctes: verified loose-band candidate pairs
    with the 3 integer agreement flags."""
    docs = load_table(spark, sf_dir, "documents")
    cand = _lsh_candidates(_signatures_shared(spark, sf_dir), bands=ER_BANDS)
    # loose 9x1 banding floods candidates, so the verify bill is paid on
    # int64 hashed-shingle sets, not string arrays (the dedup_lsh_band_sweep
    # lesson). Round 7: the hashed table is the SHARED _verify_shingles
    # memo instead of a private persist+count build. The oracle's shh_er
    # CTE hashes unconditionally, so on certificate fallback (strings) we
    # still hash here — semantics unchanged either way.
    vs = _verify_shingles(spark, sf_dir)
    if _verify_is_hashed(vs):
        hashed = vs.select("doc_id", F.col("shingles").alias("hsh"))
    else:
        # certificate-fallback path: pin the re-hashed table so both sides
        # of the verify join read one computation, not two (ADVICE r7).
        # Freed by the bench/test clearCache like every other pin.
        hashed = vs.select(
            "doc_id",
            F.array_distinct(
                F.transform("shingles", lambda c: hash48(c))
            ).alias("hsh"),
        ).persist()
    ha = hashed.select(F.col("doc_id").alias("a_id"), F.col("hsh").alias("a_h"))
    hb = hashed.select(F.col("doc_id").alias("b_id"), F.col("hsh").alias("b_h"))
    inter_er = F.size(F.array_intersect("a_h", "b_h"))
    ver = (
        cand.join(ha, "a_id")
        .join(hb, "b_id")
        .select(
            "a_id",
            "b_id",
            (
                # size identity for |A∪B| — hashed sets are distinct
                inter_er / (F.size("a_h") + F.size("b_h") - inter_er)
                >= JACCARD_THRESHOLD
            )
            .cast("int")
            .alias("is_match"),
        )
    )
    da = docs.select(
        F.col("doc_id").alias("a_id"),
        F.col("lang").alias("a_lang"),
        F.col("source").alias("a_source"),
        F.expr(f"n_chars DIV {ER_LEN_BAND}").alias("a_band"),
    )
    db = docs.select(
        F.col("doc_id").alias("b_id"),
        F.col("lang").alias("b_lang"),
        F.col("source").alias("b_source"),
        F.expr(f"n_chars DIV {ER_LEN_BAND}").alias("b_band"),
    )
    return (
        ver.join(da, "a_id")
        .join(db, "b_id")
        .select(
            "is_match",
            (F.col("a_lang") == F.col("b_lang")).cast("int").alias("ag_lang"),
            (F.col("a_source") == F.col("b_source"))
            .cast("int")
            .alias("ag_source"),
            (F.col("a_band") == F.col("b_band"))
            .cast("int")
            .alias("ag_len_band"),
        )
    )


def _er_tally_aggs() -> list:
    aggs = [
        F.sum("is_match").cast("long").alias("n_m"),
        (F.count(F.lit(1)) - F.sum("is_match")).cast("long").alias("n_u"),
    ]
    for f in _ER_FEATS:
        aggs.append(
            F.sum(F.col(f"ag_{f}") * F.col("is_match"))
            .cast("long")
            .alias(f"am_{f}")
        )
        aggs.append(
            F.sum(F.col(f"ag_{f}") * (1 - F.col("is_match")))
            .cast("long")
            .alias(f"au_{f}")
        )
    return aggs


def _er_weights_oracle() -> str:
    feats = _ER_FEATS
    rows = "\n    UNION ALL\n".join(
        f"""    SELECT '{f}' AS feature, n_m AS n_match, n_u AS n_nonmatch,
           am_{f} AS n_agree_match, au_{f} AS n_agree_nonmatch,
           CAST(am_{f} AS DOUBLE) / nullif(CAST(n_m AS DOUBLE), 0.0)
               AS m_rate,
           CAST(au_{f} AS DOUBLE) / nullif(CAST(n_u AS DOUBLE), 0.0)
               AS u_rate,
           (CAST(am_{f} AS DOUBLE) / nullif(CAST(n_m AS DOUBLE), 0.0))
               / nullif(CAST(au_{f} AS DOUBLE)
                        / nullif(CAST(n_u AS DOUBLE), 0.0), 0.0) AS lift
    FROM agg"""
        for f in feats
    )
    return (
        _minhash_oracle_ctes()
        + ", "
        + _sweep_band_ctes(ER_BANDS, "er")
        + _er_feat_ctes()
        + f""", agg AS (
        {_ER_TALLY_SQL}
    )
{rows}
    """
    )


@query("er_match_weights", oracle=_er_weights_oracle())
def er_match_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter agreement weights learned from the LSH candidate
    set: for each cheap blocking feature (language, source, length
    band), the probability it AGREES on verified matches (m) vs on
    verified non-matches (u), and the log-free lift m/u — exactly the
    evidence weights a record-linkage scorer multiplies (adds, in log
    space) per agreeing feature. High-lift features are the ones worth
    blocking on; lift ≈ 1 features are noise. Learned from the engine's
    OWN candidate/verify pipeline, so weights move when the dedup
    definition moves.

    Exactness: the verify flag reuses the certified Jaccard expression;
    all agreement tallies are exact integers; rates and lift are pinned
    division chains (lift = m_rate/u_rate with nullif guards — the
    log(m/u) transform is monotone, so ranking by lift IS ranking by
    Fellegi-Sunter weight without a transcendental).

    Plan: candidate generation is the bucketed LSH shape (never
    all-pairs); the verify join and the two attribute joins are
    doc_id-keyed at candidate scale; the tally is ONE aggregation, and
    the 3 output rows are projections of that single row."""
    feat = _er_feat_shared(spark, sf_dir)
    agg = feat.agg(*_er_tally_aggs()).persist()
    agg.count()  # three projection rows read the single tally row
    out = None
    for f in _ER_FEATS:
        m_rate = F.col(f"am_{f}").cast("double") / F.nullif(
            F.col("n_m").cast("double"), F.lit(0.0)
        )
        u_rate = F.col(f"au_{f}").cast("double") / F.nullif(
            F.col("n_u").cast("double"), F.lit(0.0)
        )
        row = agg.select(
            F.lit(f).alias("feature"),
            F.col("n_m").alias("n_match"),
            F.col("n_u").alias("n_nonmatch"),
            F.col(f"am_{f}").alias("n_agree_match"),
            F.col(f"au_{f}").alias("n_agree_nonmatch"),
            m_rate.alias("m_rate"),
            u_rate.alias("u_rate"),
            (m_rate / F.nullif(u_rate, F.lit(0.0))).alias("lift"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _er_pattern_oracle() -> str:
    def factor(f: str) -> str:
        return f"""CASE WHEN p.ag_{f} = 1
               THEN (CAST(am_{f} AS DOUBLE)
                     / nullif(CAST(n_m AS DOUBLE), 0.0))
                    / nullif(CAST(au_{f} AS DOUBLE)
                             / nullif(CAST(n_u AS DOUBLE), 0.0), 0.0)
               ELSE (CAST(n_m - am_{f} AS DOUBLE)
                     / nullif(CAST(n_m AS DOUBLE), 0.0))
                    / nullif(CAST(n_u - au_{f} AS DOUBLE)
                             / nullif(CAST(n_u AS DOUBLE), 0.0), 0.0)
               END"""

    return (
        _minhash_oracle_ctes()
        + ", "
        + _sweep_band_ctes(ER_BANDS, "er")
        + _er_feat_ctes()
        + f""", pat AS (
        SELECT ag_lang, ag_source, ag_len_band,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(is_match) AS BIGINT) AS n_match
        FROM feat GROUP BY ag_lang, ag_source, ag_len_band
    ), agg AS (
        {_ER_TALLY_SQL}
    )
    SELECT p.ag_lang, p.ag_source, p.ag_len_band, p.n_pairs, p.n_match,
           CAST(p.n_match AS DOUBLE) / CAST(p.n_pairs AS DOUBLE)
               AS match_precision,
           (({factor('lang')})
            * ({factor('source')}))
           * ({factor('len_band')}) AS fs_score
    FROM pat p CROSS JOIN agg
    """
    )


@query("er_pattern_precision", oracle=_er_pattern_oracle())
def er_pattern_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Fellegi–Sunter scorer APPLIED: every verified candidate pair is
    bucketed by its agreement pattern (one of 2³ combinations of the
    lang/source/length-band flags), and each pattern gets (a) its
    observed match precision and (b) the FS likelihood-ratio score — the
    product over features of m/u when the feature agrees and
    (1−m)/(1−u) when it disagrees, with the m- and u-rates learned from
    the same pair pool (er_match_weights' tally). Comparing fs_score to
    match_precision per pattern is exactly the calibration check a
    record-linkage deployment runs before trusting the weights to
    classify unverified pairs.

    Exactness: pattern tallies are exact integers; each factor is a
    pinned chain of two IEEE divisions of integer-valued doubles; the
    3-factor product is written in one fixed order (never a fold);
    nullif guards every denominator.

    Plan: the candidate/verify/feature stages are shared with
    er_match_weights (bucketed LSH, doc_id-keyed joins); the pattern agg
    has ≤8 groups and the 1-row learned tally cross-joins in as a
    broadcast — both free at any scale."""
    feat = _er_feat_shared(spark, sf_dir)
    pat = feat.groupBy("ag_lang", "ag_source", "ag_len_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("is_match").cast("long").alias("n_match"),
    )
    tally = feat.agg(*_er_tally_aggs())

    def factor(f: str):
        m = F.col(f"am_{f}").cast("double") / F.nullif(
            F.col("n_m").cast("double"), F.lit(0.0)
        )
        u = F.col(f"au_{f}").cast("double") / F.nullif(
            F.col("n_u").cast("double"), F.lit(0.0)
        )
        dm = (F.col("n_m") - F.col(f"am_{f}")).cast("double") / F.nullif(
            F.col("n_m").cast("double"), F.lit(0.0)
        )
        du = (F.col("n_u") - F.col(f"au_{f}")).cast("double") / F.nullif(
            F.col("n_u").cast("double"), F.lit(0.0)
        )
        return F.when(
            F.col(f"ag_{f}") == 1, m / F.nullif(u, F.lit(0.0))
        ).otherwise(dm / F.nullif(du, F.lit(0.0)))

    return pat.crossJoin(F.broadcast(tally)).select(
        "ag_lang",
        "ag_source",
        "ag_len_band",
        "n_pairs",
        "n_match",
        (F.col("n_match").cast("double") / F.col("n_pairs").cast("double"))
        .alias("match_precision"),
        (
            (factor("lang") * factor("source")) * factor("len_band")
        ).alias("fs_score"),
    )


def _simhash_recall_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH t AS MATERIALIZED ({ORACLES['dedup_prefix_filter_jaccard']}),
    s AS MATERIALIZED ({ORACLES['dedup_simhash_hamming1']}),
    h AS (
        SELECT count(*) AS n_hit
        FROM t WHERE EXISTS (
            SELECT 1 FROM s WHERE s.a_id = t.a_id AND s.b_id = t.b_id)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM t) AS n_truth,
           (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_simhash,
           CAST(h.n_hit AS BIGINT) AS n_hit,
           CAST(h.n_hit AS DOUBLE)
               / nullif(CAST((SELECT count(*) FROM t) AS DOUBLE), 0.0)
               AS recall,
           CAST(h.n_hit AS DOUBLE)
               / nullif(CAST((SELECT count(*) FROM s) AS DOUBLE), 0.0)
               AS matched_share
    FROM h
    """


@query("dedup_simhash_recall", oracle=_simhash_recall_oracle())
def dedup_simhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the SimHash hamming<=1 detector against the
    lossless Jaccard>=0.5 truth set — the third dedup family's
    calibration number, completing the recall-measured story
    (dedup_lsh_recall covers MinHash banding, sim_recall_* the ANN
    side). SimHash answers a DIFFERENT similarity question (weighted
    cosine over token profiles), so both its recall of Jaccard truth
    AND the share of its pairs that are Jaccard-true (matched_share)
    are reported — together they quantify how interchangeable the two
    detectors actually are on this corpus, which is exactly what you
    need to know before picking one at 100 TB.

    Plan: both pair sets come from registered queries (multi-index
    probing / bucketed candidates — nothing all-pairs); the hit count is
    ONE left-semi join on the pair key; three 1-row aggregates meet via
    broadcast crossJoins."""
    from ..registry import QUERIES

    truth = QUERIES["dedup_prefix_filter_jaccard"](spark, sf_dir).select(
        "a_id", "b_id"
    )  # both inputs pinned upstream by the registered queries' memos
    sh = QUERIES["dedup_simhash_hamming1"](spark, sf_dir).select(
        "a_id", "b_id"
    )
    n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    n_sh = sh.agg(F.count(F.lit(1)).cast("long").alias("n_simhash"))
    n_hit = truth.join(sh, ["a_id", "b_id"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit")
    )
    return (
        n_hit.crossJoin(F.broadcast(n_truth))
        .crossJoin(F.broadcast(n_sh))
        .select(
            "n_truth",
            "n_simhash",
            "n_hit",
            (
                F.col("n_hit").cast("double")
                / F.nullif(F.col("n_truth").cast("double"), F.lit(0.0))
            ).alias("recall"),
            (
                F.col("n_hit").cast("double")
                / F.nullif(F.col("n_simhash").cast("double"), F.lit(0.0))
            ).alias("matched_share"),
        )
    )


# --------------------------------------------------------------------------
# Exact-substring dedup (character level): which documents share long
# verbatim character spans — the signal word-shingle Jaccard dilutes.
# --------------------------------------------------------------------------
SUBSTR_W = 40  # window length in characters; spans >= W are detected


@query(
    "dedup_repeated_substrings",
    oracle=f"""
    WITH w0 AS (
        SELECT doc_id,
               substr(text, unnest(generate_series(
                   1, greatest(len(text) - {SUBSTR_W - 1}, 1))),
                   {SUBSTR_W}) AS win
        FROM documents
    ), w AS (
        SELECT DISTINCT doc_id, win FROM w0
    ), g AS (
        SELECT win, CAST(count(*) AS BIGINT) AS nd FROM w GROUP BY win
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_windows,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS shared_share
    FROM w JOIN g USING (win)
    GROUP BY doc_id
    """,
)
def dedup_repeated_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level exact-substring dedup signal: every W=40-char
    window of every document, grouped across the corpus — a document's
    shared_share is the fraction of its distinct windows that appear
    verbatim in at least one OTHER document (or twice in itself). This is
    the practical form of suffix-array exact-substring dedup for training
    corpora: boilerplate headers, licence blocks, and copy-pasted spans
    light up here even when token-level Jaccard stays below threshold,
    and any span >= W chars is guaranteed to contribute >= 1 window.

    Semantics note: windows are stride-1 and EXACT (no hashing), so the
    oracle equality is byte-for-byte. At 100 TB the window column becomes
    a rolling (Rabin-Karp) hash48 and the stride rises to W/2 — recall
    for spans >= W + stride - 1 is preserved; both are the documented
    knobs, not semantic changes. The per-window group count shuffles on
    the window key where boilerplate skew is absorbed by map-side
    partials (rows are already distinct per doc).

    Plan (round 8, guide §2.4): the per-doc window de-duplication runs
    IN-ROW (array_distinct over the transform, before the explode), which
    deletes the old (doc_id, win) DISTINCT exchange outright; the per-
    window corpus count rides in as a count() window over win instead of
    a groupBy + join back on the same key (the _prefix_filter_candidates
    df-by-window rewrite) — two shuffles total (win, then the doc rollup)
    where the old plan paid four, and no persist is needed because the
    relation is consumed exactly once."""
    docs = load_table(spark, sf_dir, "documents")
    wins = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(length(text) - "
                    f"{SUBSTR_W - 1}, 1)), i -> substring(text, i, "
                    f"{SUBSTR_W}))"
                )
            )
        ).alias("win"),
    )
    tagged = wins.withColumn(
        "nd", F.count(F.lit(1)).over(Window.partitionBy("win"))
    )
    shared = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
    return tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        shared.cast("long").alias("n_shared_windows"),
        (shared.cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "shared_share"
        ),
    )


# --------------------------------------------------------------------------
# Detector ensemble census: how the three pair detectors vote — the
# decision table behind "which dedup signal do we trust at which cost".
# --------------------------------------------------------------------------
def _ensemble_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH m AS MATERIALIZED (SELECT a_id, b_id, 1 AS bit FROM ({ORACLES['dedup_minhash_lsh']})),
    g AS MATERIALIZED (SELECT a_id, b_id, 2 AS bit FROM ({ORACLES['dedup_ngram_jaccard']})),
    s AS MATERIALIZED (SELECT a_id, b_id, 4 AS bit FROM ({ORACLES['dedup_simhash_hamming1']})),
    u AS (
        SELECT a_id, b_id, CAST(sum(bit) AS BIGINT) AS mask
        FROM (SELECT * FROM m UNION ALL SELECT * FROM g
              UNION ALL SELECT * FROM s)
        GROUP BY a_id, b_id
    )
    SELECT mask,
           CAST(bit_count(CAST(mask AS BIGINT)) AS INTEGER) AS n_votes,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM u GROUP BY mask
    """


@query("dedup_detector_ensemble", oracle=_ensemble_oracle())
def dedup_detector_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble census of the three registered pair detectors — MinHash-LSH
    verified pairs (bit 1), n-gram Jaccard (bit 2), SimHash hamming<=1
    (bit 4): every candidate pair is tallied by WHICH detectors flagged
    it, and the mask histogram is the decision table for choosing a
    production detector stack (pairs at 3 votes are safe deletes;
    mask=4-only pairs are the SimHash flood dedup_simhash_recall
    measures; a mask=1-only or 2-only population would expose threshold
    drift between the two Jaccard-based detectors). Composes the three
    REGISTERED detectors on both sides, so the census can never drift
    from what the detectors actually emit.

    Determinism: pure integer set algebra — pair keys, bit sums, and
    popcounts; nothing floating anywhere.

    Plan: three registered pair pipelines union into ONE (a_id, b_id)
    keyed aggregation (map-side combinable), then a <=7-row mask rollup.
    Pair volume is detector-bounded (the flood detector is the documented
    recall knob), never corpus-quadratic."""
    from ..registry import QUERIES

    parts = [
        QUERIES["dedup_minhash_lsh"](spark, sf_dir).select(
            "a_id", "b_id", F.lit(1).alias("bit")
        ),
        QUERIES["dedup_ngram_jaccard"](spark, sf_dir).select(
            "a_id", "b_id", F.lit(2).alias("bit")
        ),
        QUERIES["dedup_simhash_hamming1"](spark, sf_dir).select(
            "a_id", "b_id", F.lit(4).alias("bit")
        ),
    ]
    u = parts[0].unionAll(parts[1]).unionAll(parts[2])
    masks = u.groupBy("a_id", "b_id").agg(
        F.sum("bit").cast("long").alias("mask")
    )
    return masks.groupBy("mask").agg(
        F.expr("CAST(bit_count(mask) AS INT)").alias("n_votes"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )


# ---------------------------------------------------------------------------
# Asymmetric containment: the subset-duplicates Jaccard structurally misses.
# ---------------------------------------------------------------------------
CONTAIN_T = 0.8  # max-direction containment threshold


def _containment_oracle() -> str:
    # ceil(0.8·sz) = (4·sz + 4) // 5 in exact integers (CONTAIN_T = 4/5)
    return f"""
    WITH sh AS (
        SELECT doc_id, {_SQL_SHINGLES} AS shingles
        FROM documents
    ), ex AS (
        SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS shingle
        FROM sh
    ), dfq AS (
        SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY shingle
    ), ranked AS (
        SELECT e.doc_id, e.sz, e.shingle,
               row_number() OVER (PARTITION BY e.doc_id
                                  ORDER BY d.df, e.shingle) AS rn
        FROM ex e JOIN dfq d ON d.shingle = e.shingle
    ), prefix_ct AS (
        SELECT doc_id, shingle FROM ranked
        WHERE rn <= sz - (4 * sz + 4) // 5 + 1
    ), cand_ct AS (
        SELECT DISTINCT least(p.doc_id, e.doc_id) AS a_id,
                        greatest(p.doc_id, e.doc_id) AS b_id
        FROM prefix_ct p JOIN ex e
          ON e.shingle = p.shingle AND e.doc_id != p.doc_id
    ), scored_ct AS (
        SELECT c.a_id, c.b_id,
               len(list_intersect(sa.shingles, sb.shingles)) AS inter,
               len(sa.shingles) AS sz_a,
               len(sb.shingles) AS sz_b,
               len(list_distinct(list_concat(sa.shingles, sb.shingles)))
                   AS uni
        FROM cand_ct c
        JOIN sh sa ON sa.doc_id = c.a_id
        JOIN sh sb ON sb.doc_id = c.b_id
    )
    SELECT a_id, b_id,
           round(inter::DOUBLE / sz_a, 6) AS containment_ab,
           round(inter::DOUBLE / sz_b, 6) AS containment_ba,
           round(inter::DOUBLE / uni, 6) AS jaccard,
           CASE WHEN inter::DOUBLE / uni < {JACCARD_THRESHOLD}
                THEN 1 ELSE 0 END AS subset_only
    FROM scored_ct
    WHERE greatest(inter::DOUBLE / sz_a, inter::DOUBLE / sz_b)
              >= {CONTAIN_T}
    """


@query("dedup_containment_asymmetric", oracle=_containment_oracle())
def dedup_containment_asymmetric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT asymmetric-containment join: every pair where one document's
    shingle set is ≥ 80% contained in the other's (c(A→B) = |A∩B|/|A|),
    with both directions, the Jaccard, and a subset_only flag marking
    the pairs symmetric dedup structurally misses (quote inclusion /
    excerpt-plus-boilerplate: a 100-shingle doc fully inside a
    1000-shingle doc has J ≈ 0.1 — invisible to every J ≥ 0.5 detector
    AND to minhash banding, whose collision probability tracks J, not
    c). Pipelines run this as a separate pass because the dedup decision
    differs: dropping the CONTAINING side deletes novel content.

    Losslessness (asymmetric prefix filter): c(A→B) ≥ t forces overlap
    ≥ ceil(t·|A|), so A must share a shingle with B inside A's first
    |A| − ceil(t·|A|) + 1 shingles in the global (df, shingle)
    rarest-first order — if the whole prefix missed B, the remaining
    ceil(t·|A|) − 1 shingles cannot reach the overlap. Probing every
    doc's prefix against the FULL index of all docs therefore finds
    every pair at c ≥ t in either direction. Candidates verify exact
    set arithmetic; each output number is one integer division rounded
    to 6 dp (bit-identical engines).

    Scale posture: unlike the symmetric join, the build side indexes
    ALL shingles — but join traffic is keyed by PROBE-side prefixes,
    which hold each doc's RAREST shingles, so high-df boilerplate never
    becomes a join key and bucket fan-out stays df-of-rare-shingle
    sized. The verify join is doc_id-keyed at candidate scale.

    Round 7: the pipeline runs over the _verify_shingles table — int64
    codes under the injectivity certificate, strings on fallback. The
    asymmetric prefix theorem (above) holds under ANY global total
    order, so the (df, code) order yields a different lossless candidate
    SUPERSET; the verified output is identical, and the probe/index join
    and the per-pair intersects move 8-byte longs instead of ~25-byte
    strings (guide §2.3). df arrives as a count() window over the code —
    one pass over ex instead of groupBy + join back."""
    sh = _verify_shingles(spark, sf_dir)
    ex = sh.select(
        "doc_id",
        F.size("shingles").alias("sz"),
        F.explode("shingles").alias("shingle"),
    )
    wd = Window.partitionBy("doc_id")
    ranked = ex.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    ).withColumn("rn", F.row_number().over(wd.orderBy("df", "shingle")))
    prefix = ranked.filter(
        F.col("rn") <= F.expr("sz - (4 * sz + 4) div 5 + 1")
    ).select("doc_id", "shingle")
    probe = prefix.select(F.col("doc_id").alias("p_id"), "shingle")
    index = ex.select(F.col("doc_id").alias("i_id"), "shingle")
    cand = (
        probe.join(index, "shingle")
        .filter(F.col("p_id") != F.col("i_id"))
        .select(
            F.least("p_id", "i_id").alias("a_id"),
            F.greatest("p_id", "i_id").alias("b_id"),
        )
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_s"))
    sb = sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_s"))
    inter = F.size(F.array_intersect("a_s", "b_s"))
    c_ab = inter / F.size("a_s")
    c_ba = inter / F.size("b_s")
    jac = inter / (F.size("a_s") + F.size("b_s") - inter)
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .filter(F.greatest(c_ab, c_ba) >= CONTAIN_T)
        .select(
            "a_id",
            "b_id",
            F.round(c_ab, 6).alias("containment_ab"),
            F.round(c_ba, 6).alias("containment_ba"),
            F.round(jac, 6).alias("jaccard"),
            (jac < JACCARD_THRESHOLD).cast("int").alias("subset_only"),
        )
    )


# ---------------------------------------------------------------------------
# Blocking quality: reduction ratio x pairs completeness — the two numbers
# that certify a blocking scheme BEFORE paying its verification bill.
# ---------------------------------------------------------------------------
def _blocking_quality_oracle() -> str:
    from ..registry import ORACLES

    return (
        _minhash_oracle_ctes()
        + f""", truth_b AS MATERIALIZED (
        SELECT a_id, b_id FROM ({ORACLES['dedup_prefix_filter_jaccard']})
    ), nn AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
    ), nc AS (
        SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand
    ), nt AS (
        SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth_b
    ), nh AS (
        SELECT CAST(count(*) AS BIGINT) AS n_hit
        FROM truth_b t SEMI JOIN cand c
          ON c.a_id = t.a_id AND c.b_id = t.b_id
    )
    SELECT nn.n_docs,
           CAST(nn.n_docs * (nn.n_docs - 1) // 2 AS BIGINT) AS n_all_pairs,
           nc.n_cand, nt.n_truth, nh.n_hit,
           CAST(1 AS DOUBLE)
               - CAST(nc.n_cand AS DOUBLE)
                 / CAST(nn.n_docs * (nn.n_docs - 1) // 2 AS DOUBLE)
               AS reduction_ratio,
           CAST(nh.n_hit AS DOUBLE)
               / nullif(CAST(nt.n_truth AS DOUBLE), 0.0)
               AS pairs_completeness
    FROM nn CROSS JOIN nc CROSS JOIN nt CROSS JOIN nh
    """
    )


@query("er_blocking_quality", oracle=_blocking_quality_oracle())
def er_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-number certificate of a blocking scheme (Christen's
    blocking-evaluation framework): reduction ratio RR = 1 −
    |candidates| / |all pairs| (how much of the n²/2 comparison space
    the blocking deletes) and pairs completeness PC = |candidates ∩
    truth| / |truth| (how many true matches survive into the candidate
    set, BEFORE any verification). dedup_lsh_recall certifies the
    post-verify detector; this certifies the blocking itself — RR is
    the cost axis, PC the recall axis, and a scheme is only deployable
    when both are high (RR≈0.99 / PC≈0.95 is the classic target band).

    Exactness: all five counts are exact integers (truth = the lossless
    prefix-filter pair set, memoized upstream); RR and PC are pinned
    single-division chains with CAST(1 AS DOUBLE) (decimal-literal
    trap).

    Plan: the candidate count reuses the bucketed LSH generator, the
    hit count is ONE pair-keyed semi join, and n·(n−1)/2 is closed-form
    — nothing here is all-pairs; the all-pairs number appears only as
    arithmetic."""
    from ..registry import QUERIES

    docs = load_table(spark, sf_dir, "documents")
    cand = _lsh_candidates(_signatures_shared(spark, sf_dir)).persist()
    cand.count()  # the candidate count and the hit semi join both read it
    truth = QUERIES["dedup_prefix_filter_jaccard"](spark, sf_dir).select(
        "a_id", "b_id"
    )  # pinned upstream by the registered query's memo
    nn = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    nc = cand.agg(F.count(F.lit(1)).cast("long").alias("n_cand"))
    nt = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    nh = truth.join(cand, ["a_id", "b_id"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit")
    )
    all_pairs_int = F.expr("CAST(n_docs * (n_docs - 1) DIV 2 AS BIGINT)")
    return (
        nn.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nh))
        .select(
            "n_docs",
            all_pairs_int.alias("n_all_pairs"),
            "n_cand",
            "n_truth",
            "n_hit",
            (
                F.lit(1.0)
                - F.col("n_cand").cast("double")
                / all_pairs_int.cast("double")
            ).alias("reduction_ratio"),
            (
                F.col("n_hit").cast("double")
                / F.nullif(F.col("n_truth").cast("double"), F.lit(0.0))
            ).alias("pairs_completeness"),
        )
    )


# ---------------------------------------------------------------------------
# Containment-from-MinHash calibration: the asymmetric sibling of
# dedup_minhash_estimate_error.
# ---------------------------------------------------------------------------
def _containment_minhash_oracle() -> str:
    agree = " + ".join(
        f"CASE WHEN ma.mh{i} = mb.mh{i} THEN 1 ELSE 0 END"
        for i in range(NUM_HASHES)
    )
    return (
        _minhash_oracle_ctes()
        + f"""
    , scored_cm AS (
        SELECT c.a_id, c.b_id,
               CAST({agree} AS BIGINT) AS n_agree,
               CAST(len(sa.shingles) AS BIGINT) AS sz_a,
               CAST(len(sb.shingles) AS BIGINT) AS sz_b,
               CAST(len(list_intersect(sa.shingles, sb.shingles))
                    AS BIGINT) AS inter
        FROM cand c
        JOIN mh ma ON ma.doc_id = c.a_id
        JOIN mh mb ON mb.doc_id = c.b_id
        JOIN sh sa ON sa.doc_id = c.a_id
        JOIN sh sb ON sb.doc_id = c.b_id
    )
    SELECT a_id, b_id, n_agree, sz_a, sz_b,
           CAST(n_agree * (sz_a + sz_b) AS DOUBLE)
               / CAST(({NUM_HASHES} + n_agree) * sz_a AS BIGINT)
               AS est_containment_ab,
           round(CAST(inter AS DOUBLE) / sz_a, 6) AS exact_containment_ab,
           round(abs(CAST(n_agree * (sz_a + sz_b) AS DOUBLE)
                         / CAST(({NUM_HASHES} + n_agree) * sz_a AS BIGINT)
                     - round(CAST(inter AS DOUBLE) / sz_a, 6)), 6)
               AS abs_err
    FROM scored_cm
    """
    )


@query("dedup_containment_minhash_error", oracle=_containment_minhash_oracle())
def dedup_containment_minhash_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment ESTIMATED from MinHash, calibrated against the exact
    value — the asymmetric sibling of dedup_minhash_estimate_error.
    Containment derives from Jaccard and the (cheaply known) set sizes
    by exact algebra: c(A→B) = J·(|A|+|B|) / ((1+J)·|A|); substituting
    the signature estimate Ĵ = n_agree/k gives
    ĉ = n_agree·(|A|+|B|) / ((k+n_agree)·|A|) — a SINGLE division of
    pure integers, no intermediate float J. The error table answers
    whether the detector's signatures can rank quote-inclusion
    candidates without paying the exact intersection (at k = 9: no —
    same conclusion as the symmetric calibration, now measured for the
    asymmetric question too).

    Exactness: n_agree is integer equality on affine-min values both
    engines compute identically; sizes and intersections are exact
    integers; every reported number is one pinned division (6-dp rounds
    on the exact value and the error).

    Plan: the detector's own signature and shingle tables (memoized /
    persisted upstream), the candidate pair table, four doc_id-keyed
    joins at pair scale. Round 7: sizes/intersections come from the
    certified int64 _verify_shingles table (identical integers under the
    certificate; string fallback otherwise)."""
    sh = _verify_shingles(spark, sf_dir)
    mh = _signatures_shared(spark, sf_dir)  # memoized; both pair-side joins read it
    cand = _lsh_candidates(mh)
    agree = sum(
        (F.col(f"ma.mh{i}") == F.col(f"mb.mh{i}")).cast("int")
        for i in range(NUM_HASHES)
    ).cast("long")
    sa = sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_s"))
    sb = sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_s"))
    est = F.col("n_agree") * (F.col("sz_a") + F.col("sz_b")) / (
        (F.lit(NUM_HASHES) + F.col("n_agree")) * F.col("sz_a")
    ).cast("long")
    exact = F.round(F.col("inter").cast("double") / F.col("sz_a"), 6)
    return (
        cand.join(mh.alias("ma"), F.col("ma.doc_id") == cand["a_id"])
        .join(mh.alias("mb"), F.col("mb.doc_id") == cand["b_id"])
        .join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            agree.alias("n_agree"),
            F.size("a_s").cast("long").alias("sz_a"),
            F.size("b_s").cast("long").alias("sz_b"),
            F.size(F.array_intersect("a_s", "b_s"))
            .cast("long")
            .alias("inter"),
        )
        .select(
            "a_id",
            "b_id",
            "n_agree",
            "sz_a",
            "sz_b",
            est.alias("est_containment_ab"),
            exact.alias("exact_containment_ab"),
            F.round(F.abs(est - exact), 6).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup census: storage-style chunk dedup
# applied to a text corpus — catches shared SPANS that whole-doc hashing
# misses and token-shingle Jaccard underweights.
# ---------------------------------------------------------------------------
CDC_W = 16       # rolling window (chars) the boundary test hashes
CDC_STRIDE = 4   # boundary test stride (1 = classic shift-invariant CDC)
# boundary <=> hash48(window) % 64 == 0 <=> md5 hex digits 11-12 in
# {00,40,80,c0} (low 6 bits zero) — a pure string test, no CONV.
_CDC_BOUNDARY_DIGITS = "('00', '40', '80', 'c0')"


def _cdc_chunks_sql(text: str) -> str:
    """DuckDB: boundary positions -> chunk substrings for one text column."""
    bnd = (
        f"list_filter(generate_series(5, greatest(length({text}) - "
        f"{CDC_W - 1}, 5), {CDC_STRIDE}), p -> p <= length({text}) AND "
        f"substr(md5(substr({text}, p, {CDC_W})), 11, 2) IN "
        f"{_CDC_BOUNDARY_DIGITS})"
    )
    barr = (
        f"list_concat(list_concat([CAST(1 AS BIGINT)], "
        f"list_transform({bnd}, p -> CAST(p AS BIGINT))), "
        f"[CAST(length({text}) + 1 AS BIGINT)])"
    )
    return (
        f"list_transform(generate_series(1, len({barr}) - 1), "
        f"i -> substr({text}, CAST(({barr})[i] AS INTEGER), "
        f"CAST(({barr})[i + 1] - ({barr})[i] AS INTEGER)))"
    )


@query(
    "dedup_cdc_chunks",
    oracle=f"""
    WITH ch AS (
        SELECT doc_id, unnest({_cdc_chunks_sql("text")}) AS chunk
        FROM documents
    ), by_hash AS (
        SELECT md5(chunk) AS h,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS nd,
               CAST(sum(CAST(length(chunk) AS BIGINT)) AS BIGINT) AS chars
        FROM ch GROUP BY md5(chunk)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
           CAST(sum(n) AS BIGINT) AS n_chunks,
           CAST(count(*) AS BIGINT) AS n_distinct_chunks,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS cross_doc_chunks,
           CAST(1.0 AS DOUBLE) - CAST(count(*) AS DOUBLE)
               / CAST(sum(n) AS DOUBLE) AS dup_chunk_share,
           CAST(sum(chars) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
               AS mean_chunk_len
    FROM by_hash
    """,
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup census — the storage-dedup technique
    (LBFS/rsync gear-hash family) pointed at a text corpus: a chunk
    boundary falls wherever the rolling CDC_W-char window's hash has
    its low 6 bits zero (expected chunk ~ 64·CDC_STRIDE = 256 chars), so
    boundaries are CONTENT-anchored — insert a paragraph and only the
    chunks it touches change, unlike fixed-offset blocking where one
    insertion shifts every downstream block. The census (chunk
    instances vs distinct chunks vs chunks shared across docs) prices
    chunk-level exact dedup: boilerplate headers / licence blocks /
    quoted spans dedup here even when whole-doc and shingle-Jaccard
    detectors score the docs as distinct.

    Boundary test = md5 hex digits 11-12 in {00, 40, 80, c0} — a pure
    string compare on both engines (the round-6 CONV lesson:
    hex→int conversion costs more than the md5). ``CDC_STRIDE`` > 1 is
    the documented cost knob (classic CDC strides 1; recall for spans
    >= W + stride - 1 is preserved); exactness is unaffected — both
    engines test identical positions.

    Plan: the boundary test EXPLODES the stride positions into rows so
    the per-window md5 runs as a regular projection inside whole-stage
    codegen — Spark evaluates higher-order-function lambdas INTERPRETED,
    and the first cut (windows inside one filter() lambda) paid ~4× for
    ~2M in-lambda md5s at sf0.1. The explode→hash→filter is map-side
    (no shuffle until only the ~1/64 surviving boundary rows group back
    per doc); chunk assembly is in-row array work over the small
    boundary array; ONE explode of the resulting chunks feeds a
    chunk-hash-keyed aggregation (map-side partials; identical chunks
    colliding on a key IS the measurement), then a 1-row census
    rollup."""
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.expr(
                f"sequence(5, greatest(length(text) - {CDC_W - 1}, 5), "
                f"{CDC_STRIDE})"
            )
        ).alias("p"),
    )
    bpos = (
        pos.filter(
            (F.col("p") <= F.length("text"))
            & F.expr(
                f"substring(md5(substring(text, p, {CDC_W})), 11, 2) IN "
                f"{_CDC_BOUNDARY_DIGITS}"
            )
        )
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("p")).alias("__bnd"))
    )
    with_bnd = docs.join(bpos, "doc_id", "left").select(
        "doc_id",
        "text",
        F.coalesce("__bnd", F.expr("CAST(array() AS ARRAY<INT>)")).alias(
            "__bnd"
        ),
    )
    barr = (
        "concat(array(CAST(1 AS BIGINT)), "
        "transform(__bnd, p -> CAST(p AS BIGINT)), "
        "array(CAST(length(text) + 1 AS BIGINT)))"
    )
    chunks_expr = (
        f"transform(sequence(1, size({barr}) - 1), "
        f"i -> substring(text, CAST(element_at({barr}, i) AS INT), "
        f"CAST(element_at({barr}, i + 1) - element_at({barr}, i) AS INT)))"
    )
    ch = with_bnd.select(
        "doc_id", F.explode(F.expr(chunks_expr)).alias("chunk")
    )
    by_hash = ch.groupBy(F.md5("chunk").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("doc_id").cast("long").alias("nd"),
        F.sum(F.length("chunk").cast("long")).cast("long").alias("chars"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return by_hash.agg(
        F.sum("n").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chunks"),
        F.sum((F.col("nd") > 1).cast("int")).cast("long").alias(
            "cross_doc_chunks"
        ),
        (
            F.lit(1.0) - F.count(F.lit(1)).cast("double")
            / F.sum("n").cast("double")
        ).alias("dup_chunk_share"),
        (F.sum("chars").cast("double") / F.sum("n").cast("double")).alias(
            "mean_chunk_len"
        ),
    ).crossJoin(F.broadcast(n_docs)).select(
        "n_docs", "n_chunks", "n_distinct_chunks", "cross_doc_chunks",
        "dup_chunk_share", "mean_chunk_len",
    )


# ---------------------------------------------------------------------------
# Onion dedup accounting: exact → canonical → near-dup, each layer priced.
# ---------------------------------------------------------------------------
def _onion_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH cl AS MATERIALIZED ({ORACLES['dedup_clusters']}),
    keyed AS (
        SELECT doc_id, md5(text) AS h_raw,
               md5({_NORM_SQL.format(c='text')}) AS h_norm
        FROM documents
    ), f1 AS (
        SELECT doc_id, h_norm,
               CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY h_raw)
                    THEN 0 ELSE 1 END AS r1
        FROM keyed
    ), f2 AS (
        SELECT doc_id, r1,
               CASE WHEN r1 = 0 AND doc_id != min(CASE WHEN r1 = 0
                        THEN doc_id END) OVER (PARTITION BY h_norm)
                    THEN 1 ELSE 0 END AS r2
        FROM f1
    ), f3 AS (
        SELECT f2.doc_id, f2.r1, f2.r2,
               CASE WHEN f2.r1 = 0 AND f2.r2 = 0 AND cl.doc_id IS NOT NULL
                         AND cl.doc_id != cl.cluster_id
                    THEN 1 ELSE 0 END AS r3
        FROM f2 LEFT JOIN cl ON cl.doc_id = f2.doc_id
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n0,
               CAST(sum(r1) AS BIGINT) AS x1,
               CAST(sum(r2) AS BIGINT) AS x2,
               CAST(sum(r3) AS BIGINT) AS x3
        FROM f3
    )
    SELECT '1_exact' AS layer, n0 AS docs_in, x1 AS docs_removed,
           n0 - x1 AS docs_out,
           CAST(x1 AS DOUBLE) / CAST(n0 AS DOUBLE) AS cum_removed_share
    FROM tot
    UNION ALL
    SELECT '2_normalized', n0 - x1, x2, n0 - x1 - x2,
           CAST(x1 + x2 AS DOUBLE) / CAST(n0 AS DOUBLE)
    FROM tot
    UNION ALL
    SELECT '3_near_dup', n0 - x1 - x2, x3, n0 - x1 - x2 - x3,
           CAST(x1 + x2 + x3 AS DOUBLE) / CAST(n0 AS DOUBLE)
    FROM tot
    """


@query("text_dedup_onion", oracle=_onion_oracle())
def text_dedup_onion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Onion (layered) dedup accounting — the production sequencing every
    corpus pipeline runs: EXACT dedup first (free, hash groupBy), then
    CANONICAL dedup on the survivors (the C4/CCNet normalize-then-hash
    recipe), then NEAR-DUP cluster removal on what remains — with each
    layer's removal count priced separately, because that table is what
    decides whether the expensive near-dup pass is worth running on a
    given source (if layers 1-2 already took the dup mass, it isn't).
    Keepers are min-doc_id at every layer, and the near-dup layer uses
    the REGISTERED dedup_clusters labels (cluster_id = component min),
    so the audit moves when the detector definition moves. A cluster's
    min member provably survives layers 1-2 (it is the min of every
    exact/canonical group it belongs to), so the three layers compose
    without keeper conflicts.

    Exactness: pure integer tallies from window-min keeper flags; one
    IEEE division per row for the cumulative share.

    Plan: one map pass computing both content hashes, two hash-keyed
    window-min flags, one doc_id-keyed left join against the (memoized)
    cluster table, ONE aggregation to the four counters, and a 3-row
    literal expansion — corpus-scan-bound; the CC build is paid by the
    memoized dedup_clusters."""
    from ..registry import QUERIES

    docs = load_table(spark, sf_dir, "documents")
    cl = QUERIES["dedup_clusters"](spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    keyed = docs.select(
        "doc_id",
        F.md5("text").alias("h_raw"),
        F.md5(_NORM_SPARK(F.col("text"))).alias("h_norm"),
    )
    w_raw = Window.partitionBy("h_raw")
    f1 = keyed.select(
        "doc_id",
        "h_norm",
        F.when(F.col("doc_id") == F.min("doc_id").over(w_raw), 0)
        .otherwise(1)
        .alias("r1"),
    )
    w_norm = Window.partitionBy("h_norm")
    min_surv = F.min(
        F.when(F.col("r1") == 0, F.col("doc_id"))
    ).over(w_norm)
    f2 = f1.select(
        "doc_id",
        "r1",
        F.when(
            (F.col("r1") == 0) & (F.col("doc_id") != min_surv), 1
        )
        .otherwise(0)
        .alias("r2"),
    )
    f3 = f2.join(cl, "doc_id", "left").select(
        "r1",
        "r2",
        F.when(
            (F.col("r1") == 0)
            & (F.col("r2") == 0)
            & F.col("cluster_id").isNotNull()
            & (F.col("doc_id") != F.col("cluster_id")),
            1,
        )
        .otherwise(0)
        .alias("r3"),
    )
    tot = f3.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum("r1").cast("long").alias("x1"),
        F.sum("r2").cast("long").alias("x2"),
        F.sum("r3").cast("long").alias("x3"),
    )
    layers = tot.select(
        "n0",
        F.explode(
            F.array(
                F.struct(
                    F.lit("1_exact").alias("layer"),
                    F.col("n0").alias("docs_in"),
                    F.col("x1").alias("docs_removed"),
                ),
                F.struct(
                    F.lit("2_normalized").alias("layer"),
                    (F.col("n0") - F.col("x1")).alias("docs_in"),
                    F.col("x2").alias("docs_removed"),
                ),
                F.struct(
                    F.lit("3_near_dup").alias("layer"),
                    (F.col("n0") - F.col("x1") - F.col("x2")).alias(
                        "docs_in"
                    ),
                    F.col("x3").alias("docs_removed"),
                ),
            )
        ).alias("l"),
    )
    return layers.select(
        F.col("l.layer").alias("layer"),
        F.col("l.docs_in").alias("docs_in"),
        F.col("l.docs_removed").alias("docs_removed"),
        (F.col("l.docs_in") - F.col("l.docs_removed")).alias("docs_out"),
        (
            (
                F.col("n0") - (F.col("l.docs_in") - F.col("l.docs_removed"))
            ).cast("double")
            / F.col("n0").cast("double")
        ).alias("cum_removed_share"),
    )


# ---------------------------------------------------------------------------
# Sampled exact-verify estimator: the truth instrument's scale mode.
# ---------------------------------------------------------------------------
TRUTH_SAMPLE_MOD = 64  # verify 1/64 of candidates; estimate = count x 64


def _truth_sample_oracle() -> str:
    pair_key = sql_hash48("a_id::VARCHAR || ':' || b_id::VARCHAR")
    inter = "len(list_intersect(sa.shingles, sb.shingles))"
    return f"""
    WITH sh AS (
        SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
    ), hx AS (
        SELECT doc_id, len(shingles) AS sz,
               {sql_hash48("shingle")} AS h
        FROM (SELECT doc_id, shingles, unnest(shingles) AS shingle FROM sh)
    ), dfreq AS (
        SELECT h, count(*) AS df FROM hx GROUP BY h
    ), ranked AS (
        SELECT x.doc_id, x.sz, x.h,
               row_number() OVER (PARTITION BY x.doc_id
                                  ORDER BY d.df, x.h) AS rn
        FROM hx x JOIN dfreq d USING (h)
    ), prefix AS (
        SELECT doc_id, h, sz FROM ranked
        WHERE rn <= sz - (sz + 1) // 2 + 1
    ), cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM prefix a JOIN prefix b
          ON a.h = b.h AND a.doc_id < b.doc_id
         AND a.sz >= (b.sz + 1) // 2 AND b.sz >= (a.sz + 1) // 2
    ), samp AS (
        SELECT a_id, b_id FROM cand
        WHERE {pair_key} % {TRUTH_SAMPLE_MOD} = 0
    ), ver AS (
        SELECT CAST(count(*) AS BIGINT) AS n_true_sampled
        FROM samp s
        JOIN sh sa ON sa.doc_id = s.a_id
        JOIN sh sb ON sb.doc_id = s.b_id
        WHERE {inter}::DOUBLE
              / (len(sa.shingles) + len(sb.shingles) - {inter})
              >= {JACCARD_THRESHOLD}
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
           (SELECT CAST(count(*) AS BIGINT) FROM samp) AS n_sampled,
           ver.n_true_sampled,
           ver.n_true_sampled * {TRUTH_SAMPLE_MOD} AS est_true_pairs,
           CAST({TRUTH_SAMPLE_MOD} AS BIGINT) AS sample_mod
    FROM ver
    """


@query("dedup_truth_sample_estimate", oracle=_truth_sample_oracle())
def dedup_truth_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-truth instrument's SCALE MODE, made real: the full
    prefix-filter SSJoin is candidate-proportional (the round-6 sf10
    probe measured 121M candidates whose exact-verify payload — two
    ~1.5 KB shingle arrays per pair — exceeds one box's shuffle spill),
    so at scale the instrument verifies a DETERMINISTIC hash-sample of
    the candidates and reports the Horvitz-Thompson estimate
    est_true_pairs = 64 · |{verified sampled pairs}|. The sample is
    keyed by hash48(a_id:b_id) — reproducible across engines, runs, and
    partitionings; n_candidates stays EXACT (candidate counting is the
    cheap part). Every count is an exact integer on both engines — the
    oracle mirrors the hash-ranked candidate generation line for line,
    so this query also certifies the candidate SET itself (the full
    truth query only certifies the verified output).

    Plan: the shared candidate generation (hash-keyed prefix join), one
    map-side hash filter keeping ~1/64 of pairs, the exact (certified
    int64) verify on the sample only, and a 1-row assembly. At sf10 this
    is ~1.9M verified pairs of verify payload instead of 360 GB."""
    sh = _verify_shingles(spark, sf_dir)
    cand = _prefix_filter_candidates(spark, sf_dir).persist()
    # eager-materialize: three consumers (two broadcast count subtrees and
    # the verify branch) read cand concurrently inside ONE action — an
    # unmaterialized cache would be computed once per subtree (ADVICE r6).
    # The pin is released by the harness's per-rep clearCache (bench) /
    # teardown (tests); a long-lived service should unpersist after the
    # assembly or route this through memo.shared (ADVICE r7).
    cand.count()
    n_cand = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    samp = cand.filter(
        hash48(F.concat_ws(":", F.col("a_id"), F.col("b_id")))
        % TRUTH_SAMPLE_MOD
        == 0
    )
    n_samp = samp.agg(F.count(F.lit(1)).cast("long").alias("n_sampled"))
    ver = (
        _pair_jaccard(samp, sh)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .agg(F.count(F.lit(1)).cast("long").alias("n_true_sampled"))
    )
    return (
        ver.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_samp))
        .select(
            "n_candidates",
            "n_sampled",
            "n_true_sampled",
            (F.col("n_true_sampled") * F.lit(TRUTH_SAMPLE_MOD))
            .cast("long")
            .alias("est_true_pairs"),
            F.lit(TRUTH_SAMPLE_MOD).cast("long").alias("sample_mod"),
        )
    )
