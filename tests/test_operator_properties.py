"""Property tests for round-2 operators against brute-force references:
the fuzzy-dedup blocking must be recall-lossless, and the funnel's
running-MAX formulation must agree with a quadratic pair scan."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_blocking_is_recall_lossless(spark):
    """Length-band blocking {floor(len/2), +1} must surface EVERY pair
    within edit distance 2 that brute-force all-pairs finds — on random
    strings whose lengths straddle every block boundary."""
    rng = random.Random(11)
    alphabet = "abcd"
    names = set()
    while len(names) < 80:
        n = rng.randint(1, 12)
        names.add("".join(rng.choice(alphabet) for _ in range(n)))
    names = sorted(names)

    expected = {
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if _lev(a, b) <= 2
    }
    assert expected, "fixture produced no close pairs; widen the alphabet"

    df = spark.createDataFrame([(n,) for n in names], "name string")
    blk = F.floor(F.length("name") / 2).cast("long")
    keyed = df.select("name", F.explode(F.array(blk, blk + 1)).alias("k"))
    a = keyed.select(F.col("name").alias("name_a"), "k")
    b = keyed.select(F.col("name").alias("name_b"), "k")
    got = {
        (r["name_a"], r["name_b"])
        for r in (
            a.join(b, "k")
            .filter(F.col("name_a") < F.col("name_b"))
            .select("name_a", "name_b")
            .distinct()
            .filter(F.levenshtein("name_a", "name_b") <= 2)
            .collect()
        )
    }
    assert got == expected


def test_funnel_matches_bruteforce_pairs(spark):
    """The running-conditional-MAX funnel must agree with the O(n²)
    definition: a purchase converts iff SOME click by the same user lies
    in [ts-3600s, ts]."""
    rng = random.Random(7)
    ns = 1_000_000_000
    rows = []
    eid = 0
    for user in range(1, 13):
        n = rng.randint(1, 25)
        # unique ts per user: at equal timestamps the operator's
        # (ts, event_id) order decides "preceding", which a timestamp-only
        # brute force can't mirror — and nanosecond event ties don't occur
        # in real data
        stamps = rng.sample(range(0, 4 * 3600), n)
        for t in stamps:
            eid += 1
            rows.append(
                (eid, user, rng.choice(["click", "purchase", "view"]), t * ns)
            )
    # brute force
    expected: dict[int, tuple[int, int]] = {}
    for user in {r[1] for r in rows}:
        evs = [r for r in rows if r[1] == user]
        clicks = [r[3] for r in evs if r[2] == "click"]
        purchases = [r for r in evs if r[2] == "purchase"]
        conv = sum(
            1
            for p in purchases
            if any(p[3] - 3600 * ns <= c <= p[3] for c in clicks)
        )
        if purchases:
            expected[user] = (len(purchases), conv)

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long"
    )
    w = F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    purchases = df.select(
        "user_id", "ts", "event_type", w.alias("last_click")
    ).filter(F.col("event_type") == "purchase")
    converted = F.col("last_click").isNotNull() & (
        (F.col("ts") - F.col("last_click")) <= 3600 * ns
    )
    got = {
        r["user_id"]: (r["n"], r["c"])
        for r in purchases.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(converted.cast("int")).alias("c"),
        )
        .collect()
    }
    assert got == expected


def test_bpe_merges_match_pure_python_reference(spark, sf_small):
    """bpe_merge_steps must reproduce a from-scratch Python BPE trainer on
    the same corpus: identical winning pair, merged symbol, and count at
    every step (Python str.replace shares the greedy left-to-right
    non-overlapping semantics the operator relies on)."""
    import re

    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.textstats import (
        BPE_STEPS,
        _BPE_SEP,
    )

    texts = pq.read_table(f"{sf_small}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    seqs = [
        _BPE_SEP.join(w)
        for t in texts
        for w in re.split(r"\s+", t.strip())
        if w != ""
    ]

    expected = []
    for _ in range(BPE_STEPS):
        counts: dict[str, int] = {}
        for s in seqs:
            parts = s.split(_BPE_SEP)
            for i in range(len(parts) - 1):
                pr = parts[i] + _BPE_SEP + parts[i + 1]
                counts[pr] = counts.get(pr, 0) + 1
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((best[0].split(_BPE_SEP), best[0].replace(_BPE_SEP, ""), best[1]))
        seqs = [s.replace(best[0], best[0].replace(_BPE_SEP, "")) for s in seqs]

    rows = sorted(
        registry.QUERIES["bpe_merge_steps"](spark, sf_small).collect(),
        key=lambda r: r["step"],
    )
    assert len(rows) == BPE_STEPS
    for row, ((left, right), merged, count) in zip(rows, expected):
        assert (row["merge_left"], row["merge_right"]) == (left, right)
        assert row["merged"] == merged
        assert row["pair_count"] == count


def test_ewma_matches_pure_python_reference(spark, sf_small):
    """The 16-tap truncated EWMA must equal the textbook recurrence
    s_j = x_j/2 + s_{j-1}/2 truncated at 16 taps, computed independently
    in Python over the same events."""
    from collections import defaultdict

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.scale_ext import EWMA_TAPS
    from metas_judiciarias_etl_spark.sources.parquet import load_table

    ev = load_table(spark, sf_small, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    per_user: dict[int, list[tuple]] = defaultdict(list)
    for r in ev.collect():
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["value"]))
    expected = {}
    for uid, rows in per_user.items():
        rows.sort(key=lambda t: (t[0], t[1]), reverse=True)
        tail = rows[:EWMA_TAPS]
        scaled = sum(
            round(v * 100) * (1 << (EWMA_TAPS - 1 - j))
            for j, (_, _, v) in enumerate(tail)
        )
        expected[uid] = (len(tail), scaled / float((1 << EWMA_TAPS) * 100))

    got = {
        r["user_id"]: (r["n_taps"], r["ewma_value"])
        for r in registry.QUERIES["ewma_halflife"](spark, sf_small).collect()
    }
    assert got == expected


def test_bitmap_distinct_equals_count_distinct(spark, sf_small):
    """The bitmap-word popcount rollup must equal Spark's own
    countDistinct on every day."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.scale_ext import _DAY_NS
    from metas_judiciarias_etl_spark.sources.parquet import load_table

    ev = load_table(spark, sf_small, "events")
    exact = {
        r["day_id"]: r["n"]
        for r in ev.select(F.expr(f"ts div {_DAY_NS}").alias("day_id"), "user_id")
        .groupBy("day_id")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {
        r["day_id"]: r["distinct_users"]
        for r in registry.QUERIES["bitmap_distinct_users"](
            spark, sf_small
        ).collect()
    }
    assert got == exact


def test_cms_estimate_upper_bounds_exact(spark, sf_small):
    """Count-min estimates can only overcount (hash collisions add,
    never subtract): estimate >= exact for every probed token."""
    from metas_judiciarias_etl_spark import registry

    rows = registry.QUERIES["cms_heavy_hitters"](spark, sf_small).collect()
    assert len(rows) == 10
    assert all(r["cms_estimate"] >= r["exact_count"] for r in rows)


def test_winsorized_mean_lies_within_bounds(spark, sf_small):
    """The winsorized mean must lie inside [lo, hi] and never exceed the
    raw mean's distance from the median direction of trimming; also the
    clamped sum is bounded by n*lo and n*hi."""
    from metas_judiciarias_etl_spark import registry

    for r in registry.QUERIES["winsorized_stats"](spark, sf_small).collect():
        assert r["lo_cents"] <= r["hi_cents"]
        assert r["n"] * r["lo_cents"] <= r["winsorized_sum_cents"] <= r["n"] * r["hi_cents"]
        assert r["lo_cents"] / 100.0 <= r["winsorized_mean"] <= r["hi_cents"] / 100.0


def test_kcore_result_is_a_2core(spark, sf_small):
    """After the final peel round every surviving vertex must have degree
    >= 2 within the surviving edge set (the fixed point was reached on
    this fixture), and rounds must shrink monotonically."""
    from metas_judiciarias_etl_spark import registry

    rows = sorted(
        registry.QUERIES["graph_kcore_peel"](spark, sf_small).collect(),
        key=lambda r: r["round"],
    )
    edges = [r["n_edges"] for r in rows]
    verts = [r["n_vertices"] for r in rows]
    assert edges == sorted(edges, reverse=True)
    assert verts == sorted(verts, reverse=True)


# --------------------------------------------------------------------------
# Profiling & affinity batch: brute-force references in pure Python over
# the same parquet fixtures.
# --------------------------------------------------------------------------
def _events_pdf(sf_small):
    import pyarrow.parquet as pq

    pdf = pq.read_table(f"{sf_small}/events.parquet").to_pandas()
    pdf["ts_us"] = pdf["ts"].astype("int64")  # timestamp[us] -> epoch micros
    return pdf


def test_interval_coverage_matches_bruteforce(spark, sf_small):
    """Merged-interval coverage must equal a pure-Python sweep-line merge
    of the same [ts, ts+5min) intervals."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()

    pdf = _events_pdf(sf_small)
    iv = 300_000_000
    expected = {}
    for uid, grp in pdf.groupby("user_id"):
        spans = sorted((t, t + iv) for t in grp["ts_us"])
        islands = []
        for s, e in spans:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        expected[uid] = (len(islands), sum(e - s for s, e in islands))

    got = {
        r["user_id"]: (r["n_islands"], r["covered_us"])
        for r in registry.QUERIES["interval_coverage"](spark, sf_small).collect()
    }
    assert got == expected


def test_attribution_conserves_purchases_and_matches_bruteforce(spark, sf_small):
    """Every purchase lands in exactly one channel bucket, and the
    channel totals match a per-user Python replay of the last-touch
    rule."""
    from collections import defaultdict

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    from metas_judiciarias_etl_spark.plans.sessions_ext import ATTR_LOOKBACK_US

    pdf = _events_pdf(sf_small)
    expected = defaultdict(lambda: [0, 0])
    for _, grp in pdf.groupby("user_id"):
        last = None  # (ts_us, type) of most recent click/view
        for r in grp.sort_values(["ts_us", "event_id"]).itertuples():
            if r.event_type == "purchase":
                if last is not None and r.ts_us - last[0] <= ATTR_LOOKBACK_US:
                    expected[last[1]][0] += 1
                    expected[last[1]][1] += r.ts_us - last[0]
                else:
                    expected["none"][0] += 1
            if r.event_type in ("click", "view"):
                last = (r.ts_us, r.event_type)

    rows = registry.QUERIES["attribution_last_touch"](spark, sf_small).collect()
    got = {r["touch_type"]: [r["n_purchases"], r["total_lag_us"]] for r in rows}
    assert got == dict(expected)
    assert sum(v[0] for v in got.values()) == int(
        (pdf["event_type"] == "purchase").sum()
    )


def test_path_trigrams_matches_bruteforce(spark, sf_small):
    """Top trigram counts must equal a per-user Python sequence scan."""
    from collections import Counter

    from metas_judiciarias_etl_spark import registry

    registry.load_all()

    pdf = _events_pdf(sf_small)
    cnt = Counter()
    for _, grp in pdf.groupby("user_id"):
        seq = list(grp.sort_values(["ts_us", "event_id"])["event_type"])
        for i in range(len(seq) - 2):
            cnt[tuple(seq[i : i + 3])] += 1
    expected = sorted(
        ((n, t) for t, n in cnt.items()), key=lambda x: (-x[0], x[1])
    )[:15]

    rows = registry.QUERIES["path_trigrams"](spark, sf_small).collect()
    got = [(r["n_paths"], (r["e1"], r["e2"], r["e3"])) for r in rows]
    assert sorted(got, key=lambda x: (-x[0], x[1])) == expected


def test_basket_pairs_match_bruteforce(spark, sf_small):
    """Pair counts must equal a Python itertools scan over capped
    baskets."""
    from collections import Counter
    from itertools import combinations

    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    from metas_judiciarias_etl_spark.plans.profiling_ext import MAX_BASKET

    pdf = pq.read_table(
        f"{sf_small}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas()
    cnt = Counter()
    for _, grp in pdf.groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"]))
        if len(parts) <= MAX_BASKET:
            for a, b in combinations(parts, 2):
                cnt[(a, b)] += 1
    expected = sorted(
        ((n, p) for p, n in cnt.items()), key=lambda x: (-x[0], x[1])
    )[:20]

    rows = registry.QUERIES["basket_pair_counts"](spark, sf_small).collect()
    got = [(r["n_orders"], (r["part_a"], r["part_b"])) for r in rows]
    assert sorted(got, key=lambda x: (-x[0], x[1])) == expected


def test_vocab_coverage_monotone_and_bounded(spark, sf_small):
    from metas_judiciarias_etl_spark import registry

    registry.load_all()

    rows = {
        r["v_size"]: r
        for r in registry.QUERIES["vocab_coverage"](spark, sf_small).collect()
    }
    small, large = rows[100], rows[500]
    assert small["total_tokens"] == large["total_tokens"]
    assert 0 < small["covered_tokens"] <= large["covered_tokens"]
    assert large["covered_tokens"] <= large["total_tokens"]
    assert 0.0 < small["coverage"] <= large["coverage"] <= 1.0


def test_df_spectrum_totals_match_vocabulary(spark, sf_small):
    """Band totals must add up to the vocabulary size and the distinct
    (doc, token) pair count — nothing dropped, nothing double-counted."""
    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry

    registry.load_all()

    pdf = pq.read_table(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    pairs = {
        (d, t)
        for d, txt in zip(pdf["doc_id"], pdf["text"])
        for t in txt.strip().split()
    }
    vocab = {t for _, t in pairs}

    rows = registry.QUERIES["token_df_spectrum"](spark, sf_small).collect()
    assert sum(r["n_terms"] for r in rows) == len(vocab)
    assert sum(r["sum_df"] for r in rows) == len(pairs)


def test_label_propagation_matches_python_reference(spark, sf_small):
    """The unrolled Spark LPA must agree with an independent Python
    implementation of the same synchronized min-tie-break rule."""
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    from metas_judiciarias_etl_spark.plans.analytics_ext import (
        _LPA_ITERS,
        _LPA_SEED_MOD,
    )

    pdf = pq.read_table(
        f"{sf_small}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas()
    nbrs = defaultdict(set)
    for _, grp in pdf[pdf["l_partkey"] <= 300].groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"]))
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                nbrs[u].add(v)
                nbrs[v].add(u)
    labels = {n: n % _LPA_SEED_MOD for n in nbrs}
    for _ in range(_LPA_ITERS):
        nxt = {}
        for n, ns in nbrs.items():
            votes = Counter(labels[x] for x in ns)
            top = max(votes.values())
            nxt[n] = min(l for l, c in votes.items() if c == top)
        labels = nxt

    rows = registry.QUERIES["graph_label_propagation"](spark, sf_small).collect()
    got = {r["node"]: r["label"] for r in rows}
    assert got == labels


def test_column_profile_matches_pandas(spark, sf_small):
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    from metas_judiciarias_etl_spark.plans.profiling_ext import _PROFILE_COLS

    import pyarrow.parquet as pq

    pdf = pq.read_table(
        f"{sf_small}/lineitem.parquet", columns=list(_PROFILE_COLS)
    ).to_pandas()
    rows = registry.QUERIES["dq_column_profile"](spark, sf_small).collect()
    assert {r["column_name"] for r in rows} == set(_PROFILE_COLS)
    for r in rows:
        s = pdf[r["column_name"]]
        assert r["n_rows"] == len(s)
        assert r["n_null"] == int(s.isna().sum())
        assert r["n_distinct"] == s.nunique()
        assert r["min_val"] == s.min()
        assert r["max_val"] == s.max()


def test_equi_depth_bins_cover_all_rows_and_balance(spark, sf_small):
    """Every row lands in exactly one bin, bins tile the value range in
    order, and depths are balanced up to boundary-tie slack."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    rows = sorted(
        registry.QUERIES["histogram_equi_depth"](spark, sf_small).collect(),
        key=lambda r: r["bin"],
    )
    n_total = sum(r["n_rows"] for r in rows)
    import pyarrow.parquet as pq

    pdf = pq.read_table(
        f"{sf_small}/lineitem.parquet", columns=["l_extendedprice"]
    ).to_pandas()
    assert n_total == len(pdf)
    for prev, cur in zip(rows, rows[1:]):
        assert prev["hi_cents"] <= cur["lo_cents"]
    # equi-depth balance: no bin more than 2x the ideal depth (ties at
    # quantile boundaries can shift rows between neighbors, not explode)
    ideal = n_total / len(rows)
    assert all(r["n_rows"] < 2 * ideal for r in rows)


def test_emb_outlier_matches_numpy(spark, sf_small):
    """Outlier counts must match a numpy replay of the per-(label, dim)
    z-score rule (tolerating only float-sum association differences,
    which the sorted fold removes — so exact equality)."""
    import numpy as np
    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import (
        _ZOUT_EPS,
        _ZOUT_THRESHOLD,
    )

    registry.load_all()
    tbl = pq.read_table(f"{sf_small}/embeddings.parquet").to_pandas()
    expected = {}
    for label, grp in tbl.groupby("label"):
        grp = grp.sort_values("vec_id")
        m = np.array(
            [np.asarray(e, dtype=np.float32) for e in grp["embedding"]],
            dtype=np.float64,
        )
        n = len(grp)
        # mirror the engine's fold order: vec_id-ascending left fold
        mu = np.zeros(m.shape[1])
        ex2 = np.zeros(m.shape[1])
        for row in m:  # sequential fold, same order as the sorted list
            mu += row
            ex2 += row * row
        mu /= n
        ex2 /= n
        sd = np.sqrt(np.maximum(ex2 - mu * mu, 0.0) + _ZOUT_EPS)
        z = np.abs(m - mu) / sd
        max_z = z.max(axis=1)
        expected[label] = (n, int((max_z > _ZOUT_THRESHOLD).sum()))

    rows = registry.QUERIES["emb_outlier_zscore"](spark, sf_small).collect()
    got = {r["label"]: (r["n_vecs"], r["n_outliers"]) for r in rows}
    assert got == expected


def test_rrf_fusion_scores_match_python_replay(spark, sf_small):
    """The fused ranking must equal a Python RRF replay over the two
    collected candidate lists."""
    from collections import defaultdict

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import _RRF_K, _RRF_TOP

    registry.load_all()
    score = defaultdict(float)
    lists = defaultdict(int)
    for name in ("sim_cosine_topk_lsh", "sim_cosine_topk_ivf"):
        rows = registry.QUERIES[name](spark, sf_small).collect()
        per_q = defaultdict(list)
        for r in rows:
            per_q[r["query_id"]].append((-r["cosine"], r["vec_id"]))
        for q, lst in per_q.items():
            for rank, (_, vid) in enumerate(sorted(lst), 1):
                score[(q, vid)] += 1.0 / (_RRF_K + rank)
                lists[(q, vid)] += 1
    expected = {}
    by_q = defaultdict(list)
    for (q, vid), s in score.items():
        by_q[q].append((-s, vid))
    for q, lst in by_q.items():
        for (negs, vid) in sorted(lst)[:_RRF_TOP]:
            expected[(q, vid)] = (-negs, lists[(q, vid)])

    got = {
        (r["query_id"], r["vec_id"]): (r["rrf_score"], r["n_lists"])
        for r in registry.QUERIES["sim_rank_fusion_rrf"](spark, sf_small).collect()
    }
    assert set(got) == set(expected)
    for k, (s, n) in got.items():
        assert n == expected[k][1]
        assert abs(s - expected[k][0]) < 1e-15


def test_source_matrix_accounts_for_every_lsh_pair(spark, sf_small):
    """Matrix cell counts must sum to the composed pair-list size, cells
    must be canonicalized (src_a <= src_b), and the within_source flag
    must match the diagonal."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    n_pairs = registry.QUERIES["dedup_minhash_lsh"](spark, sf_small).count()
    rows = registry.QUERIES["dedup_source_matrix"](spark, sf_small).collect()
    assert sum(r["n_pairs"] for r in rows) == n_pairs
    for r in rows:
        assert r["src_a"] <= r["src_b"]
        assert r["within_source"] == int(r["src_a"] == r["src_b"])
        assert 0 < r["min_jaccard"] <= r["max_jaccard"] <= 1.0


def test_label_margin_consistent_with_knn_votes(spark, sf_small):
    """n_same_in_topk must equal the kNN vote count for the query's own
    label (both compose the same brute-force top-k), and margin must be
    best_same - best_other whenever both exist."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    margins = {
        r["query_id"]: r
        for r in registry.QUERIES["sim_label_margin"](spark, sf_small).collect()
    }
    topk = registry.QUERIES["sim_cosine_topk_bruteforce"](spark, sf_small).collect()
    import pyarrow.parquet as pq

    lab = dict(
        zip(
            *(
                lambda t: (t["vec_id"], t["label"])
            )(pq.read_table(f"{sf_small}/embeddings.parquet").to_pandas())
        )
    )
    from collections import defaultdict

    same_count = defaultdict(int)
    for r in topk:
        if r["vec_id"] != r["query_id"] and lab[r["vec_id"]] == lab[r["query_id"]]:
            same_count[r["query_id"]] += 1
    for q, row in margins.items():
        assert row["n_same_in_topk"] == same_count[q]
        if row["best_same"] is not None and row["best_other"] is not None:
            assert abs(row["margin"] - (row["best_same"] - row["best_other"])) < 1e-12


def test_source_vocab_overlap_matches_python_sets(spark, sf_small):
    """Jaccard cells must equal pure-Python set arithmetic over the same
    whitespace vocabularies."""
    from itertools import combinations

    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    pdf = pq.read_table(
        f"{sf_small}/documents.parquet", columns=["source", "text"]
    ).to_pandas()
    vocab = {}
    for src, grp in pdf.groupby("source"):
        vocab[src] = set(t for txt in grp["text"] for t in txt.strip().split())
    expected = {}
    for a, b in combinations(sorted(vocab), 2):
        inter = len(vocab[a] & vocab[b])
        if inter:
            expected[(a, b)] = (inter, len(vocab[a]), len(vocab[b]))

    rows = registry.QUERIES["source_vocab_overlap"](spark, sf_small).collect()
    got = {
        (r["src_a"], r["src_b"]): (r["n_common"], r["vocab_a"], r["vocab_b"])
        for r in rows
    }
    assert got == expected
    for r in rows:
        i, va, vb = r["n_common"], r["vocab_a"], r["vocab_b"]
        assert r["jaccard"] == i / float(va + vb - i)


def test_rfm_segments_match_python_replay(spark, sf_small):
    """Segment assignment and totals must equal a pure-Python replay of
    the quartile-boundary scoring rule."""
    from collections import defaultdict
    from datetime import date

    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    pdf = pq.read_table(
        f"{sf_small}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    ).to_pandas()
    epoch = date(1970, 1, 1)
    pdf["day"] = pdf["o_orderdate"].dt.date.map(lambda d: (d - epoch).days)
    pdf["cents"] = (pdf["o_totalprice"] * 100).round().astype("int64")
    cust = pdf.groupby("o_custkey").agg(
        last_day=("day", "max"), n_orders=("day", "size"), m_cents=("cents", "sum")
    )
    ref = cust["last_day"].max()
    cust["rec_days"] = ref - cust["last_day"]

    def qcont(vals, f):
        vals = sorted(vals)
        pos = (len(vals) - 1) * f
        lo = int(pos)
        frac = pos - lo
        hi = min(lo + 1, len(vals) - 1)
        return vals[lo] + (vals[hi] - vals[lo]) * frac

    def score(series):
        bs = [qcont(list(series), f) for f in (0.25, 0.5, 0.75)]
        return series.map(lambda v: sum(v > b for b in bs))

    cust["r"] = score(cust["rec_days"])
    cust["f"] = score(cust["n_orders"])
    cust["m"] = score(cust["m_cents"])
    expected = defaultdict(lambda: [0, 0])
    for row in cust.itertuples():
        seg = f"R{row.r}F{row.f}M{row.m}"
        expected[seg][0] += 1
        expected[seg][1] += row.m_cents

    rows = registry.QUERIES["customer_rfm_segments"](spark, sf_small).collect()
    got = {r["segment"]: [r["n_customers"], r["total_cents"]] for r in rows}
    assert got == dict(expected)


def test_cycle_time_matches_python_quantiles(spark, sf_small):
    """p50/p90 must equal pure-Python linear-interpolated quantiles over
    the same integer day spans."""
    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    li = pq.read_table(
        f"{sf_small}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).to_pandas()
    o = pq.read_table(
        f"{sf_small}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
    ).to_pandas()
    last = li.groupby("l_orderkey")["l_shipdate"].max().reset_index()
    m = last.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m["days"] = (m["l_shipdate"].dt.date - m["o_orderdate"].dt.date).map(
        lambda d: d.days
    )

    def qcont(vals, f):
        vals = sorted(vals)
        pos = (len(vals) - 1) * f
        lo = int(pos)
        hi = min(lo + 1, len(vals) - 1)
        return vals[lo] + (vals[hi] - vals[lo]) * (pos - lo)

    rows = registry.QUERIES["cycle_time_percentiles"](spark, sf_small).collect()
    for r in rows:
        vals = list(m[m["o_orderpriority"] == r["o_orderpriority"]]["days"])
        assert r["n_orders"] == len(vals)
        assert r["p50_days"] == qcont(vals, 0.50)
        assert r["p90_days"] == qcont(vals, 0.90)
        assert r["max_days"] == max(vals)


def test_novelty_totals_conserved_and_first_doc_rule(spark, sf_small):
    """Novel shingle occurrences across sources must equal the global
    distinct shingle count (each shingle is novel exactly once), and
    totals must equal the distinct (doc, shingle) pair count."""
    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    pdf = pq.read_table(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    pairs = set()
    for doc_id, txt in zip(pdf["doc_id"], pdf["text"]):
        toks = txt.strip().split()
        sh = (
            {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
            if len(toks) >= 3
            else {" ".join(toks)}
        )
        pairs.update((doc_id, s) for s in sh)
    vocab = {s for _, s in pairs}

    rows = registry.QUERIES["text_novelty_ratio"](spark, sf_small).collect()
    assert sum(r["novel_shingles"] for r in rows) == len(vocab)
    assert sum(r["total_shingles"] for r in rows) == len(pairs)
    for r in rows:
        assert r["novelty_ratio"] == r["novel_shingles"] / float(r["total_shingles"])


def test_dow_hour_profile_matches_python_calendar(spark, sf_small):
    """Cell counts must equal a Python replay of the integer epoch
    arithmetic, and totals must conserve the event count."""
    from collections import defaultdict

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    pdf = _events_pdf(sf_small)
    expected = defaultdict(lambda: [0, set()])
    for r in pdf.itertuples():
        us = r.ts_us
        dow = (us // 86_400_000_000 + 4) % 7
        hour = (us // 3_600_000_000) % 24
        expected[(dow, hour)][0] += 1
        expected[(dow, hour)][1].add(r.user_id)

    rows = registry.QUERIES["events_dow_hour_profile"](spark, sf_small).collect()
    got = {(r["dow"], r["hour"]): (r["n_events"], r["n_users"]) for r in rows}
    assert got == {k: (v[0], len(v[1])) for k, v in expected.items()}
    assert sum(r["n_events"] for r in rows) == len(pdf)


def test_rolling_median_matches_python_frames(spark, sf_small):
    """Every smoothed value must equal the Python median of its centered
    5-row frame (interpolated on even edge frames)."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    pdf = _events_pdf(sf_small)
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")

    def qcont(vals, f=0.5):
        vals = sorted(vals)
        pos = (len(vals) - 1) * f
        lo = int(pos)
        hi = min(lo + 1, len(vals) - 1)
        return vals[lo] + (vals[hi] - vals[lo]) * (pos - lo)

    expected = {}
    for _, grp in pdf.groupby("user_id"):
        grp = grp.sort_values(["ts_us", "event_id"]).reset_index()
        cents = list(grp["cents"])
        for i, eid in enumerate(grp["event_id"]):
            frame = cents[max(0, i - 2) : i + 3]
            expected[eid] = qcont(frame) / 100.0

    rows = registry.QUERIES["rolling_median_smooth"](spark, sf_small).collect()
    got = {r["event_id"]: r["smoothed_value"] for r in rows}
    assert got == expected


def test_association_rules_match_python_counts(spark, sf_small):
    """Confidence and lift must equal Python set arithmetic over the
    same capped baskets."""
    from collections import Counter
    from itertools import combinations

    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.profiling_ext import (
        MAX_BASKET,
        MIN_PAIR_SUPPORT,
    )

    registry.load_all()
    pdf = pq.read_table(
        f"{sf_small}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas()
    baskets = []
    for _, grp in pdf.groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"]))
        if len(parts) <= MAX_BASKET:
            baskets.append(parts)
    n_baskets = len(baskets)
    df = Counter(p for b in baskets for p in b)
    pair = Counter(pr for b in baskets for pr in combinations(b, 2))

    rows = registry.QUERIES["basket_association_rules"](spark, sf_small).collect()
    got = {(r["part_a"], r["part_b"]): r for r in rows}
    expected_keys = {p for p, c in pair.items() if c >= MIN_PAIR_SUPPORT}
    assert set(got) == expected_keys
    for (pa, pb), r in got.items():
        c = pair[(pa, pb)]
        assert r["n_pairs"] == c
        assert r["confidence_a_to_b"] == c / float(df[pa])
        assert r["lift"] == c * float(n_baskets) / (float(df[pa]) * df[pb])


def test_survival_curve_is_valid_ccdf(spark, sf_small):
    """Survival must be a monotone-decreasing complementary CDF that
    conserves the total gap count and matches a Python replay."""
    from collections import Counter

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    pdf = _events_pdf(sf_small)
    p = pdf[pdf["event_type"] == "purchase"]
    hist = Counter()
    for _, grp in p.groupby("user_id"):
        ts = sorted(zip(grp["ts_us"], grp["event_id"]))
        for (t1, _), (t2, _) in zip(ts, ts[1:]):
            hist[(t2 - t1) // 86_400_000_000] += 1
    total = sum(hist.values())

    rows = sorted(
        registry.QUERIES["purchase_gap_survival"](spark, sf_small).collect(),
        key=lambda r: r["gap_days"],
    )
    assert {r["gap_days"]: r["n_gaps"] for r in rows} == dict(hist)
    running = 0
    prev = 1.1
    for r in rows:
        running += r["n_gaps"]
        assert r["n_surviving"] == total - running
        assert r["survival"] == (total - running) / total
        assert r["survival"] < prev
        prev = r["survival"]


def test_link_prediction_matches_python_sets(spark, sf_small):
    """Top candidates must equal Python neighborhood-set arithmetic:
    non-edges with common neighbors, scored by Jaccard."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.analytics_ext import LINKPRED_TOP

    registry.load_all()
    pdf = pq.read_table(
        f"{sf_small}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas()
    nbrs = defaultdict(set)
    edges = set()
    for _, grp in pdf[pdf["l_partkey"] <= 300].groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"]))
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                edges.add((u, v))
                nbrs[u].add(v)
                nbrs[v].add(u)
    scored = []
    nodes = sorted(nbrs)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1 :]:
            if (x, y) in edges:
                continue
            common = len(nbrs[x] & nbrs[y])
            if common:
                j = common / float(len(nbrs[x] | nbrs[y]))
                scored.append((-j, x, y, common))
    expected = [
        (x, y, c, -nj) for nj, x, y, c in sorted(scored)[:LINKPRED_TOP]
    ]

    rows = registry.QUERIES["graph_link_prediction"](spark, sf_small).collect()
    got = [
        (r["node_a"], r["node_b"], r["n_common"], r["jaccard"]) for r in rows
    ]
    assert sorted(got, key=lambda t: (-t[3], t[0], t[1])) == expected


def test_quiet_segments_match_python_runs(spark, sf_small):
    """Segment counts and runs must equal a Python replay over the
    collected RMS windows (same threshold, same adjacency rule)."""
    from collections import defaultdict

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.multimodal import QUIET_RMS

    registry.load_all()
    rms = registry.QUERIES["mm_audio_rms_windows"](spark, sf_small).collect()
    quiet = defaultdict(list)
    for r in rms:
        if r["rms"] < QUIET_RMS:
            quiet[r["doc_id"]].append(r["win_idx"])
    expected = {}
    for doc, idxs in quiet.items():
        runs = []
        for i in sorted(idxs):
            if runs and i == runs[-1][1] + 1:
                runs[-1][1] = i
            else:
                runs.append([i, i])
        lens = [b - a + 1 for a, b in runs]
        expected[doc] = (len(runs), max(lens), sum(lens))

    rows = registry.QUERIES["mm_audio_quiet_segments"](spark, sf_small).collect()
    got = {
        r["doc_id"]: (r["n_segments"], r["longest_run"], r["quiet_windows"])
        for r in rows
    }
    assert got == expected


def test_markov_stationary_matches_numpy_power_iteration(spark, sf_small):
    """pi_approx must equal numpy's v @ P^3 from the uniform start, and
    remain a probability vector (sums to ~1)."""
    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.analytics_ext import _MARKOV_ITERS

    registry.load_all()
    counts = registry.QUERIES["event_transitions"](spark, sf_small).collect()
    states = sorted({r["src"] for r in counts})
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    for r in counts:
        if r["dst"] in idx:
            P[idx[r["src"]], idx[r["dst"]]] = r["n"]
    P = P / P.sum(axis=1, keepdims=True)
    v = np.full(len(states), 1.0 / len(states))
    for _ in range(_MARKOV_ITERS):
        v = v @ P

    rows = registry.QUERIES["markov_stationary"](spark, sf_small).collect()
    got = {r["state"]: r["pi_approx"] for r in rows}
    assert set(got) == set(states)
    for s in states:
        assert abs(got[s] - v[idx[s]]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pca_component_matches_numpy(spark, sf_small):
    """The power-iteration result must match numpy's identical
    computation (same centering, same iteration count, same
    normalization), be unit-norm, and align with the true top
    eigenvector of the covariance."""
    import numpy as np
    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import _PCA_ITERS

    registry.load_all()
    tbl = pq.read_table(f"{sf_small}/embeddings.parquet").to_pandas()
    tbl = tbl.sort_values("vec_id")
    m = np.array(
        [np.asarray(e, dtype=np.float32) for e in tbl["embedding"]],
        dtype=np.float64,
    )
    xc = m - m.mean(axis=0)
    cov = xc.T @ xc / len(m)
    v = np.full(m.shape[1], 1.0 / 8.0)
    for _ in range(_PCA_ITERS):
        w = cov @ v
        v = w / np.sqrt((w * w).sum())

    rows = registry.QUERIES["emb_pca_top_component"](spark, sf_small).collect()
    got = np.zeros(m.shape[1])
    for r in rows:
        got[r["dim"] - 1] = r["component"]
    assert abs(np.linalg.norm(got) - 1.0) < 1e-9
    assert np.abs(got - v).max() < 1e-6
    # each power step must not decrease variance capture: the iterate's
    # Rayleigh quotient beats the uniform start's (full convergence to
    # the top eigenvector is NOT asserted — the synthetic corpus has a
    # near-flat spectrum, and the operator's contract is the fixed
    # 3-step iterate, which the exact-match assert above already pins)
    v0 = np.full(m.shape[1], 1.0 / 8.0)
    r0 = (v0 @ cov @ v0) / (v0 @ v0)
    assert got @ cov @ got >= r0


def test_approx_twins_rank_bands_hold_and_exact_columns_match(spark, sf_small):
    """The five sketch twins: every bounded-rank-error flag must be 1 (the
    sketch landed inside its exact band), and the engine-invariant columns
    must equal their exact siblings' values where both expose them."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()

    pa = registry.QUERIES["percentile_agg_approx"](spark, sf_small).collect()
    assert pa and all(
        r[f] == 1 for r in pa for f in ("p25_ok", "p50_ok", "p75_ok", "p95_ok")
    )

    eq = registry.QUERIES["histogram_equi_depth_approx"](spark, sf_small).collect()
    assert sorted(r["bin"] for r in eq) == list(range(8))
    assert all(r["equi_depth_ok"] == 1 for r in eq)
    n_li = (
        spark.read.parquet(f"{sf_small}/lineitem.parquet").count()
    )
    assert all(r["n_total"] == n_li for r in eq)

    ct_a = {
        r["o_orderpriority"]: r
        for r in registry.QUERIES["cycle_time_percentiles_approx"](
            spark, sf_small
        ).collect()
    }
    ct_e = {
        r["o_orderpriority"]: r
        for r in registry.QUERIES["cycle_time_percentiles"](
            spark, sf_small
        ).collect()
    }
    assert set(ct_a) == set(ct_e)
    for k, r in ct_a.items():
        assert r["p50_ok"] == 1 and r["p90_ok"] == 1
        assert r["n_orders"] == ct_e[k]["n_orders"]
        assert r["max_days"] == ct_e[k]["max_days"]

    mad_a = {
        r["event_type"]: r
        for r in registry.QUERIES["mad_robust_outliers_approx"](
            spark, sf_small
        ).collect()
    }
    mad_e = {
        r["event_type"]: r
        for r in registry.QUERIES["mad_robust_outliers"](spark, sf_small).collect()
    }
    assert set(mad_a) == set(mad_e)
    for k, r in mad_a.items():
        assert r["med_ok"] == 1 and r["mad_ok"] == 1
        assert r["n_rows"] == mad_e[k]["n_rows"]

    [rfm] = registry.QUERIES["customer_rfm_segments_approx"](
        spark, sf_small
    ).collect()
    assert rfm["n_rec_bounds_ok"] == 3 and rfm["n_mon_bounds_ok"] == 3
    # conservation against the exact sibling's segment rollup
    exact = registry.QUERIES["customer_rfm_segments"](spark, sf_small).collect()
    assert rfm["n_customers"] == sum(r["n_customers"] for r in exact)
    assert rfm["total_cents"] == sum(r["total_cents"] for r in exact)


def test_state_keys_profile_accounts_for_every_event(spark, sf_small):
    """State-cardinality accounting must conserve events and agree with an
    independent distinct-count of the streaming state key."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.sources.parquet import load_table

    registry.load_all()
    rows = registry.QUERIES["stream_state_keys_profile"](spark, sf_small).collect()
    ev = load_table(spark, sf_small, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    expected_keys = (
        ev.select(
            F.expr("(ts - pmod(ts, 3600000000000)) div 1000000000").alias("w"),
            "user_id",
            "event_type",
        )
        .distinct()
        .count()
    )
    assert sum(r["n_state_keys"] for r in rows) == expected_keys
    for r in rows:
        assert 1 <= r["n_state_keys"] <= r["n_events"]
        assert r["max_key_events"] <= r["n_events"]


def test_bloom_prune_matches_python_bit_replay(spark, sf_small):
    """The Bloom filter's pass set must match a bit-exact Python replay of
    the same hash family, and its guarantees must hold: zero false
    negatives, pass superset of true matches."""
    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.pruning_ext import (
        _BLOOM_BITS,
        _BLOOM_HASHES,
        _BLOOM_PRIORITY,
    )

    registry.load_all()
    orders = pq.read_table(f"{sf_small}/orders.parquet").to_pandas()
    li = pq.read_table(f"{sf_small}/lineitem.parquet").to_pandas()
    build = set(
        orders.loc[orders["o_orderpriority"] == _BLOOM_PRIORITY, "o_orderkey"]
    )

    def hashes(key):
        m = _BLOOM_BITS
        k1, k2 = key % m, (key // m) % m
        return [(k1 * a + k2 * b + c) % m for a, b, c in _BLOOM_HASHES]

    bits = set()
    for key in build:
        bits.update(hashes(key))
    n_pass = sum(all(h in bits for h in hashes(k)) for k in li["l_orderkey"])
    n_true = sum(k in build for k in li["l_orderkey"])

    [row] = registry.QUERIES["bloom_semi_join_prune"](spark, sf_small).collect()
    assert row["n_probe_rows"] == len(li)
    assert row["n_pass_bloom"] == n_pass
    assert row["n_true_match"] == n_true
    assert row["n_false_neg"] == 0
    assert row["n_false_pos"] == n_pass - n_true
    assert row["n_bits_set"] == len(bits)


def test_zonemap_skipping_is_sound_and_effective(spark, sf_small):
    """Zone-map pruning must be sound (no matching row inside a skipped
    bucket) and the accounting must match a pandas replay."""
    import pandas as pd
    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.pruning_ext import (
        _ZM_BUCKET,
        _ZM_HI,
        _ZM_LO,
    )

    registry.load_all()
    li = pq.read_table(
        f"{sf_small}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).to_pandas()
    days = (
        pd.to_datetime(li["l_shipdate"]).dt.normalize()
        - pd.Timestamp("1970-01-01")
    ).dt.days
    bucket = li["l_orderkey"] // _ZM_BUCKET
    z = pd.DataFrame({"b": bucket, "d": days}).groupby("b")["d"].agg(
        ["min", "max", "count"]
    )
    skip = (z["max"] < _ZM_LO) | (z["min"] > _ZM_HI)
    match = days.between(_ZM_LO, _ZM_HI)

    [row] = registry.QUERIES["data_skipping_zonemap"](spark, sf_small).collect()
    assert row["n_buckets"] == len(z)
    assert row["n_skipped_buckets"] == int(skip.sum())
    assert row["rows_total"] == len(li)
    assert row["rows_skipped"] == int(z.loc[skip, "count"].sum())
    assert row["n_matching_rows"] == int(match.sum())
    assert row["n_false_skips"] == 0


def test_prefix_filter_jaccard_is_recall_lossless(spark, sf_small):
    """Prefix filtering must return EXACTLY the brute-force all-pairs
    result at J >= 0.5 — lossless by theorem, verified against a Python
    shingle replay (contrast: LSH is allowed to miss; this one is not)."""
    import re

    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry

    registry.load_all()

    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()

    def shingles(text):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        return {
            " ".join(toks[i : i + 3]) for i in range(max(0, len(toks) - 2))
        }

    sets = {r.doc_id: shingles(r.text) for r in docs.itertuples()}
    ids = sorted(sets)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter == 0:
                continue
            j = inter / len(sa | sb)
            if j >= 0.5:
                expected[(a, b)] = round(j, 6)

    got = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in registry.QUERIES["dedup_prefix_filter_jaccard"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-9


def test_incremental_join_delta_identity(spark, sf_small):
    """A⋈B must equal the union of the four delta terms exactly — row
    count AND revenue cents — for disjoint base/delta splits (the IVM
    identity incremental join views rely on)."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    rows = {
        r["term"]: (r["n_rows"], r["cents"])
        for r in registry.QUERIES["incremental_join_delta"](
            spark, sf_small
        ).collect()
    }
    assert rows["full"] == rows["reconstructed"]
    assert rows["full"][0] == sum(
        rows[t][0]
        for t in ("old_old", "delta_old", "old_delta", "delta_delta")
    )
    assert all(v[0] > 0 for v in rows.values()), "a delta term is empty"


def test_isotonic_pav_monotone_and_mass_conserving(spark, sf_small):
    """The minimax isotonic fit must be (a) nondecreasing in bin and
    (b) conserve the weighted total (PAV pools blocks to their mean, so
    sum n_b * fit_b == sum pos_b) — the two invariants that certify the
    closed form IS the PAV solution."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    rows = sorted(
        registry.QUERIES["calibration_isotonic_pav"](
            spark, sf_small
        ).collect(),
        key=lambda r: r["bin"],
    )
    assert rows, "isotonic fit returned no bins"
    iso = [r["isotonic_rate"] for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(iso, iso[1:]))
    tot = sum(r["n_docs"] * r["isotonic_rate"] for r in rows)
    kept = sum(r["n_kept"] for r in rows)
    assert abs(tot - kept) < 1e-6


def test_containment_join_is_recall_lossless(spark, sf_small):
    """The asymmetric prefix filter must return EXACTLY the brute-force
    all-pairs result at max-direction containment >= 0.8 — lossless by
    the overlap-prefix theorem (probe prefixes of |A| - ceil(0.8|A|) + 1
    rarest shingles against the full index), verified against a Python
    shingle replay, flags included."""
    import re

    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry

    registry.load_all()

    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()

    def shingles(text):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        return {
            " ".join(toks[i : i + 3]) for i in range(max(0, len(toks) - 2))
        }

    sets = {r.doc_id: shingles(r.text) for r in docs.itertuples()}
    ids = sorted(sets)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter == 0:
                continue
            if max(inter / len(sa), inter / len(sb)) >= 0.8:
                j = inter / len(sa | sb)
                expected[(a, b)] = (
                    round(inter / len(sa), 6),
                    round(inter / len(sb), 6),
                    round(j, 6),
                    int(j < 0.5),
                )

    got = {
        (r["a_id"], r["b_id"]): (
            r["containment_ab"],
            r["containment_ba"],
            r["jaccard"],
            r["subset_only"],
        )
        for r in registry.QUERIES["dedup_containment_asymmetric"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(expected)
    for k, exp in expected.items():
        for g, e in zip(got[k][:3], exp[:3]):
            assert abs(g - e) < 1e-9
        assert got[k][3] == exp[3]


def test_hits_scores_match_numpy_replay(spark, sf_small):
    """The 2-round max-normalized HITS iterate must match a numpy replay
    of the same quantized arithmetic, and the top authority must be a
    part with maximal weighted in-neighborhood."""
    import numpy as np
    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.scale_ext import (
        _HITS_ITERS,
        _HITS_PART_CAP,
        _HITS_SCALE,
    )

    registry.load_all()
    orders = pq.read_table(
        f"{sf_small}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pandas()
    li = pq.read_table(
        f"{sf_small}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas()
    li = li[li["l_partkey"] <= _HITS_PART_CAP]
    m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    edges = sorted(set(zip(m["o_custkey"], m["l_partkey"])))
    custs = sorted({c for c, _ in edges})
    parts = sorted({p for _, p in edges})
    ci = {c: i for i, c in enumerate(custs)}
    pi = {p: i for i, p in enumerate(parts)}
    adj = np.zeros((len(custs), len(parts)), dtype=np.int64)
    for c, p in edges:
        adj[ci[c], pi[p]] = 1

    def norm_q(raw):
        return np.round(raw.astype(np.float64) / raw.max() * _HITS_SCALE).astype(
            np.int64
        )

    hq = np.full(len(custs), _HITS_SCALE, dtype=np.int64)
    for _ in range(_HITS_ITERS):
        aq = norm_q(adj.T @ hq)
        hq = norm_q(adj @ aq)

    rows = registry.QUERIES["graph_hits_scores"](spark, sf_small).collect()
    got_a = {r["node_id"]: r["score"] for r in rows if r["role"] == "authority"}
    got_h = {r["node_id"]: r["score"] for r in rows if r["role"] == "hub"}
    assert got_a == {p: aq[pi[p]] / _HITS_SCALE for p in parts}
    assert got_h == {c: hq[ci[c]] / _HITS_SCALE for c in custs}
    assert max(got_a.values()) == 1.0 and max(got_h.values()) == 1.0


def test_leakage_check_conserves_pairs_and_flags_off_diagonal(spark, sf_small):
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    rows = registry.QUERIES["split_leakage_check"](spark, sf_small).collect()
    n_pairs_total = registry.QUERIES["dedup_minhash_lsh"](spark, sf_small).count()
    assert sum(r["n_pairs"] for r in rows) == n_pairs_total
    for r in rows:
        assert r["is_leakage"] == int(r["split_a"] != r["split_b"])
        assert r["split_a"] <= r["split_b"]  # canonicalized cells


def test_quality_histogram_cut_column_is_true_cumulative(spark, sf_small):
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.sources.parquet import load_table

    registry.load_all()
    rows = sorted(
        registry.QUERIES["quality_token_histogram"](spark, sf_small).collect(),
        key=lambda r: -r["quality_bin"],
    )
    n_docs = load_table(spark, sf_small, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    running = 0
    for r in rows:
        running += r["bpe_tokens"]
        assert r["tokens_kept_at_cut"] == running


def test_mixture_weights_reach_uniform_target(spark, sf_small):
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    rows = registry.QUERIES["source_mixture_weights"](spark, sf_small).collect()
    assert abs(sum(r["natural_share"] for r in rows) - 1.0) < 1e-4
    n = len(rows)
    for r in rows:
        # multiplier x natural share = uniform target 1/n (up to 6-dp rounds)
        assert abs(r["uniform_multiplier"] * r["natural_share"] - 1.0 / n) < 1e-4
    total = sum(r["bpe_tokens"] for r in rows)
    exp_total = sum(
        x["bpe_tokens"]
        for x in registry.QUERIES["text_token_count"](spark, sf_small).collect()
    )
    assert total == exp_total


def test_pattern_match_agrees_with_python_automaton(spark, sf_small):
    """The window formulation must agree with a literal per-user automaton
    replay of click (view)* purchase over the same event sequences."""
    from collections import defaultdict

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.sources.parquet import load_table

    registry.load_all()
    ev = load_table(spark, sf_small, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    per_user = defaultdict(list)
    for r in ev.collect():
        per_user[r["user_id"]].append((r["ts"] // 1000, r["event_id"], r["event_type"]))
    expected = {}
    for uid, rows in per_user.items():
        rows.sort()
        n_p = n_m = views_total = 0
        max_views = 0
        last_nv = None       # (type, views_strictly_before_it)
        v_run = 0
        for _, _, et in rows:
            if et == "purchase":
                n_p += 1
                if last_nv is not None and last_nv[0] == "click":
                    n_m += 1
                    pv = v_run - last_nv[1]
                    views_total += pv
                    max_views = max(max_views, pv)
            if et != "view":
                last_nv = (et, v_run)
            else:
                v_run += 1
        if n_p:
            expected[uid] = (n_p, n_m, views_total, max_views)

    got = {
        r["user_id"]: (
            r["n_purchases"],
            r["n_matched_paths"],
            r["views_in_paths"],
            r["max_path_views"],
        )
        for r in registry.QUERIES["event_pattern_match"](spark, sf_small).collect()
    }
    assert got == expected


def test_benford_shares_match_python_counts(spark, sf_small):
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    tp = pq.read_table(
        f"{sf_small}/orders.parquet", columns=["o_totalprice"]
    ).to_pandas()["o_totalprice"]
    digits = Counter(
        int(str(int(round(v * 100)))[0]) for v in tp if v > 0
    )
    total = sum(digits.values())
    rows = {
        r["digit"]: r
        for r in registry.QUERIES["dq_benford_first_digit"](
            spark, sf_small
        ).collect()
    }
    assert {d: r["n_orders"] for d, r in rows.items()} == dict(digits)
    for d, r in rows.items():
        assert abs(r["observed_share"] - digits[d] / total) < 1e-5
        assert abs(r["expected_share"] - math.log10(1 + 1 / d)) < 1e-5


def test_seasonal_decomposition_reconstructs_and_matches_pandas(spark, sf_small):
    """trend + seasonal + residual must reconstruct the monthly revenue,
    and every component must match an integer-exact pandas replay."""
    import pandas as pd
    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    orders = pq.read_table(
        f"{sf_small}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    ).to_pandas()
    od = pd.to_datetime(orders["o_orderdate"])
    month_id = od.dt.year * 12 + od.dt.month - 1
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    m = (
        pd.DataFrame({"mid": month_id, "c": cents})
        .groupby("mid")["c"].sum().sort_index()
    )
    trend12 = m.rolling(12, center=True).sum().shift(-1)  # rows -5..+6
    full = trend12.dropna().astype("int64")
    det12 = 12 * m.loc[full.index] - full
    seas_sum = det12.groupby(det12.index % 12).sum()
    seas_n = det12.groupby(det12.index % 12).size()

    rows = {
        r["month_id"]: r
        for r in registry.QUERIES["seasonal_decompose_monthly"](
            spark, sf_small
        ).collect()
    }
    assert set(rows) == set(full.index)
    for mid, r in rows.items():
        moy = mid % 12
        seasonal = seas_sum[moy] / (1200.0 * seas_n[moy])
        assert abs(r["revenue"] - m[mid] / 100.0) < 1e-6
        assert abs(r["trend"] - full[mid] / 1200.0) < 1e-5
        assert abs(r["seasonal"] - seasonal) < 1e-5
        assert abs(r["residual"] - (12 * m[mid] - full[mid]) / 1200.0 + seasonal) < 1e-5
        # additivity: components reconstruct the observed value (per round)
        assert abs(r["trend"] + r["seasonal"] + r["residual"] - r["revenue"]) < 2e-5


def test_ivf_cell_balance_conserves_and_matches_assignment(spark, sf_small):
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.sources.parquet import load_table

    registry.load_all()
    rows = registry.QUERIES["ivf_cell_balance"](spark, sf_small).collect()
    n_corpus = load_table(spark, sf_small, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n_corpus
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    n_cells = len(rows)
    for r in rows:
        assert abs(r["balance_ratio"] - r["share"] * n_cells) < 1e-5


def test_join_cardinality_estimate_matches_pandas(spark, sf_small):
    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    pk = pq.read_table(
        f"{sf_small}/lineitem.parquet", columns=["l_partkey"]
    ).to_pandas()["l_partkey"]
    counts = pk.value_counts()
    [row] = registry.QUERIES["join_cardinality_estimate"](
        spark, sf_small
    ).collect()
    assert row["n_rows"] == len(pk)
    assert row["n_distinct"] == len(counts)
    assert row["exact_selfjoin_rows"] == int((counts * counts).sum())
    assert row["max_key_rows"] == int(counts.max())
    est = len(pk) * len(pk) / len(counts)
    assert abs(row["independence_estimate"] - est) < 0.51
    assert abs(row["skew_inflation"] - (counts * counts).sum() / est) < 1e-4


def test_hll_merge_flags_and_exact_counts(spark, sf_small):
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.sources.parquet import load_table

    registry.load_all()
    rows = {
        r["segment"]: r
        for r in registry.QUERIES["hll_partitioned_merge"](
            spark, sf_small
        ).collect()
    }
    ev = load_table(spark, sf_small, "events")
    assert rows["ALL"]["n_exact"] == ev.select("user_id").distinct().count()
    per = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for seg, n in per.items():
        assert rows[seg]["n_exact"] == n
    assert all(r["estimate_ok"] == 1 for r in rows.values())


def test_cluster_keeper_is_best_quality_member(spark, sf_small):
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    members = {}
    for r in registry.QUERIES["dedup_clusters"](spark, sf_small).collect():
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    quality = {
        r["doc_id"]: r["quality"]
        for r in registry.QUERIES["text_quality"](spark, sf_small).collect()
    }
    got = {
        r["cluster_id"]: r
        for r in registry.QUERIES["dedup_cluster_keeper_quality"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(members)
    for cid, docs in members.items():
        best = min(docs, key=lambda d: (-quality[d], d))
        assert got[cid]["keeper_doc_id"] == best
        assert abs(got[cid]["keeper_quality"] - quality[best]) < 1e-9
        assert got[cid]["n_members"] == len(docs)
        assert got[cid]["n_dropped"] == len(docs) - 1


def test_simhash_hamming1_matches_bruteforce(spark, sf_small):
    """Multi-index probing must find EXACTLY the pairs at hamming <= 1
    that a brute-force all-pairs scan over the fingerprints finds."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    fps = {
        r["doc_id"]: r["simhash16"]
        for r in registry.QUERIES["dedup_simhash"](spark, sf_small).collect()
    }
    ids = sorted(fps)
    expected = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 1
    }
    got = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in registry.QUERIES["dedup_simhash_hamming1"](
            spark, sf_small
        ).collect()
    }
    assert got == expected


def test_null_safe_join_identity_holds(spark, sf_small):
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    [r] = registry.QUERIES["null_safe_join_semantics"](spark, sf_small).collect()
    # the whole point: null-safe adds exactly the null x null matches
    assert (
        r["n_nullsafe_pairs"] - r["n_eq_pairs"] == r["n_null_a"] * r["n_null_b"]
    )
    assert r["n_null_a"] > 0 and r["n_null_b"] > 0  # fixture really has NULLs


def test_zorder_beats_linear_on_second_dimension(spark, sf_small):
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    rows = {
        (r["layout"], r["predicate"]): r
        for r in registry.QUERIES["zorder_skipping_effectiveness"](
            spark, sf_small
        ).collect()
    }
    # soundness everywhere; matching rows invariant across layouts
    for r in rows.values():
        assert r["n_false_skips"] == 0
    for pred in ("2d", "sx_only"):
        assert (
            rows[("linear_px", pred)]["n_matching_rows"]
            == rows[("zorder", pred)]["n_matching_rows"]
        )
    # the strict separation (linear prunes nothing on the off-cluster
    # dimension, z-order prunes a lot) needs the sx domain to fill its
    # interleaved bit-width — true at sf0.1 (suppkey up to 1000), not at
    # the tiny fixtures where suppkey stops at 10; assert it only there
    from metas_judiciarias_etl_spark.sources.parquet import load_table

    max_sx = (
        load_table(spark, sf_small, "lineitem")
        .agg(F.max((F.col("l_suppkey") % 1024)).alias("m"))
        .collect()[0]["m"]
    )
    if max_sx >= 512:
        assert rows[("linear_px", "sx_only")]["n_skipped_buckets"] == 0
        assert rows[("zorder", "sx_only")]["n_skipped_buckets"] > 0


def test_mor_delete_application_matches_python_replay(spark, sf_small):
    """Positional delete application must agree with a literal pandas
    replay: same file assignment, same positions, same ~2% hash-selected
    delete set, same surviving checksum."""
    import hashlib

    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.functions.hashing import HASH_HEX_LEN
    from metas_judiciarias_etl_spark.plans.scale_ext import (
        _MOR_DELETE_PCT,
        _MOR_FILE_ROWS,
    )

    registry.load_all()
    li = pq.read_table(
        f"{sf_small}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    ).to_pandas()
    li = li.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)
    li["file_id"] = li["l_orderkey"] // _MOR_FILE_ROWS
    li["cents"] = (li["l_extendedprice"] * 100).round().astype("int64")

    def hmod(ok, ln):
        h = hashlib.md5(f"{ok}#{ln}".encode()).hexdigest()[:HASH_HEX_LEN]
        return int(h, 16) % 100

    expected = {}
    for fid, grp in li.groupby("file_id"):
        deleted = sum(
            hmod(ok, ln) < _MOR_DELETE_PCT
            for ok, ln in zip(grp["l_orderkey"], grp["l_linenumber"])
        )
        surv_cents = sum(
            c
            for ok, ln, c in zip(
                grp["l_orderkey"], grp["l_linenumber"], grp["cents"]
            )
            if hmod(ok, ln) >= _MOR_DELETE_PCT
        )
        expected[fid] = (len(grp), deleted, len(grp) - deleted, surv_cents)

    got = {
        r["file_id"]: (
            r["n_rows"],
            r["n_deleted"],
            r["n_surviving"],
            r["surviving_cents"],
        )
        for r in registry.QUERIES["mor_positional_delete_apply"](
            spark, sf_small
        ).collect()
    }
    assert got == expected
    assert sum(v[1] for v in expected.values()) > 0  # deletes really fire


def test_emb_drift_matches_numpy_halves(spark, sf_small):
    import numpy as np
    import pyarrow.parquet as pq

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import _FXP_SCALE

    registry.load_all()
    t = pq.read_table(f"{sf_small}/embeddings.parquet").to_pandas()
    expected = {}
    for label, grp in t.groupby("label"):
        halves = {}
        for h in (0, 1):
            sub = grp[grp["vec_id"] % 2 == h]
            m = np.array(
                [np.asarray(e, dtype=np.float32) for e in sub["embedding"]],
                dtype=np.float64,
            )
            q = np.round(m * _FXP_SCALE).astype("int64")
            halves[h] = (q.sum(axis=0).astype("float64") / (len(sub) * _FXP_SCALE), len(sub))
        d = halves[0][0] - halves[1][0]
        expected[label] = (
            halves[0][1],
            halves[1][1],
            round(float(np.sqrt((d * d).sum())), 6),
        )
    got = {
        r["label"]: (r["n_even"], r["n_odd"], r["drift_l2"])
        for r in registry.QUERIES["emb_drift_by_split"](spark, sf_small).collect()
    }
    assert set(got) == set(expected)
    for k in got:
        assert got[k][0] == expected[k][0] and got[k][1] == expected[k][1]
        assert abs(got[k][2] - expected[k][2]) < 1e-6


def _load_pdf(sf_small, table):
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_small}/{table}.parquet").to_pandas()


def test_ks_two_sample_matches_numpy_ecdf(spark, sf_small):
    import numpy as np

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    ref = docs["source"].min()
    x = np.sort(docs.loc[docs["source"] == ref, "n_chars"].to_numpy())
    y = np.sort(docs.loc[docs["source"] != ref, "n_chars"].to_numpy())
    support = np.unique(np.concatenate([x, y]))
    f1 = np.searchsorted(x, support, side="right") / len(x)
    f2 = np.searchsorted(y, support, side="right") / len(y)
    expected = float(np.max(np.abs(f1 - f2)))
    row = registry.QUERIES["ks_two_sample"](spark, sf_small).collect()[0]
    assert row["n1"] == len(x) and row["n2"] == len(y)
    assert abs(row["ks_stat"] - expected) < 1e-12
    assert 0.0 <= row["ks_stat"] <= 1.0


def test_gini_matches_numpy_rank_form(spark, sf_small):
    import numpy as np

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    cust = _load_pdf(sf_small, "customer")
    orders = _load_pdf(sf_small, "orders")
    nation = _load_pdf(sf_small, "nation").set_index("n_nationkey")["n_name"]
    cents = (
        orders.assign(c=(orders["o_totalprice"] * 100).round().astype("int64"))
        .groupby("o_custkey")["c"]
        .sum()
    )
    cust = cust.assign(cents=cust["c_custkey"].map(cents).fillna(0).astype("int64"))
    got = {
        r["n_name"]: r
        for r in registry.QUERIES["gini_concentration"](spark, sf_small).collect()
    }
    for nk, grp in cust.groupby("c_nationkey"):
        v = np.sort(grp["cents"].to_numpy())
        n, s = len(v), int(v.sum())
        rs = int((np.arange(1, n + 1, dtype=np.int64) * v).sum())
        expected = (2 * rs - (n + 1) * s) / (n * s) if s else None
        row = got[nation[nk]]
        assert row["n_customers"] == n and row["total_cents"] == s
        if expected is None:
            assert row["gini"] is None
        else:
            assert abs(row["gini"] - expected) < 1e-12
            assert 0.0 <= row["gini"] < 1.0


def test_jackknife_matches_numpy_replay(spark, sf_small):
    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.analytics_ext import JACK_BUCKETS

    registry.load_all()
    orders = _load_pdf(sf_small, "orders")
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    b = (orders["o_orderkey"] % JACK_BUCKETS).to_numpy()
    s_tot, n_tot = int(cents.sum()), len(cents)
    loos = []
    for bucket in sorted(set(b)):
        mask = b == bucket
        loos.append((s_tot - int(cents[mask].sum())) / (n_tot - int(mask.sum())))
    mean_loo = sum(loos) / JACK_BUCKETS
    se = (sum((x - mean_loo) ** 2 for x in loos) * 31.0 / 32.0) ** 0.5
    row = registry.QUERIES["jackknife_bucket_ci"](spark, sf_small).collect()[0]
    assert row["n_orders"] == n_tot
    assert abs(row["mean_cents"] - s_tot / n_tot) < 1e-9
    assert row["se_cents"] >= 0.0
    assert abs(row["se_cents"] - se) < max(1e-9, 1e-9 * se)


def _python_edges(sf_small, cap):
    li = _load_pdf(sf_small, "lineitem")
    li = li[li["l_partkey"] <= cap]
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(set(grp["l_partkey"]))
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                edges.add((int(u), int(v)))
    return edges


def test_bfs_matches_python_frontier_replay(spark, sf_small):
    from collections import deque

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.analytics_ext import (
        _PART_EDGE_CAP,
        BFS_MAX_HOPS,
        BFS_SEED_MOD,
    )

    registry.load_all()
    edges = _python_edges(sf_small, _PART_EDGE_CAP)
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {n: 0 for n in adj if n % BFS_SEED_MOD == 0}
    q = deque(dist)
    while q:
        n = q.popleft()
        if dist[n] >= BFS_MAX_HOPS:
            continue
        for nb in adj[n]:
            if nb not in dist:
                dist[nb] = dist[n] + 1
                q.append(nb)
    expected = {}
    for d in dist.values():
        expected[d] = expected.get(d, 0) + 1
    expected[-1] = len(adj) - len(dist)
    got = {
        r["dist"]: r["n_nodes"]
        for r in registry.QUERIES["graph_bfs_distance"](spark, sf_small).collect()
    }
    assert got == expected
    assert sum(got.values()) == len(adj)


def test_collocation_lift_matches_python(spark, sf_small):
    from collections import Counter

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.textstats import (
        PMI_MIN_COUNT,
        PMI_TOPK,
    )

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    pairs, left, right = Counter(), Counter(), Counter()
    total = 0
    for text in docs["text"]:
        ts = text.strip().split()
        for w1, w2 in zip(ts, ts[1:]):
            pairs[(w1, w2)] += 1
            left[w1] += 1
            right[w2] += 1
            total += 1
    scored = [
        (c * total / left[w1] / right[w2], w1, w2, c)
        for (w1, w2), c in pairs.items()
        if c >= PMI_MIN_COUNT
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expected = [(w1, w2, c) for _, w1, w2, c in scored[:PMI_TOPK]]
    rows = registry.QUERIES["text_collocation_pmi"](spark, sf_small).collect()
    got = [(r["w1"], r["w2"], r["n_pair"]) for r in rows]
    assert got == expected
    for r, (lift, _, _, _) in zip(rows, scored[:PMI_TOPK]):
        assert abs(r["lift"] - lift) < 1e-9 * max(1.0, lift)


def test_lsh_candidates_are_subset_of_lossless_truth(spark, sf_small):
    """dedup_prefix_filter_jaccard is recall-lossless, so every verified
    LSH pair must appear in the truth set: n_hit == n_lsh, always."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    row = registry.QUERIES["dedup_lsh_recall"](spark, sf_small).collect()[0]
    assert row["n_hit"] == row["n_lsh"]
    assert row["n_hit"] <= row["n_truth"]
    if row["n_truth"] > 0:
        assert 0.0 <= row["recall"] <= 1.0


def test_int8_quantize_error_bounded_by_half_step(spark, sf_small):
    import numpy as np

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    emb = _load_pdf(sf_small, "embeddings")
    rows = registry.QUERIES["emb_int8_quantize"](spark, sf_small).collect()
    by_id = {r["vec_id"]: r for r in rows}
    assert set(by_id) == set(emb["vec_id"])
    for _, rec in emb.iterrows():
        v = np.asarray(rec["embedding"], dtype=np.float32).astype(np.float64)
        r = by_id[rec["vec_id"]]
        scale = float(np.max(np.abs(v))) / 127.0
        assert abs(r["scale"] - scale) < 1e-15 * max(1.0, scale)
        if scale > 0:
            q = np.clip(np.floor(v / scale + 0.5), -127, 127)
            errs = np.abs(v - q * scale)
            assert abs(r["max_abs_err"] - float(errs.max())) < 1e-12
            # half-step bound: quantization never errs more than scale/2
            assert r["max_abs_err"] <= scale / 2 + 1e-12
        else:
            assert r["max_abs_err"] == 0.0 and r["l1_err"] == 0.0


def test_cow_amplification_matches_python_replay(spark, sf_small):
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.functions.hashing import HASH_HEX_LEN
    from metas_judiciarias_etl_spark.plans.scale_ext import (
        _MOR_DELETE_PCT,
        _MOR_FILE_ROWS,
    )
    import hashlib

    registry.load_all()
    li = _load_pdf(sf_small, "lineitem")
    per_file = {}
    for ok, ln in zip(li["l_orderkey"], li["l_linenumber"]):
        fid = int(ok) // _MOR_FILE_ROWS
        h = int(
            hashlib.md5(f"{ok}#{ln}".encode()).hexdigest()[:HASH_HEX_LEN], 16
        )
        n, d = per_file.get(fid, (0, 0))
        per_file[fid] = (n + 1, d + (1 if h % 100 < _MOR_DELETE_PCT else 0))
    touched = {f: (n, d) for f, (n, d) in per_file.items() if d > 0}
    row = registry.QUERIES["cow_write_amplification"](spark, sf_small).collect()[0]
    assert row["n_files"] == len(per_file)
    assert row["n_files_touched"] == len(touched)
    assert row["rows_deleted"] == sum(d for _, d in per_file.values())
    assert row["rows_rewritten"] == sum(n for n, _ in touched.values())
    assert row["rows_rewritten"] >= row["rows_deleted"]


def test_modularity_terms_match_python_from_registered_labels(spark, sf_small):
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.analytics_ext import _PART_EDGE_CAP

    registry.load_all()
    edges = _python_edges(sf_small, _PART_EDGE_CAP)
    labels = {
        r["node"]: r["label"]
        for r in registry.QUERIES["graph_label_propagation"](
            spark, sf_small
        ).collect()
    }
    m = len(edges)
    intra, deg, nodes = {}, {}, {}
    for u, v in edges:
        lu, lv = labels[u], labels[v]
        if lu == lv:
            intra[lu] = intra.get(lu, 0) + 1
        for n, l in ((u, lu), (v, lv)):
            deg[l] = deg.get(l, 0) + 1
            nodes.setdefault(l, set()).add(n)
    rows = registry.QUERIES["graph_modularity"](spark, sf_small).collect()
    got = {r["community"]: r for r in rows}
    assert set(got) == set(deg)
    q_total = 0.0
    for c in deg:
        r = got[c]
        assert r["degree_sum"] == deg[c]
        assert r["n_nodes"] == len(nodes[c])
        assert r["intra_edges"] == intra.get(c, 0)
        expected = (4 * m * intra.get(c, 0) - deg[c] ** 2) / (4 * m * m)
        assert abs(r["q_term"] - expected) < 1e-12
        q_total += r["q_term"]
    assert q_total <= 1.0 + 1e-9


def test_burstiness_matches_pandas_fano(spark, sf_small):
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    got = {
        r["event_type"]: r
        for r in registry.QUERIES["events_user_burstiness"](
            spark, sf_small
        ).collect()
    }
    for et, grp in ev.groupby("event_type"):
        counts = grp.groupby("user_id").size()
        n, s, q = len(counts), int(counts.sum()), int((counts**2).sum())
        row = got[et]
        assert row["n_users"] == n and row["n_events"] == s
        expected = (n * q - s * s) / (n * s)
        assert abs(row["fano"] - expected) < 1e-12
        assert row["fano"] >= 0.0


def test_pointbiserial_matches_numpy_from_components(spark, sf_small):
    import numpy as np

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    quality = {
        r["doc_id"]: r["quality"]
        for r in registry.QUERIES["text_quality"](spark, sf_small).collect()
        if r["quality"] is not None
    }
    dups = {
        r["doc_id"]
        for r in registry.QUERIES["dedup_clusters"](spark, sf_small).collect()
    }
    x = np.array([round(q * 1e6) for q in quality.values()], dtype=np.int64)
    y = np.array(
        [1 if d in dups else 0 for d in quality], dtype=np.int64
    )
    row = registry.QUERIES["quality_dup_pointbiserial"](
        spark, sf_small
    ).collect()[0]
    assert row["n_docs"] == len(x)
    assert row["n_dup"] == int(y.sum())
    if 0 < y.sum() < len(y):
        expected = float(np.corrcoef(x, y)[0, 1])
        assert abs(row["pointbiserial"] - expected) < 1e-9
        assert -1.0 <= row["pointbiserial"] <= 1.0


def test_zipf_slope_matches_numpy_polyfit(spark, sf_small):
    from collections import Counter

    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.textstats import ZIPF_V

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    c = Counter()
    for text in docs["text"]:
        c.update(text.strip().split())
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_V]
    xs = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    ys = np.log(np.array([cnt for _, cnt in top], dtype=np.float64))
    slope, intercept = np.polyfit(xs, ys, 1)
    row = registry.QUERIES["text_zipf_slope"](spark, sf_small).collect()[0]
    assert row["n_tokens"] == len(top)
    assert abs(row["zipf_slope"] - slope) < 1e-5
    assert abs(row["log_intercept"] - intercept) < 1e-5
    assert row["zipf_slope"] < 0.0  # frequency falls with rank


def test_prefix_topk_matches_numpy_and_recall_bounded(spark, sf_small):
    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import (
        N_QUERIES,
        PREFIX_DIM,
        TOPK,
    )

    registry.load_all()
    emb = _load_pdf(sf_small, "embeddings")
    vecs = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float32).astype(
            np.float64
        )[:PREFIX_DIM]
        for _, r in emb.iterrows()
    }
    rows = registry.QUERIES["sim_cosine_topk_prefix"](spark, sf_small).collect()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    for qid in [v for v in vecs if v < N_QUERIES]:
        qv = vecs[qid]
        scored = sorted(
            (
                (-round(float(qv @ v) / (np.linalg.norm(qv) * np.linalg.norm(v)), 4), vid)
                for vid, v in vecs.items()
            )
        )[:TOPK]
        expected = [(vid, -c) for c, vid in scored]
        assert sorted(got[qid]) == sorted(expected)
    rec = registry.QUERIES["sim_recall_dim_prefix"](spark, sf_small).collect()
    assert len(rec) == sum(1 for v in vecs if v < N_QUERIES)
    for r in rec:
        assert r["k"] == TOPK
        assert 0.0 <= r["recall_at_k"] <= 1.0


def test_rerank_recall_dominates_raw_prefix(spark, sf_small):
    """Reranking a 50-deep prefix shortlist can only improve on the raw
    prefix top-k: per query, recall@k(rerank) >= recall@k(prefix)."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    raw = {
        r["query_id"]: r["recall_at_k"]
        for r in registry.QUERIES["sim_recall_dim_prefix"](
            spark, sf_small
        ).collect()
    }
    rr = {
        r["query_id"]: r["recall_at_k"]
        for r in registry.QUERIES["sim_recall_prefix_rerank"](
            spark, sf_small
        ).collect()
    }
    assert set(raw) == set(rr)
    for qid in raw:
        assert rr[qid] >= raw[qid] - 1e-9


def test_burst_collapse_matches_pandas_replay(spark, sf_small):
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.sessions_ext import BURST_TTL_NS

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    ev = ev.assign(tns=ev["ts"].astype("datetime64[ns]").astype("int64"))
    got = {
        r["event_type"]: r
        for r in registry.QUERIES["events_burst_collapse"](
            spark, sf_small
        ).collect()
    }
    totals = {}
    for (_, et), grp in ev.groupby(["user_id", "event_type"]):
        ts = sorted(zip(grp["tns"], grp["event_id"]))
        kept = sum(
            1
            for i, (t, _) in enumerate(ts)
            if i == 0 or t - ts[i - 1][0] > BURST_TTL_NS
        )
        n, k = totals.get(et, (0, 0))
        totals[et] = (n + len(ts), k + kept)
    assert set(got) == set(totals)
    for et, (n, k) in totals.items():
        r = got[et]
        assert (r["n_events"], r["n_kept"], r["n_collapsed"]) == (n, k, n - k)
        assert abs(r["keep_ratio"] - k / n) < 1e-12


def test_neyman_allocation_matches_numpy(spark, sf_small):
    import numpy as np

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    cust = _load_pdf(sf_small, "customer")
    cust = cust.assign(cents=(cust["c_acctbal"] * 100).round().astype("int64"))
    stats = {}
    for seg, grp in cust.groupby("c_mktsegment"):
        v = grp["cents"].to_numpy().astype(np.float64)
        stats[seg] = (len(v), float(np.std(v, ddof=1) * np.sqrt(1.0)))
    denom = sum(n * s for n, s in stats.values())
    got = {
        r["segment"]: r
        for r in registry.QUERIES["neyman_allocation"](spark, sf_small).collect()
    }
    assert set(got) == set(stats)
    wsum = 0.0
    for seg, (n, s) in stats.items():
        r = got[seg]
        assert r["n_h"] == n
        assert abs(r["stddev_cents"] - s) < 1e-4 * max(1.0, s)
        assert abs(r["neyman_weight"] - n * s / denom) < 1e-5
        assert abs(r["proportional_weight"] - n / len(cust)) < 1e-6
        wsum += r["neyman_weight"]
    assert abs(wsum - 1.0) < 1e-4  # allocation is a distribution


def test_int8_retrieval_recall_near_exact(spark, sf_small):
    """Int8 quantization perturbs cosines by ~1e-2 at most (64 dims,
    half-step error per component), so recall@10 vs the exact brute
    force should be near-perfect on separated neighbors — and always a
    valid proportion."""
    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import N_QUERIES, TOPK

    registry.load_all()
    rec = registry.QUERIES["sim_recall_int8"](spark, sf_small).collect()
    assert len(rec) == N_QUERIES
    vals = [r["recall_at_k"] for r in rec]
    for v in vals:
        assert 0.0 <= v <= 1.0
    assert float(np.mean(vals)) >= 0.8
    # spot-replay one query end-to-end in numpy
    emb = _load_pdf(sf_small, "embeddings")
    vecs = {}
    for _, r in emb.iterrows():
        x = np.asarray(r["embedding"], dtype=np.float32).astype(np.float64)
        s = float(np.max(np.abs(x))) / 127.0
        if s > 0:
            vecs[int(r["vec_id"])] = np.clip(np.floor(x / s + 0.5), -127, 127) * s
    qid = min(v for v in vecs if v < N_QUERIES)
    qv = vecs[qid]
    scored = sorted(
        (-round(float(qv @ v) / (np.linalg.norm(qv) * np.linalg.norm(v)), 4), vid)
        for vid, v in vecs.items()
    )[:TOPK]
    expected = {vid for _, vid in scored}
    got = {
        r["vec_id"]
        for r in registry.QUERIES["sim_cosine_topk_int8"](spark, sf_small)
        .where(F.col("query_id") == qid)
        .collect()
    }
    assert got == expected


def test_boilerplate_chunks_matches_python(spark, sf_small):
    import hashlib
    from collections import defaultdict

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.textstats import (
        BP_CHUNK_TOKENS,
        BP_TOPK,
    )

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    occ = defaultdict(list)
    for _, r in docs.iterrows():
        ts = r["text"].strip().split()
        n = max(1, -(-len(ts) // BP_CHUNK_TOKENS))
        for i in range(n):
            chunk = " ".join(ts[i * BP_CHUNK_TOKENS:(i + 1) * BP_CHUNK_TOKENS])
            occ[hashlib.md5(chunk.encode()).hexdigest()].append(int(r["doc_id"]))
    agg = [
        (h, len(set(ds)), len(ds), min(ds))
        for h, ds in occ.items()
        if len(set(ds)) >= 2
    ]
    agg.sort(key=lambda t: (-t[1], -t[2], t[0]))
    expected = agg[:BP_TOPK]
    got = [
        (r["chunk_hash"], r["n_docs"], r["n_occurrences"], r["example_doc_id"])
        for r in registry.QUERIES["boilerplate_chunks"](spark, sf_small).collect()
    ]
    assert got == expected


def test_seasonal_anomaly_zscores_standardized(spark, sf_small):
    import numpy as np

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    rows = registry.QUERIES["seasonal_residual_anomaly"](
        spark, sf_small
    ).collect()
    res = np.array([r["residual"] for r in rows])
    z = np.array([r["zscore"] for r in rows])
    mu, sd = res.mean(), res.std(ddof=1)
    np.testing.assert_allclose(z, (res - mu) / sd, atol=2e-6)
    for r in rows:
        assert r["is_anomaly"] == (1 if abs((r["residual"] - mu) / sd) > 2.0 else 0)
    # standardized: mean ~ 0, sd ~ 1
    assert abs(z.mean()) < 1e-4 and abs(z.std(ddof=1) - 1.0) < 1e-4


def test_nprobe_curve_is_monotone_and_anchored(spark, sf_small):
    """Recall must be non-decreasing in nprobe, and the nprobe=4 point
    must agree with the independently-registered sim_recall_ivf (same
    index constants) on total hits."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import NPROBE, TOPK

    registry.load_all()
    rows = {
        r["nprobe"]: r
        for r in registry.QUERIES["sim_ivf_nprobe_curve"](
            spark, sf_small
        ).collect()
    }
    assert sorted(rows) == [1, 2, 4]
    assert rows[1]["mean_recall"] <= rows[2]["mean_recall"] + 1e-9
    assert rows[2]["mean_recall"] <= rows[4]["mean_recall"] + 1e-9
    for r in rows.values():
        assert 0.0 <= r["mean_recall"] <= 1.0
        assert r["n_hits"] <= r["n_exact"]
    assert NPROBE == 4  # anchor comparison valid only while this holds
    ivf_hits = sum(
        int(round(r["recall_at_k"] * TOPK))
        for r in registry.QUERIES["sim_recall_ivf"](spark, sf_small).collect()
    )
    assert rows[4]["n_hits"] == ivf_hits


def test_band_sweep_monotone_in_bands(spark, sf_small):
    """With rows-per-band shrinking as bands grow, candidate sets are
    supersets: candidates, verified pairs, and recall all non-decreasing
    from (1x9) to (3x3) to (9x1); the (3x3) row must agree with
    dedup_lsh_recall's numbers (same scheme, same truth)."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    rows = {
        r["bands"]: r
        for r in registry.QUERIES["dedup_lsh_band_sweep"](
            spark, sf_small
        ).collect()
    }
    assert sorted(rows) == [1, 3, 9]
    if all(r["n_capped_buckets"] == 0 for r in rows.values()):
        # superset monotonicity holds EXACTLY only while no bucket hits
        # the BUCKET_CAP guard (a capped mega-bucket can drop candidates
        # from the finer scheme) — the operator reports the bite
        for a, b in ((1, 3), (3, 9)):
            assert rows[a]["n_candidates"] <= rows[b]["n_candidates"]
            assert rows[a]["n_pairs"] <= rows[b]["n_pairs"]
            assert (rows[a]["recall"] or 0.0) <= (rows[b]["recall"] or 0.0) + 1e-9
    anchor = registry.QUERIES["dedup_lsh_recall"](spark, sf_small).collect()[0]
    assert rows[3]["n_truth"] == anchor["n_truth"]
    assert rows[3]["n_pairs"] == anchor["n_lsh"]


def test_ab_test_matches_scipy_style_replay(spark, sf_small):
    import math
    from collections import Counter

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    users = set(ev["user_id"])
    purch = Counter(ev.loc[ev["event_type"] == "purchase", "user_id"])
    k = sum(purch.values()) // len(users) + 1
    cells = {0: [0, 0], 1: [0, 0]}
    for u in users:
        arm = u % 2
        cells[arm][0] += 1
        cells[arm][1] += 1 if purch.get(u, 0) >= k else 0
    (n0, c0), (n1, c1) = cells[0], cells[1]
    row = registry.QUERIES["ab_test_proportions"](spark, sf_small).collect()[0]
    assert (row["n_control"], row["conv_control"]) == (n0, c0)
    assert (row["n_treat"], row["conv_treat"]) == (n1, c1)
    # partial conversion on both arms (the self-scaling threshold's job)
    assert 0 < c0 < n0 and 0 < c1 < n1
    pp = (c0 + c1) / (n0 + n1)
    z = (c1 / n1 - c0 / n0) / math.sqrt(pp * (1 - pp) * (1 / n0 + 1 / n1))
    assert abs(row["z_stat"] - z) < 1e-12


def test_incremental_cc_equals_full_recompute(spark, sf_small):
    """The operator's core contract, checked against the registered full
    CC too (not just the SQL oracle): identical label tables, and an old
    component's label only changes if a new-batch edge merged it."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    full = {
        r["doc_id"]: r["cluster_id"]
        for r in registry.QUERIES["dedup_clusters"](spark, sf_small).collect()
    }
    inc = {
        r["doc_id"]: r["cluster_id"]
        for r in registry.QUERIES["dedup_clusters_incremental"](
            spark, sf_small
        ).collect()
    }
    assert inc == full
    for d, c in inc.items():
        assert c <= d  # min-label invariant


def test_bpe_curve_monotone_and_consistent_with_trainer(spark, sf_small):
    """Each merge strictly reduces total symbols by exactly the merged
    pair's occurrence count at that step (greedy replace removes one
    symbol per non-overlapping occurrence), and the curve's step-k drop
    must match bpe_merge_steps' pair_count for non-overlapping pairs
    (>= pair_count/2 always, == when left != right)."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    curve = {
        r["step"]: r
        for r in registry.QUERIES["bpe_compression_curve"](
            spark, sf_small
        ).collect()
    }
    merges = {
        r["step"]: r
        for r in registry.QUERIES["bpe_merge_steps"](spark, sf_small).collect()
    }
    steps = sorted(curve)
    assert steps[0] == 0
    for k in steps[1:]:
        drop = curve[k - 1]["n_symbols"] - curve[k]["n_symbols"]
        assert drop > 0
        pc = merges[k]["pair_count"]
        if merges[k]["merge_left"] != merges[k]["merge_right"]:
            assert drop == pc
        else:
            assert pc // 2 <= drop <= pc
        assert curve[k]["n_words"] == curve[0]["n_words"]


def test_gate_sweep_matches_composed_outputs(spark, sf_small):
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.textstats import GATE_THRESHOLDS

    registry.load_all()
    q = {
        r["doc_id"]: r["quality"]
        for r in registry.QUERIES["text_quality"](spark, sf_small).collect()
        if r["quality"] is not None
    }
    tk = {
        r["doc_id"]: r["ws_tokens"]
        for r in registry.QUERIES["text_token_count"](spark, sf_small).collect()
    }
    rows = {
        r["threshold"]: r
        for r in registry.QUERIES["quality_gate_sweep"](
            spark, sf_small
        ).collect()
    }
    prev_yield = 2.0
    for t in (float(x) for x in GATE_THRESHOLDS):
        kept = [d for d in q if q[d] >= t]
        r = rows[t]
        assert r["docs_kept"] == len(kept)
        assert r["tokens_kept"] == sum(tk[d] for d in kept)
        assert r["docs_total"] == len(q)
        assert r["tokens_total"] == sum(tk[d] for d in q)
        assert r["token_yield"] <= prev_yield  # tightening gate: monotone
        prev_yield = r["token_yield"]


def test_theil_sen_matches_numpy_and_resists_outliers(spark, sf_small):
    import numpy as np

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    orders = _load_pdf(sf_small, "orders")
    orders = orders.assign(
        cents=(orders["o_totalprice"] * 100).round().astype("int64"),
        mid=orders["o_orderdate"].dt.year * 12 + orders["o_orderdate"].dt.month - 1,
    )
    monthly = orders.groupby("mid")["cents"].sum().sort_index()
    mids = monthly.index.to_numpy()
    vals = monthly.to_numpy().astype(np.float64)
    slopes = [
        (vals[j] - vals[i]) / (mids[j] - mids[i])
        for i in range(len(mids))
        for j in range(i + 1, len(mids))
    ]
    slope = float(np.median(np.array(slopes)))
    inter = float(np.median(vals - slope * mids))
    row = registry.QUERIES["theil_sen_trend"](spark, sf_small).collect()[0]
    assert row["n_months"] == len(mids)
    assert abs(row["slope_cents_per_month"] - slope) < 1e-9 * max(1.0, abs(slope))
    assert abs(row["intercept_cents"] - inter) < 1e-6 * max(1.0, abs(inter))


def test_minhash_estimate_is_unbiased_enough(spark, sf_small):
    """Per-pair estimates live on the k/9 grid, and across the verified
    pair set the mean estimate must sit near the mean exact Jaccard
    (|bias| well under the single-pair sd ~ 0.17)."""
    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.dedup import NUM_HASHES

    registry.load_all()
    rows = registry.QUERIES["dedup_minhash_estimate_error"](
        spark, sf_small
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_agree"] <= NUM_HASHES
        assert abs(r["est_jaccard"] - r["n_agree"] / NUM_HASHES) < 1e-12
        assert abs(r["abs_err"] - abs(r["est_jaccard"] - r["exact_jaccard"])) < 1e-12
    est = np.array([r["est_jaccard"] for r in rows])
    ex = np.array([r["exact_jaccard"] for r in rows])
    assert abs(float(est.mean() - ex.mean())) < 0.1


def test_decontam_curve_monotone_in_k(spark, sf_small):
    """Every (K+1)-gram contains a K-gram, so a longer-n match implies a
    shorter-n match: flag rate must be non-increasing in K. (The shingle
    builder collapses docs shorter than K to one whole-text shingle,
    which can only match its exact duplicate — still a K-gram match, so
    the implication holds.)"""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    rows = {
        r["ngram_k"]: r
        for r in registry.QUERIES["decontam_ngram_size_curve"](
            spark, sf_small
        ).collect()
    }
    ks = sorted(rows)
    assert len(ks) == 3
    n_train = rows[ks[0]]["n_train_docs"]
    for a, b in zip(ks, ks[1:]):
        assert rows[b]["n_flagged"] <= rows[a]["n_flagged"]
        assert rows[b]["n_train_docs"] == n_train
    for r in rows.values():
        assert 0.0 <= r["flag_rate"] <= 1.0


def _km_python_spans(sf_small):
    ev = _load_pdf(sf_small, "events")
    ev = ev.assign(tns=ev["ts"].astype("datetime64[ns]").astype("int64"))
    DAY = 86_400_000_000_000
    spans = []
    for uid, grp in ev.groupby("user_id"):
        first, last = int(grp["tns"].min()), int(grp["tns"].max())
        q = grp[
            (grp["event_type"] == "purchase")
            & ((grp["value"] * 100).round().astype("int64") % 20 == 0)
        ]["tns"]
        if len(q):
            spans.append((int(uid) % 2, (int(q.min()) - first) // DAY, 1))
        else:
            spans.append((int(uid) % 2, (last - first) // DAY, 0))
    return spans


def test_kaplan_meier_matches_lifelines_style_replay(spark, sf_small):
    from collections import Counter, defaultdict

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    spans = _km_python_spans(sf_small)
    assert any(o == 0 for _, _, o in spans)  # censoring genuinely present
    assert any(o == 1 for _, _, o in spans)
    totals = Counter(d for _, d, _ in spans)
    deaths = defaultdict(int)
    for _, d, obs in spans:
        deaths[d] += obs
    got = {
        r["dur_days"]: r
        for r in registry.QUERIES["survival_kaplan_meier"](
            spark, sf_small
        ).collect()
    }
    n_risk = len(spans)
    s = 1.0
    prev_surv = 1.0
    seen = set()
    for t in sorted(totals):
        if deaths[t] > 0:
            r = got[t]
            assert r["n_at_risk"] == n_risk
            assert r["n_events"] == deaths[t]
            s *= 1.0 - deaths[t] / n_risk
            assert abs(r["survival"] - s) < 1e-5
            assert r["survival"] <= prev_surv + 1e-9  # monotone decreasing
            prev_surv = r["survival"]
            seen.add(t)
        n_risk -= totals[t]
    assert seen == set(got)


def test_logrank_matches_python_replay(spark, sf_small):
    import math
    from collections import defaultdict

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    spans = _km_python_spans(sf_small)
    c_all, c1, d_all, d1 = (
        defaultdict(int), defaultdict(int), defaultdict(int), defaultdict(int)
    )
    for arm, t, obs in spans:
        c_all[t] += 1
        c1[t] += arm
        d_all[t] += obs
        d1[t] += obs * arm
    n_all, n1 = len(spans), sum(a for a, _, _ in spans)
    u = v = 0.0
    n_times = 0
    for t in sorted(c_all):
        if d_all[t] > 0:
            n_times += 1
            p = n1 / n_all
            u += d1[t] - d_all[t] * p
            if n_all > 1:
                v += d_all[t] * p * (1 - p) * (n_all - d_all[t]) / (n_all - 1)
        n_all -= c_all[t]
        n1 -= c1[t]
    row = registry.QUERIES["survival_logrank_test"](spark, sf_small).collect()[0]
    assert row["n_event_times"] == n_times
    assert abs(row["observed_minus_expected"] - u) < 1e-5
    assert v > 0
    assert abs(row["z_stat"] - u / math.sqrt(v)) < 1e-5


def test_token_drift_chi2_matches_scipy_style(spark, sf_small):
    from collections import Counter

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.textstats import DRIFT_TOP_TOKENS

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    ref = docs["source"].min()
    tk1, tk2, tka = Counter(), Counter(), Counter()
    for _, r in docs.iterrows():
        ts = r["text"].strip().split()
        tka.update(ts)
        (tk1 if r["source"] == ref else tk2).update(ts)
    top = sorted(tka.items(), key=lambda kv: (-kv[1], kv[0]))[:DRIFT_TOP_TOKENS]
    toks = [t for t, _ in top]
    n1, n2 = sum(tk1[t] for t in toks), sum(tk2[t] for t in toks)
    chi2 = 0.0
    for t in sorted(toks):
        rt = tk1[t] + tk2[t]
        e1, e2 = rt * n1 / (n1 + n2), rt * n2 / (n1 + n2)
        chi2 += (tk1[t] - e1) ** 2 / e1 + (tk2[t] - e2) ** 2 / e2
    row = registry.QUERIES["text_token_drift_chi2"](spark, sf_small).collect()[0]
    assert row["n_tokens"] == len(toks)
    assert row["dof"] == len(toks) - 1
    assert abs(row["chi2"] - chi2) < 1e-4
    assert row["chi2"] >= 0.0


def test_negative_audit_draws_are_reproducible(spark, sf_small):
    import hashlib

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.functions.hashing import HASH_HEX_LEN
    from metas_judiciarias_etl_spark.operators.similarity import (
        N_QUERIES,
        NEG_K,
    )

    registry.load_all()
    emb = _load_pdf(sf_small, "embeddings")
    ids = sorted(int(v) for v in emb["vec_id"])
    labels = dict(zip(emb["vec_id"].astype(int), emb["label"].astype(int)))
    n = len(ids)
    got = {
        r["query_id"]: r
        for r in registry.QUERIES["contrastive_negative_audit"](
            spark, sf_small
        ).collect()
    }
    for qid in (v for v in ids if v < N_QUERIES):
        negs = []
        for j in range(NEG_K):
            h = int(
                hashlib.md5(f"{qid}#{j}".encode()).hexdigest()[:HASH_HEX_LEN],
                16,
            )
            vid = ids[h % n]
            if vid != qid:
                negs.append(vid)
        r = got[qid]
        assert r["n_negatives"] == len(negs)
        coll = sum(1 for v in negs if labels[v] == labels[qid])
        assert r["n_label_collisions"] == coll
        assert abs(r["collision_rate"] - coll / len(negs)) < 1e-12


def test_item_cosine_matches_python_replay(spark, sf_small):
    import math
    from collections import Counter, defaultdict

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.profiling_ext import (
        ITEM_COS_MIN_CO,
        ITEM_COS_TOPK,
        MAX_BASKET,
    )

    registry.load_all()
    li = _load_pdf(sf_small, "lineitem")
    baskets = defaultdict(set)
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        baskets[int(ok)].add(int(pk))
    baskets = {k: v for k, v in baskets.items() if len(v) <= MAX_BASKET}
    deg = Counter()
    co = Counter()
    for items in baskets.values():
        s = sorted(items)
        deg.update(s)
        for i, x in enumerate(s):
            for y in s[i + 1:]:
                co[(x, y)] += 1
    scored = [
        (c / math.sqrt(deg[a] * deg[b]), a, b, c)
        for (a, b), c in co.items()
        if c >= ITEM_COS_MIN_CO
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expected = [(a, b, c) for _, a, b, c in scored[:ITEM_COS_TOPK]]
    rows = registry.QUERIES["item_cooccurrence_cosine"](
        spark, sf_small
    ).collect()
    got = [(r["part_a"], r["part_b"], r["n_co"]) for r in rows]
    assert got == expected
    for r, (cos, _, _, _) in zip(rows, scored[:ITEM_COS_TOPK]):
        assert abs(r["cosine"] - cos) < 1e-12
        assert 0.0 < r["cosine"] <= 1.0


def test_kmeans_iteration_matches_numpy_and_decreases(spark, sf_small):
    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import (
        _FXP_SCALE,
        N_CELLS,
        N_QUERIES,
    )

    registry.load_all()
    emb = _load_pdf(sf_small, "embeddings")
    vecs = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float32).astype(
            np.float64
        )
        for _, r in emb.iterrows()
    }
    X = np.array([vecs[k] for k in sorted(vecs)])
    order = sorted(vecs)
    cents = np.array(
        [vecs[k] for k in range(N_QUERIES, N_QUERIES + N_CELLS)]
    )

    def assign(C):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1), d.min(axis=1)

    lab0, d0 = assign(cents)
    C1 = cents.copy()
    for c in range(N_CELLS):
        mask = lab0 == c
        if mask.any():
            q = np.round(X[mask] * _FXP_SCALE)
            C1[c] = q.sum(axis=0) / (mask.sum() * _FXP_SCALE)
    lab1, d1 = assign(C1)
    rows = {
        r["cell_id"]: r
        for r in registry.QUERIES["kmeans_lloyd_iteration"](
            spark, sf_small
        ).collect()
    }
    assert sorted(rows) == list(range(N_CELLS))
    for c in range(N_CELLS):
        r = rows[c]
        assert r["n_before"] == int((lab0 == c).sum())
        assert r["n_after"] == int((lab1 == c).sum())
        exp0 = float(np.round(d0[lab0 == c] * _FXP_SCALE).sum() / _FXP_SCALE)
        exp1 = float(np.round(d1[lab1 == c] * _FXP_SCALE).sum() / _FXP_SCALE)
        # numpy sums in a different order than the index fold, and the
        # 2^-20 grid can flip a unit per point on the ties -> loose-ish tol
        assert abs(r["obj_before"] - exp0) < 1e-4
        assert abs(r["obj_after"] - exp1) < 1e-4
    assert sum(r["n_before"] for r in rows.values()) == len(X)
    assert sum(r["n_after"] for r in rows.values()) == len(X)
    # Lloyd monotonicity, measured (quantization jitter << real decrease)
    total0 = sum(r["obj_before"] for r in rows.values())
    total1 = sum(r["obj_after"] for r in rows.values())
    assert total1 <= total0 + 1e-6


def test_cohort_ltv_matches_pandas_replay(spark, sf_small):
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    orders = _load_pdf(sf_small, "orders")
    orders = orders.assign(
        cents=(orders["o_totalprice"] * 100).round().astype("int64"),
        mid=orders["o_orderdate"].dt.year * 12
        + orders["o_orderdate"].dt.month - 1,
    )
    firsts = orders.groupby("o_custkey")["mid"].min()
    orders = orders.assign(cohort=orders["o_custkey"].map(firsts))
    orders = orders.assign(age=orders["mid"] - orders["cohort"])
    sizes = firsts.value_counts()
    got = {
        (r["cohort"], r["age"]): r
        for r in registry.QUERIES["cohort_ltv_curve"](spark, sf_small).collect()
    }
    agg = orders.groupby(["cohort", "age"])["cents"].sum()
    seen = set()
    for cohort in sorted(sizes.index):
        cum = 0
        prev_ltv = -1.0
        for age in sorted(a for c, a in agg.index if c == cohort):
            cum += int(agg[(cohort, age)])
            r = got[(cohort, age)]
            assert r["cohort_size"] == int(sizes[cohort])
            assert r["cum_cents"] == cum
            ltv = cum / sizes[cohort]
            assert abs(r["ltv_cents_per_customer"] - ltv) < 1e-9
            assert ltv >= prev_ltv  # cumulative revenue never decreases
            prev_ltv = ltv
            seen.add((cohort, age))
    assert seen == set(got)


def test_assortativity_matches_networkx_style_replay(spark, sf_small):
    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.analytics_ext import _PART_EDGE_CAP

    registry.load_all()
    edges = _python_edges(sf_small, _PART_EDGE_CAP)
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    x, y = np.array(xs, dtype=np.float64), np.array(ys, dtype=np.float64)
    expected = float(np.corrcoef(x, y)[0, 1])
    row = registry.QUERIES["graph_degree_assortativity"](
        spark, sf_small
    ).collect()[0]
    assert row["n_edges"] == len(edges)
    assert abs(row["assortativity"] - expected) < 1e-9
    assert -1.0 <= row["assortativity"] <= 1.0


def test_wilson_bounds_match_statsmodels_formula(spark, sf_small):
    import math

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    li = _load_pdf(sf_small, "lineitem")
    li = li.assign(
        mid=li["l_shipdate"].dt.year * 12 + li["l_shipdate"].dt.month - 1,
        ret=(li["l_returnflag"] == "R").astype(int),
    )
    got = {
        r["month_id"]: r
        for r in registry.QUERIES["monthly_return_rate_wilson"](
            spark, sf_small
        ).collect()
    }
    z2 = 3.8416
    for mid, grp in li.groupby("mid"):
        n, k = len(grp), int(grp["ret"].sum())
        p = k / n
        center = p + z2 / (2 * n)
        half = math.sqrt(z2) * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        denom = 1 + z2 / n
        r = got[mid]
        assert (r["n_items"], r["n_returned"]) == (n, k)
        assert abs(r["wilson_lo"] - (center - half) / denom) < 1e-12
        assert abs(r["wilson_hi"] - (center + half) / denom) < 1e-12
        assert 0.0 <= r["wilson_lo"] <= r["rate"] <= r["wilson_hi"] <= 1.0


def test_mann_whitney_matches_scipy_formula(spark, sf_small):
    import math
    from collections import Counter

    import numpy as np

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    ref = docs["source"].min()
    x = docs.loc[docs["source"] == ref, "n_chars"].to_numpy()
    y = docs.loc[docs["source"] != ref, "n_chars"].to_numpy()
    allv = np.concatenate([x, y])
    order = np.argsort(allv, kind="mergesort")
    ranks = np.empty(len(allv), dtype=np.float64)
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    r1 = float(ranks[: len(x)].sum())
    n1, n2 = len(x), len(y)
    u = r1 - n1 * (n1 + 1) / 2.0
    ties = Counter(allv.tolist())
    tie_term = sum(t**3 - t for t in ties.values())
    nn = n1 + n2
    var = n1 * n2 / 12.0 * ((nn + 1) - tie_term / (nn * (nn - 1)))
    z = (u - n1 * n2 / 2.0) / math.sqrt(var)
    row = registry.QUERIES["mann_whitney_u"](spark, sf_small).collect()[0]
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert abs(row["u_minus_mean"] - (u - n1 * n2 / 2.0)) < 1e-9
    assert abs(row["z_stat"] - z) < 1e-9


def test_control_chart_matches_pandas_replay(spark, sf_small):
    import math

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.profiling_ext import _SPC_DAY_NS

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    ev = ev.assign(
        tns=ev["ts"].astype("datetime64[ns]").astype("int64")
    )
    ev = ev.assign(day=ev["tns"] // _SPC_DAY_NS)
    got = {
        (r["event_type"], r["day"]): r
        for r in registry.QUERIES["daily_count_control_chart"](
            spark, sf_small
        ).collect()
    }
    for et, grp in ev.groupby("event_type"):
        counts = grp.groupby("day").size()
        n, s, q = len(counts), int(counts.sum()), int((counts**2).sum())
        center = s / n
        sd = math.sqrt((n * q - s * s) / (n * (n - 1)))
        for day, c in counts.items():
            r = got[(et, day)]
            assert r["n_events"] == int(c)
            assert abs(r["center"] - center) < 1e-9
            assert abs(r["ucl"] - (center + 3 * sd)) < 1e-9
            assert r["out_of_control"] == (
                1 if (c > center + 3 * sd or c < center - 3 * sd) else 0
            )
    assert len(got) == len(ev.groupby(["event_type", "day"]))


def test_readability_matches_python_replay(spark, sf_small):
    import re

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    got = {
        r["doc_id"]: r
        for r in registry.QUERIES["text_readability"](spark, sf_small).collect()
    }
    for _, rec in docs.iterrows():
        text = rec["text"]
        n_words = len(text.strip().split())
        n_sent = len([s for s in re.split(r"[.!?]+", text) if s.strip()])
        n_syll = len(re.findall(r"[aeiouy]+", text.lower()))
        r = got[rec["doc_id"]]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (
            n_words,
            n_sent,
            n_syll,
        )
        if n_sent and n_words:
            expected = 206.835 - 1.015 * n_words / n_sent - 84.6 * n_syll / n_words
            assert abs(r["flesch"] - expected) < 1e-3
        else:
            assert r["flesch"] is None


def test_offdiag_mass_matches_numpy(spark, sf_small):
    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import (
        _FXP_SCALE,
        DIM,
    )

    registry.load_all()
    emb = _load_pdf(sf_small, "embeddings")
    X = np.array(
        [np.asarray(e, dtype=np.float32) for e in emb["embedding"]],
        dtype=np.float64,
    )
    mu = np.round(X * _FXP_SCALE).sum(axis=0) / (len(X) * _FXP_SCALE)
    Q = np.round((X - mu) * _FXP_SCALE)
    S = Q.T @ Q  # integer-valued covariance numerators
    diag = float(np.abs(np.diag(S)).sum() / _FXP_SCALE**2)
    off = float(
        (np.abs(S).sum() - np.abs(np.diag(S)).sum()) / _FXP_SCALE**2
    )
    row = registry.QUERIES["emb_covariance_offdiag_mass"](
        spark, sf_small
    ).collect()[0]
    assert row["n_dims"] == DIM
    assert abs(row["diag_mass"] - diag) < 1e-6 * max(1.0, diag)
    assert abs(row["offdiag_mass"] - off) < 1e-6 * max(1.0, off)
    assert abs(row["anisotropy"] - off / (diag * (DIM - 1))) < 1e-9
    assert row["anisotropy"] >= 0.0


def test_reconcile_matches_pandas_replay(spark, sf_small):
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    orders = _load_pdf(sf_small, "orders")
    li = _load_pdf(sf_small, "lineitem")
    import numpy as np

    # engines round() half-away-from-zero; numpy/pandas round half-even —
    # prices are positive so floor(x + 0.5) reproduces the engine exactly
    raw = (
        li["l_extendedprice"] * (1.0 - li["l_discount"]) * (1.0 + li["l_tax"]) * 100
    ).to_numpy()
    li = li.assign(cents=np.floor(raw + 0.5).astype("int64"))
    sums = li.groupby("l_orderkey")["cents"].sum()
    import numpy as _np

    hdr = _np.floor((orders["o_totalprice"] * 100).to_numpy() + 0.5).astype(
        "int64"
    )
    row = registry.QUERIES["dq_order_lineitem_reconcile"](
        spark, sf_small
    ).collect()[0]
    assert row["n_orders"] == len(orders)
    with_li = orders["o_orderkey"].isin(sums.index)
    assert row["n_with_lineitems"] == int(with_li.sum())
    matched = diffsum = maxdiff = 0
    for ok, h in zip(orders["o_orderkey"], hdr):
        if ok in sums.index:
            d = abs(int(h) - int(sums[ok]))
            matched += 1 if d == 0 else 0
            diffsum += d
            maxdiff = max(maxdiff, d)
    assert row["n_exact_match"] == matched
    assert row["total_abs_diff_cents"] == diffsum
    assert row["max_abs_diff_cents"] == maxdiff


def test_spearman_matches_scipy_style(spark, sf_small):
    import numpy as np

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    x = docs["n_chars"].to_numpy()
    y = docs["text"].str.count(" ").to_numpy()

    def avg_ranks(v):
        order = np.argsort(v, kind="mergesort")
        r = np.empty(len(v), dtype=np.float64)
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            r[order[i:j]] = (i + j + 1) / 2.0
            i = j
        return r

    rx, ry = avg_ranks(x), avg_ranks(y)
    expected = float(np.corrcoef(rx, ry)[0, 1])
    row = registry.QUERIES["spearman_rank_corr"](spark, sf_small).collect()[0]
    assert row["n_docs"] == len(x)
    assert abs(row["spearman_rho"] - expected) < 1e-9
    assert -1.0 <= row["spearman_rho"] <= 1.0


def test_position_attribution_conserves_credit(spark, sf_small):
    """Σ credit over channels (incl. 'none') must equal the purchase
    count exactly — every purchase distributes one unit (up to the
    2^-20 credit grid x #touches rounding, bounded tightly)."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    n_purchases = int((ev["event_type"] == "purchase").sum())
    rows = registry.QUERIES["attribution_position_weighted"](
        spark, sf_small
    ).collect()
    total_credit = sum(r["credit"] for r in rows)
    n_pairs = sum(r["n_credits"] for r in rows if r["touch_type"] != "none")
    # grid rounding error ≤ half a grid step per credited pair
    assert abs(total_credit - n_purchases) <= (n_pairs + 1) * 2**-21
    types = {r["touch_type"] for r in rows}
    assert "none" in types and types <= {"click", "view", "none"}
    for r in rows:
        assert r["credit"] >= 0.0


def test_fisher_ratio_matches_numpy(spark, sf_small):
    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import _FXP_SCALE

    registry.load_all()
    emb = _load_pdf(sf_small, "embeddings")
    X = np.round(
        np.array(
            [np.asarray(e, dtype=np.float32) for e in emb["embedding"]],
            dtype=np.float64,
        )
        * _FXP_SCALE
    )
    labels = emb["label"].to_numpy()
    within = between = 0.0
    mu = X.sum(axis=0) / len(X)
    for lab in np.unique(labels):
        sub = X[labels == lab]
        muc = sub.sum(axis=0) / len(sub)
        within += float(((sub - muc) ** 2).sum())
        between += float(len(sub) * ((muc - mu) ** 2).sum())
    row = registry.QUERIES["emb_fisher_ratio"](spark, sf_small).collect()[0]
    within /= _FXP_SCALE**2
    between /= _FXP_SCALE**2
    assert abs(row["within_mass"] - within) < 1e-4 * max(1.0, within)
    assert abs(row["between_mass"] - between) < 1e-4 * max(1.0, between)
    assert row["fisher_ratio"] >= 0.0


def test_v3_is_v2_with_extra_gates(spark, sf_small):
    """v3's kept set must be a subset of v2's per (split, source) cell —
    the added readability/decontam gates only REMOVE documents — and
    with all-permissive extra gates v3 degenerates to exactly v2 minus
    the decontam-flagged docs."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    v2 = {
        (r["split"], r["source"]): r["n_docs"]
        for r in registry.QUERIES["prep_pipeline_v2"](spark, sf_small).collect()
    }
    v3 = {
        (r["split"], r["source"]): r["n_docs"]
        for r in registry.QUERIES["prep_pipeline_v3"](spark, sf_small).collect()
    }
    assert set(v3) <= set(v2)
    for cell, n in v3.items():
        assert 0 < n <= v2[cell]
    assert sum(v3.values()) < sum(v2.values())  # decontam really bites


def test_roc_auc_matches_sklearn_style_replay(spark, sf_small):
    """Tie-corrected AUC must equal the trapezoid-free rank formulation
    computed independently in numpy on the engine's own (score, label)
    pairs — the rank machinery, not the label construction, is under
    test here (the labels themselves are oracle-checked elsewhere)."""
    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.evaluation_ext import _scored

    registry.load_all()
    pdf = _scored(spark, sf_small).toPandas()
    x = pdf["x"].to_numpy(dtype=np.float64)
    y = pdf["y"].to_numpy()
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=np.float64)
    sv = x[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    n1 = int(y.sum())
    n0 = len(y) - n1
    r1 = float(ranks[y == 1].sum())
    auc = (r1 - n1 * (n1 + 1) / 2.0) / (n1 * n0)
    row = registry.QUERIES["roc_auc_exact"](spark, sf_small).collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (n1, n0)
    assert abs(row["auc"] - auc) < 1e-12
    assert 0.0 <= row["auc"] <= 1.0


def test_average_precision_matches_python_replay(spark, sf_small):
    """AP under the pinned (score DESC, doc_id ASC) order must equal the
    direct per-positive precision@k mean; it must also dominate the
    positive prevalence (AP >= n_pos/n for any better-than-nothing
    ranking is NOT guaranteed, but AP of a constant ranker equals
    prevalence — so we check range + exact replay instead)."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.evaluation_ext import _scored

    registry.load_all()
    pdf = _scored(spark, sf_small).toPandas()
    ordered = pdf.sort_values(
        ["x", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    cum = 0
    terms = []
    for k, yv in enumerate(ordered["y"], start=1):
        if yv == 1:
            cum += 1
            terms.append(cum / k)
    n_pos = cum
    ap = sum(sorted_terms for sorted_terms in terms) / n_pos
    row = registry.QUERIES["pr_auc_average_precision"](
        spark, sf_small
    ).collect()[0]
    assert row["n_ranked"] == len(ordered)
    assert row["n_pos"] == n_pos
    assert abs(row["average_precision"] - ap) < 1e-9
    assert 0.0 < row["average_precision"] <= 1.0


def test_calibration_bins_match_pandas_replay(spark, sf_small):
    """Per-bin n / keep-rate / mean score / Brier contribution must match
    a pandas groupby on the engine's own scored pairs; bins must
    partition the corpus and the weighted bin_brier must reassemble the
    corpus Brier score."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.evaluation_ext import (
        _BIN_WIDTH,
        _Q_SCALE,
        N_CALIB_BINS,
        _scored,
    )

    registry.load_all()
    pdf = _scored(spark, sf_small).toPandas()
    pdf = pdf.assign(z=1 - pdf["y"])
    pdf = pdf.assign(
        bin=(pdf["x"] // _BIN_WIDTH).clip(0, N_CALIB_BINS - 1)
    )
    got = {
        r["bin"]: r
        for r in registry.QUERIES["score_calibration_bins"](
            spark, sf_small
        ).collect()
    }
    assert sum(r["n_docs"] for r in got.values()) == len(pdf)
    brier_total = 0.0
    for bin_id, grp in pdf.groupby("bin"):
        r = got[bin_id]
        assert r["n_docs"] == len(grp)
        assert r["n_kept"] == int(grp["z"].sum())
        assert abs(r["mean_score"] - grp["x"].mean() / _Q_SCALE) < 1e-9
        assert abs(r["frac_kept"] - grp["z"].mean()) < 1e-12
        err = (grp["x"] - grp["z"] * _Q_SCALE).to_numpy(dtype="int64")
        assert abs(
            r["bin_brier"] - (err * err).sum() / (len(grp) * _Q_SCALE**2)
        ) < 1e-12
        brier_total += r["bin_brier"] * r["n_docs"]
    full_err = (pdf["x"] - pdf["z"] * _Q_SCALE).to_numpy(dtype="int64")
    assert abs(
        brier_total / len(pdf)
        - (full_err * full_err).sum() / (len(pdf) * _Q_SCALE**2)
    ) < 1e-12


def test_anova_f_matches_numpy_replay(spark, sf_small):
    """F statistic must equal the textbook SSB/SSW decomposition computed
    in float64 numpy on the raw table, and the two sums of squares must
    reassemble the total sum of squares exactly."""
    import numpy as np

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    groups = [
        g["n_chars"].to_numpy(dtype=np.float64)
        for _, g in docs.groupby("source")
    ]
    allv = docs["n_chars"].to_numpy(dtype=np.float64)
    grand = allv.mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(allv)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    row = registry.QUERIES["anova_oneway_f"](spark, sf_small).collect()[0]
    assert (row["k_groups"], row["n_total"]) == (k, n)
    assert abs(row["ss_between"] - ssb) < 1e-4 * max(1.0, abs(ssb))
    assert abs(row["ss_within"] - ssw) < 1e-4 * max(1.0, abs(ssw))
    assert abs(row["f_stat"] - f) < 1e-6 * max(1.0, abs(f))
    # decomposition identity: SSB + SSW == total SS
    sst = ((allv - grand) ** 2).sum()
    assert abs((row["ss_between"] + row["ss_within"]) - sst) < 1e-4 * sst


def test_kruskal_wallis_matches_scipy_formula(spark, sf_small):
    """H and its tie-corrected form must equal the scipy.stats.kruskal
    formulation (average ranks, Σ(t³−t) correction) replayed in numpy."""
    import numpy as np

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    allv = docs["n_chars"].to_numpy()
    order = np.argsort(allv, kind="mergesort")
    ranks = np.empty(len(allv), dtype=np.float64)
    sv = allv[order]
    i = 0
    tie_term = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        t = j - i
        tie_term += t**3 - t
        i = j
    docs = docs.assign(rank=ranks)
    n = len(docs)
    sum_r2n = sum(
        g["rank"].sum() ** 2 / len(g) for _, g in docs.groupby("source")
    )
    h = 12.0 * sum_r2n / (n * (n + 1)) - 3.0 * (n + 1)
    c = 1.0 - tie_term / (n**3 - n)
    row = registry.QUERIES["kruskal_wallis"](spark, sf_small).collect()[0]
    assert row["n_total"] == n
    assert abs(row["h_stat"] - h) < 1e-8 * max(1.0, abs(h))
    assert abs(row["h_adj"] - h / c) < 1e-8 * max(1.0, abs(h / c))
    # tie correction can only GROW the statistic (C <= 1)
    assert row["h_adj"] >= row["h_stat"]


def test_poisson_bootstrap_matches_hashlib_replay(spark, sf_small):
    """Replicate weights must reproduce from hashlib md5 + the shared
    Poisson(1) thresholds; the CI bounds must be the 2nd/31st order
    statistics of the replayed replicate means and must bracket them."""
    import hashlib

    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.scale_ext import (
        _BOOT_CUM,
        BOOT_REPLICATES,
    )

    registry.load_all()
    orders = _load_pdf(sf_small, "orders")
    x = np.round(orders["o_totalprice"].to_numpy() * 100).astype("int64")
    keys = orders["o_orderkey"].astype("int64").tolist()
    means = []
    for r in range(BOOT_REPLICATES):
        sw = swx = 0
        for k, xi in zip(keys, x):
            off = 12 * (r % 2)
            hexd = hashlib.md5(f"{k}:{r // 2}".encode()).hexdigest()
            h = int(hexd[off : off + 12], 16)
            u = h / float(1 << 48)
            w = 9
            for kk, c in enumerate(_BOOT_CUM):
                if u < c:
                    w = kk
                    break
            sw += w
            swx += w * int(xi)
        means.append(swx / sw)
    means.sort()
    row = registry.QUERIES["poisson_bootstrap_ci"](spark, sf_small).collect()[0]
    assert row["n_orders"] == len(orders)
    assert row["n_replicates"] == BOOT_REPLICATES
    assert abs(row["mean_cents"] - x.sum() / len(x)) < 1e-6
    assert abs(row["ci_lo_cents"] - means[1]) < 1e-9
    assert abs(row["ci_hi_cents"] - means[-2]) < 1e-9
    # the interval must bracket the full-sample mean at this n
    assert row["ci_lo_cents"] < row["mean_cents"] < row["ci_hi_cents"]


def test_ndcg_matches_python_replay_and_bounds(spark, sf_small):
    """NDCG must equal a direct python computation over the two composed
    lists (reversed-truth-rank gains, dyadic discount), sit in (0, 1],
    and hit exactly 1.0 only when the approximate list IS the truth
    list; n_hit must agree with set overlap."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import TOPK

    registry.load_all()

    def ranked_lists(name):
        rows = registry.QUERIES[name](spark, sf_small).collect()
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append(
                (-r["cosine"], r["vec_id"])
            )
        return {
            q: [v for _, v in sorted(lst)] for q, lst in out.items()
        }

    truth = ranked_lists("sim_cosine_topk_bruteforce")
    appr = ranked_lists("sim_cosine_topk_ivf")
    got = {
        r["query_id"]: r
        for r in registry.QUERIES["sim_ndcg_ivf"](spark, sf_small).collect()
    }
    assert set(got) == set(truth)
    for q, tlist in truth.items():
        rank_t = {v: i + 1 for i, v in enumerate(tlist)}
        alist = appr[q]
        dcg = sum(
            (TOPK - rank_t[v] + 1) / (1 << i)
            for i, v in enumerate(alist)
            if v in rank_t
        )
        idcg = sum((TOPK - i) / (1 << i) for i in range(len(tlist)))
        r = got[q]
        assert r["n_hit"] == len(set(alist) & set(tlist))
        assert r["dcg"] == dcg  # dyadic sums: bit-exact, no tolerance
        assert r["idcg"] == idcg
        assert abs(r["ndcg"] - dcg / idcg) < 1e-15
        assert 0.0 <= r["ndcg"] <= 1.0
        assert (r["ndcg"] == 1.0) == (alist == tlist)


def test_hubness_matches_numpy_replay(spark, sf_small):
    """k-occurrence counts, moments, and Fisher skewness must reproduce
    from a from-scratch numpy reimplementation of the LCG hyperplane
    bucketing + in-bucket kNN."""
    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import (
        _LCG_A,
        _LCG_C,
        _LCG_M,
        _LCG_SHIFT,
        DIM,
        HUB_K,
        LSH_PLANES,
    )

    registry.load_all()
    emb = _load_pdf(sf_small, "embeddings")
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    # LCG hyperplane buckets (coef over flattened (plane, dim) index)
    k_idx = np.arange(LSH_PLANES * DIM, dtype=np.int64).reshape(
        LSH_PLANES, DIM
    )
    coefs = (_LCG_A * k_idx + _LCG_C) % _LCG_M - _LCG_SHIFT
    proj = vecs @ coefs.T
    buckets = ((proj > 0) * (1 << np.arange(LSH_PLANES))).sum(axis=1)
    nrm = np.sqrt((vecs * vecs).sum(axis=1))
    occ = {int(v): 0 for v in ids}
    for i in range(len(ids)):
        mask = (buckets == buckets[i]) & (ids != ids[i])
        cand = np.where(mask)[0]
        cos = vecs[cand] @ vecs[i] / (nrm[cand] * nrm[i])
        # away-from-zero half-up 4dp round (Spark/DuckDB convention)
        cos = np.sign(cos) * np.floor(np.abs(cos) * 1e4 + 0.5) / 1e4
        order = sorted(zip(-cos, ids[cand]))[:HUB_K]
        for _, b in order:
            occ[int(b)] += 1
    c = np.array(sorted(occ.values()), dtype=np.int64)
    n = len(c)
    mean = c.sum() / n
    m2 = ((c - mean) ** 2).sum() / n
    m3 = ((c - mean) ** 3).sum() / n
    row = registry.QUERIES["emb_hubness"](spark, sf_small).collect()[0]
    assert row["n_vectors"] == n
    assert row["max_kocc"] == int(c.max())
    assert row["n_isolated"] == int((c == 0).sum())
    assert abs(row["mean_kocc"] - mean) < 1e-12
    assert abs(row["skew_kocc"] - m3 / m2**1.5) < 1e-9


def test_ols_two_feature_matches_numpy_lstsq(spark, sf_small):
    """Cramer-rule betas and R² must match numpy least squares on the
    integer-scaled design matrix."""
    import numpy as np

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    li = _load_pdf(sf_small, "lineitem")
    x1 = np.round(li["l_quantity"].to_numpy()).astype("int64")
    x2 = np.round(li["l_discount"].to_numpy() * 100).astype("int64")
    y = np.round(li["l_extendedprice"].to_numpy() * 100).astype("int64")
    X = np.stack([np.ones_like(x1), x1, x2], axis=1).astype(np.float64)
    beta, *_ = np.linalg.lstsq(X, y.astype(np.float64), rcond=None)
    resid = y - X @ beta
    sst = ((y - y.mean()) ** 2).sum()
    r2 = 1.0 - (resid**2).sum() / sst
    row = registry.QUERIES["ols_two_feature"](spark, sf_small).collect()[0]
    assert row["n_rows"] == len(y)
    for got, exp in zip(
        (row["beta0"], row["beta1"], row["beta2"], row["r2"]),
        (*beta, r2),
    ):
        assert abs(got - exp) < 1e-6 * max(1.0, abs(exp))


def test_bh_fdr_matches_python_replay(spark, sf_small):
    """Per-token chi2 must match the 2x2 shortcut replayed in python from
    raw tokens; p-values must sit within approximation+grid tolerance of
    math.erfc; the BH step-up must reproduce exactly from the engine's
    own p-values (and be monotone: rejections form a rank prefix)."""
    import math
    import re
    from collections import Counter

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.textstats import (
        DRIFT_TOP_TOKENS,
        FDR_ALPHA,
    )

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    ref = docs["source"].min()
    cnt1, cnt2 = Counter(), Counter()
    for _, r in docs.iterrows():
        toks = re.split(r"\s+", r["text"].strip())
        (cnt1 if r["source"] == ref else cnt2).update(toks)
    n1, n2 = sum(cnt1.values()), sum(cnt2.values())
    total = cnt1 + cnt2
    top = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[
        :DRIFT_TOP_TOKENS
    ]
    rows = registry.QUERIES["bh_fdr_token_drift"](spark, sf_small).collect()
    got = {r["token"]: r for r in rows}
    assert set(got) == {t for t, _ in top}
    n = n1 + n2
    for tok, _ in top:
        a, c = cnt1[tok], cnt2[tok]
        cross = a * (n2 - c) - (n1 - a) * c
        chi2 = n * cross * cross / (n1 * n2 * (a + c) * (n - a - c))
        r = got[tok]
        # chi2 is snapped to the 2^-20 grid before output
        assert abs(r["chi2"] - chi2) < 1e-6 + 1e-9 * chi2
        p_true = math.erfc(math.sqrt(chi2 / 2.0))
        assert abs(r["p_value"] - p_true) < 2e-6
    # BH step-up replay on the engine's own (quantized) p-values
    ranked = sorted(rows, key=lambda r: (r["p_value"], r["token"]))
    m = len(ranked)
    k_max = 0
    for i, r in enumerate(ranked, start=1):
        assert r["k_rank"] == i
        if r["p_value"] <= FDR_ALPHA * i / m:
            k_max = i
    for i, r in enumerate(ranked, start=1):
        assert r["rejected"] == (1 if i <= k_max else 0)


def test_kendall_tau_matches_bruteforce_pairs(spark, sf_small):
    """tau-b must equal the O(n^2) definition (concordant - discordant
    over the tie-corrected denominator) computed directly on the banded
    variables, and agree in sign with Spearman on the same data."""
    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.profiling_ext import KENDALL_X_BAND

    registry.load_all()
    # engine's own scored pairs (quality construction is oracle-checked)
    from metas_judiciarias_etl_spark.operators.textstats import text_quality

    q = {
        r["doc_id"]: r["quality"]
        for r in text_quality(spark, sf_small).collect()
        if r["quality"] is not None
    }
    docs = _load_pdf(sf_small, "documents")
    docs = docs[docs["doc_id"].isin(q)]
    x = (docs["n_chars"] // KENDALL_X_BAND).to_numpy()
    y = np.clip(
        np.array([round(q[d] * 1e6) for d in docs["doc_id"]]) // 100000, 0, 9
    )
    n = len(x)
    conc = disc = 0
    for i in range(n):
        dx = x[i + 1 :] - x[i]
        dy = y[i + 1 :] - y[i]
        s = dx * dy
        conc += int((s > 0).sum())
        disc += int((s < 0).sum())
    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in np.bincount(x).tolist())
    n2 = sum(t * (t - 1) // 2 for t in np.bincount(y).tolist())
    tau = (conc - disc) / (np.sqrt(n0 - n1) * np.sqrt(n0 - n2))
    row = registry.QUERIES["kendall_tau_b"](spark, sf_small).collect()[0]
    assert row["n_docs"] == n
    assert (row["conc"], row["disc"]) == (conc, disc)
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert abs(row["tau_b"] - tau) < 1e-12
    rho = registry.QUERIES["spearman_rank_corr"](spark, sf_small).collect()[0][
        "spearman_rho"
    ]
    assert (row["tau_b"] > 0) == (rho > 0)


def test_quantile_normalize_matches_pandas_replay(spark, sf_small):
    """The rank map must reproduce in pandas; within-source order must be
    preserved; every normalized value must come from the pooled support;
    and a source's top document must map to (near) the pooled top."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    rows = registry.QUERIES["score_quantile_normalize"](
        spark, sf_small
    ).collect()
    got = {r["doc_id"]: r for r in rows}
    import pandas as pd

    pdf = pd.DataFrame(
        [(r["doc_id"], r["source"], r["q_orig"]) for r in rows],
        columns=["doc_id", "source", "x"],
    )
    pooled = pdf.sort_values(["x", "doc_id"]).reset_index(drop=True)
    n = len(pooled)
    for src, grp in pdf.groupby("source"):
        g = grp.sort_values(["x", "doc_id"]).reset_index(drop=True)
        n_s = len(g)
        prev = None
        for r_idx, rec in enumerate(g.itertuples(), start=1):
            k = ((2 * r_idx - 1) * n + 2 * n_s - 1) // (2 * n_s)
            expect = int(pooled.iloc[k - 1]["x"])
            r = got[rec.doc_id]
            assert r["q_norm"] == expect
            if prev is not None:
                assert r["q_norm"] >= prev  # order preserved
            prev = r["q_norm"]
        # midpoint-rank convention: the top in-source doc maps to the
        # (1 - 1/(2 n_s)) pooled quantile, never ABOVE the pooled max
        assert prev <= int(pooled.iloc[-1]["x"])
    pooled_support = set(pdf["x"])
    assert all(r["q_norm"] in pooled_support for r in rows)


def test_weighted_sssp_matches_python_bellman_ford(spark, sf_small):
    """Bounded-hop distances must equal a from-scratch python Bellman-Ford
    on the same weighted graph; they must be <= the hop-count distance
    from graph_bfs_distance times the max weight, and >= the hop count
    (weights >= 1)."""
    from collections import defaultdict

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.analytics_ext import (
        _PART_EDGE_CAP,
        SSSP_ROUNDS,
        SSSP_SEED_MOD,
    )

    registry.load_all()
    li = _load_pdf(sf_small, "lineitem")
    li = li[li["l_partkey"] <= _PART_EDGE_CAP]
    from collections import Counter

    cnt = Counter()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"].tolist())
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                if u < v:
                    cnt[(u, v)] += 1
    adj = defaultdict(list)
    nodes = set()
    for (u, v), c in cnt.items():
        w = max(1, 6 - min(c, 5))
        adj[u].append((v, w))
        adj[v].append((u, w))
        nodes.update((u, v))
    INF = float("inf")
    dist = {n: (0 if n % SSSP_SEED_MOD == 0 else INF) for n in nodes}
    for _ in range(SSSP_ROUNDS):
        nxt = dict(dist)
        for u in nodes:
            if dist[u] < INF:
                for v, w in adj[u]:
                    if dist[u] + w < nxt[v]:
                        nxt[v] = dist[u] + w
        dist = nxt
    expect = {n: d for n, d in dist.items() if d < INF}
    got = {
        r["node"]: r["dist"]
        for r in registry.QUERIES["graph_weighted_sssp"](
            spark, sf_small
        ).collect()
    }
    assert got == expect
    # consistency with the unweighted BFS horizon: same reachable set
    bfs_rows = registry.QUERIES["graph_bfs_distance"](spark, sf_small).collect()
    n_reached_bfs = sum(r["n_nodes"] for r in bfs_rows if r["dist"] >= 0)
    assert len(got) == n_reached_bfs


def test_label_noise_matches_replay_and_chance_line(spark, sf_small):
    """Disagreement must reproduce from the hubness replay's kNN graph +
    majority vote; on this RANDOM-label fixture the pooled rate must sit
    near the 1 - 1/n_labels chance line (the honest no-signal reading)."""
    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import (
        _LCG_A,
        _LCG_C,
        _LCG_M,
        _LCG_SHIFT,
        DIM,
        HUB_K,
        LSH_PLANES,
    )

    registry.load_all()
    emb = _load_pdf(sf_small, "embeddings")
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    labels = dict(zip(ids.tolist(), emb["label"].tolist()))
    k_idx = np.arange(LSH_PLANES * DIM, dtype=np.int64).reshape(
        LSH_PLANES, DIM
    )
    coefs = (_LCG_A * k_idx + _LCG_C) % _LCG_M - _LCG_SHIFT
    buckets = ((vecs @ coefs.T > 0) * (1 << np.arange(LSH_PLANES))).sum(axis=1)
    nrm = np.sqrt((vecs * vecs).sum(axis=1))
    from collections import Counter, defaultdict

    per_label = defaultdict(lambda: [0, 0, 0])  # n, scored, disagree
    for i in range(len(ids)):
        own = labels[int(ids[i])]
        per_label[own][0] += 1
        mask = (buckets == buckets[i]) & (ids != ids[i])
        cand = np.where(mask)[0]
        if len(cand) == 0:
            continue
        cos = vecs[cand] @ vecs[i] / (nrm[cand] * nrm[i])
        cos = np.sign(cos) * np.floor(np.abs(cos) * 1e4 + 0.5) / 1e4
        near = sorted(zip(-cos, ids[cand]))[:HUB_K]
        votes = Counter(labels[int(b)] for _, b in near)
        pred = min((-(n), lab) for lab, n in votes.items())[1]
        per_label[own][1] += 1
        per_label[own][2] += int(pred != own)
    got = {
        r["label"]: r
        for r in registry.QUERIES["knn_label_noise"](spark, sf_small).collect()
    }
    assert set(got) == set(per_label)
    for lab, (n, scored, dis) in per_label.items():
        r = got[lab]
        assert (r["n_vectors"], r["n_scored"], r["n_disagree"]) == (
            n,
            scored,
            dis,
        )
    total_dis = sum(v[2] for v in per_label.values())
    total_scored = sum(v[1] for v in per_label.values())
    n_labels = len(per_label)
    chance = 1.0 - 1.0 / n_labels
    assert abs(total_dis / total_scored - chance) < 0.08


def test_fourier_fit_matches_numpy_harmonic_regression(spark, sf_small):
    """The harmonic fit must match numpy lstsq on daily counts with the
    same quantized regressors; r2 must lie in [0, 1]; and the amplitude
    must equal sqrt(b1^2+b2^2) in count units."""
    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.timeseries_ext import (
        _F_COS,
        _F_SIN,
        _FOURIER_DAY_NS,
        _FOURIER_GRID,
    )

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    tns = ev["ts"].astype("datetime64[ns]").astype("int64")
    days = (tns // _FOURIER_DAY_NS).to_numpy()
    import collections

    counts = collections.Counter(days.tolist())
    day_ids = np.array(sorted(counts))
    y = np.array([counts[d] for d in day_ids], dtype=np.float64)
    s = np.array([_F_SIN[d % 7] for d in day_ids], dtype=np.float64)
    c = np.array([_F_COS[d % 7] for d in day_ids], dtype=np.float64)
    X = np.stack([np.ones_like(s), s, c], axis=1)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    sst = ((y - y.mean()) ** 2).sum()
    r2 = 1.0 - (resid**2).sum() / sst
    amp = float(np.hypot(beta[1], beta[2])) * _FOURIER_GRID
    row = registry.QUERIES["seasonal_fourier_fit"](spark, sf_small).collect()[
        0
    ]
    assert row["n_days"] == len(day_ids)
    assert abs(row["mean_level"] - beta[0]) < 1e-6 * max(1.0, abs(beta[0]))
    assert abs(row["weekly_amplitude"] - amp) < 1e-6 * max(1.0, amp)
    assert abs(row["r2"] - r2) < 1e-9
    assert 0.0 <= row["r2"] <= 1.0


def test_transition_gini_matches_pandas_replay(spark, sf_small):
    """Per-state impurity must equal 1 - sum(p^2) from a pandas transition
    replay, and sit in [0, (k-1)/k]."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    ev = _load_pdf(sf_small, "events").sort_values(
        ["user_id", "ts", "event_id"]
    )
    from collections import Counter, defaultdict

    trans = defaultdict(Counter)
    for _, grp in ev.groupby("user_id"):
        types = grp["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            trans[a][b] += 1
    got = {
        r["src"]: r
        for r in registry.QUERIES["markov_transition_gini"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(trans)
    for src, cnt in trans.items():
        n = sum(cnt.values())
        gini = 1.0 - sum(c * c for c in cnt.values()) / (n * n)
        r = got[src]
        assert (r["n_dst"], r["n_total"]) == (len(cnt), n)
        assert abs(r["gini_impurity"] - gini) < 1e-12
        k = len(cnt)
        assert 0.0 <= r["gini_impurity"] <= (k - 1) / k + 1e-12


def test_er_weights_consistency_and_bounds(spark, sf_small):
    """The three feature rows must share one (n_match, n_nonmatch) tally;
    rates must be valid probabilities; matches must be a subset of the
    lossless truth pairs and a superset of the 3x3-banded verified set
    (9x1 banding is strictly looser)."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    rows = registry.QUERIES["er_match_weights"](spark, sf_small).collect()
    assert {r["feature"] for r in rows} == {"lang", "source", "len_band"}
    tallies = {(r["n_match"], r["n_nonmatch"]) for r in rows}
    assert len(tallies) == 1
    n_match, n_nonmatch = tallies.pop()
    assert n_match > 0 and n_nonmatch > 0  # the loose banding must
    # surface BOTH classes, else u-rates are undefined
    for r in rows:
        assert 0 <= r["n_agree_match"] <= n_match
        assert 0 <= r["n_agree_nonmatch"] <= n_nonmatch
        assert abs(r["m_rate"] - r["n_agree_match"] / n_match) < 1e-12
        assert abs(r["u_rate"] - r["n_agree_nonmatch"] / n_nonmatch) < 1e-12
        assert abs(r["lift"] - r["m_rate"] / r["u_rate"]) < 1e-9
    n_truth = registry.QUERIES["dedup_prefix_filter_jaccard"](
        spark, sf_small
    ).count()
    n_lsh33 = registry.QUERIES["dedup_minhash_lsh"](spark, sf_small).count()
    assert n_lsh33 <= n_match <= n_truth


def test_bm25_matches_python_replay(spark, sf_small):
    """Top-k BM25 must equal an independent Python replay of the Robertson
    formula (ratio idf) with the same data-derived 3-term query."""
    import re
    from collections import Counter

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    toks = {
        r.doc_id: re.split(r"\s+", r.text.strip())
        for r in docs.itertuples()
    }
    n_docs = len(toks)
    df_cnt = Counter()
    for ts in toks.values():
        df_cnt.update(set(ts))
    qterms = sorted(df_cnt, key=lambda t: (-df_cnt[t], t))[:3]
    avgdl = sum(len(ts) for ts in toks.values()) / n_docs
    scored = {}
    for did, ts in toks.items():
        tf = Counter(ts)
        contribs = []
        for t in qterms:
            if tf[t] == 0:
                contribs.append(0.0)
                continue
            idf = (float(n_docs - df_cnt[t]) + 0.5) / (float(df_cnt[t]) + 0.5)
            c = (
                idf
                * (float(tf[t]) * 2.2)
                / (float(tf[t]) + 1.2 * (0.25 + 0.75 * (len(ts) / avgdl)))
            )
            contribs.append(c)
        if any(contribs):
            scored[did] = ((contribs[0] + contribs[1]) + contribs[2], contribs)
    want = sorted(scored.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
    got = (
        registry.QUERIES["bm25_topk"](spark, sf_small)
        .orderBy("rn")
        .collect()
    )
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, (sc, contribs)) in zip(got, want):
        assert abs(r["score"] - sc) < 1e-9 * max(1.0, abs(sc))
        for i in (1, 2, 3):
            assert abs(r[f"contrib_{i}"] - contribs[i - 1]) < 1e-9
        assert r["dl"] == len(toks[r["doc_id"]])


def test_er_pattern_precision_consistent_with_weights(spark, sf_small):
    """Pattern tallies must partition the pair pool learned by
    er_match_weights, and each fs_score must equal the product of
    per-feature likelihood ratios recomputed from the weights output."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    weights = {
        r["feature"]: r
        for r in registry.QUERIES["er_match_weights"](
            spark, sf_small
        ).collect()
    }
    pats = registry.QUERIES["er_pattern_precision"](
        spark, sf_small
    ).collect()
    n_m = weights["lang"]["n_match"]
    n_u = weights["lang"]["n_nonmatch"]
    assert sum(p["n_pairs"] for p in pats) == n_m + n_u
    assert sum(p["n_match"] for p in pats) == n_m
    for p in pats:
        fs = 1.0
        for f in ("lang", "source", "len_band"):
            w = weights[f]
            if p[f"ag_{f}"] == 1:
                fs *= (w["n_agree_match"] / n_m) / (w["n_agree_nonmatch"] / n_u)
            else:
                fs *= ((n_m - w["n_agree_match"]) / n_m) / (
                    (n_u - w["n_agree_nonmatch"]) / n_u
                )
        assert abs(p["fs_score"] - fs) < 1e-9 * max(1.0, abs(fs))
        assert 0.0 <= p["match_precision"] <= 1.0


def test_dataset_card_matches_pandas_replay(spark, sf_small):
    """Every card column must equal a pandas replay: volumes, dominant
    language with lexicographic tie-break, corpus-wide dup attribution,
    short-doc share."""
    import hashlib
    import re

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    docs["dl"] = docs.text.map(lambda t: len(re.split(r"\s+", t.strip())))
    docs["h"] = docs.text.map(
        lambda t: hashlib.md5(t.encode()).hexdigest()
    )
    hcounts = docs.h.value_counts()
    got = {
        r["source"]: r
        for r in registry.QUERIES["dataset_card_by_source"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(docs.source.unique())
    for src, grp in docs.groupby("source"):
        r = got[src]
        assert r["n_docs"] == len(grp)
        assert r["n_tokens"] == int(grp.dl.sum())
        assert r["n_chars_total"] == int(grp.n_chars.sum())
        assert r["n_langs"] == grp.lang.nunique()
        lc = grp.lang.value_counts()
        best = sorted(lc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert r["top_lang"] == best[0]
        assert abs(r["top_lang_share"] - best[1] / len(grp)) < 1e-12
        n_dup = int((grp.h.map(hcounts) > 1).sum())
        assert r["n_dup_docs"] == n_dup
        assert abs(r["dup_share"] - n_dup / len(grp)) < 1e-12
        n_short = int((grp.n_chars < 256).sum())
        assert r["n_short"] == n_short
        assert abs(r["short_share"] - n_short / len(grp)) < 1e-12


def test_k_anonymity_audit_monotone_and_replay(spark, sf_small):
    """Risk must be monotone in k, totals must agree across k rows, and
    every tally must equal a pandas replay."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    docs["len_band"] = docs.n_chars // 256
    sizes = docs.groupby(["lang", "source", "len_band"]).size()
    got = {
        r["k"]: r
        for r in registry.QUERIES["k_anonymity_audit"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == {2, 5, 10}
    for k, r in got.items():
        assert r["n_classes"] == len(sizes)
        assert r["n_classes_below"] == int((sizes < k).sum())
        assert r["n_docs_at_risk"] == int(sizes[sizes < k].sum())
        assert abs(r["risk_share"] - r["n_docs_at_risk"] / len(docs)) < 1e-12
    assert (
        got[2]["n_docs_at_risk"]
        <= got[5]["n_docs_at_risk"]
        <= got[10]["n_docs_at_risk"]
    )


def test_vocab_growth_curve_partitions_vocabulary(spark, sf_small):
    """Marginal counts must sum to the distinct-shingle vocabulary, the
    cumulative column must be their prefix sum, and each row must match
    a pandas first-source attribution replay."""
    import re

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")

    def shingles(t):
        ts = re.split(r"\s+", t.strip())
        if len(ts) < 3:
            return {" ".join(ts)}
        return {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}

    first = {}
    for src in sorted(docs.source.unique()):
        for t in docs[docs.source == src].text:
            for sh in shingles(t):
                first.setdefault(sh, src)
    rows = (
        registry.QUERIES["vocab_growth_curve"](spark, sf_small)
        .orderBy("rank")
        .collect()
    )
    assert [r["source"] for r in rows] == sorted(docs.source.unique())
    from collections import Counter

    want = Counter(first.values())
    cum = 0
    for r in rows:
        assert r["n_new_tokens"] == want.get(r["source"], 0)
        cum += r["n_new_tokens"]
        assert r["cum_vocab"] == cum
    assert cum == len(first)


def test_mmr_matches_greedy_replay(spark, sf_small):
    """The MMR selection must equal a Python greedy replay (left-fold dot
    products, engine rounding), and exhibit the greedy invariants: rn=1 is
    the relevance argmax, no repeats, scores weakly decrease."""
    import math

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    emb = _load_pdf(sf_small, "embeddings")
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb.itertuples()}

    def rnd4(x):
        return math.copysign(math.floor(abs(x) * 1e4 + 0.5), x) / 1e4

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def norm(a):
        return math.sqrt(dot(a, a))

    q = vecs[0]
    qn = norm(q)
    rel = {
        vid: rnd4(dot(q, v) / (qn * norm(v)))
        for vid, v in vecs.items()
        if vid != 0
    }
    pool = sorted(rel, key=lambda vid: (-rel[vid], vid))[:64]
    sel = [min(pool, key=lambda vid: (-rel[vid], vid))]
    expect = [(1, sel[0], rel[sel[0]], 0.0, rel[sel[0]])]
    for rn in range(2, 6):
        best = None
        for vid in pool:
            if vid in sel:
                continue
            ms = max(
                rnd4(
                    dot(vecs[vid], vecs[s])
                    / (norm(vecs[vid]) * norm(vecs[s]))
                )
                for s in sel
            )
            score = 0.5 * (rel[vid] - ms)
            key = (-score, vid)
            if best is None or key < best[0]:
                best = (key, vid, ms, score)
        sel.append(best[1])
        expect.append((rn, best[1], rel[best[1]], best[2], best[3]))
    got = (
        registry.QUERIES["sim_mmr_diverse_topk"](spark, sf_small)
        .orderBy("rn")
        .collect()
    )
    assert [
        (r["rn"], r["vec_id"]) for r in got
    ] == [(e[0], e[1]) for e in expect]
    for r, e in zip(got, expect):
        assert abs(r["relevance"] - e[2]) < 1e-12
        assert abs(r["max_sim"] - e[3]) < 1e-12
        assert abs(r["mmr_score"] - e[4]) < 1e-12
    assert len({r["vec_id"] for r in got}) == 5
    scores = [r["mmr_score"] for r in got]
    assert all(a >= b - 1e-12 for a, b in zip(scores[1:], scores[2:]))


def test_silhouette_matches_numpy_replay(spark, sf_small):
    """Per-label mean silhouette and negative counts must equal a numpy
    replay using the same rounding/quantization ladder, and every mean
    must sit in [-1, 1]."""
    import math

    import numpy as np

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    emb = _load_pdf(sf_small, "embeddings")
    ids = emb.vec_id.to_numpy()
    labels = dict(zip(emb.vec_id, emb.label))
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb.itertuples()}

    def rnd(x, s):
        return math.copysign(math.floor(abs(x) * s + 0.5), x)

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    nrm = {v: math.sqrt(dot(vecs[v], vecs[v])) for v in vecs}
    per = {}
    for aid in ids[ids < 256]:
        sums = {}
        for bid in ids:
            if bid == aid:
                continue
            cos = rnd(dot(vecs[aid], vecs[bid]) / (nrm[aid] * nrm[bid]), 1e4) / 1e4
            dq = int(rnd((1.0 - cos) * 10000.0, 1))
            s, n = sums.get(labels[bid], (0, 0))
            sums[labels[bid]] = (s + dq, n + 1)
        mine = labels[aid]
        if mine not in sums or len(sums) < 2:
            continue
        a = sums[mine][0] / (sums[mine][1] * 10000.0)
        b = min(
            s / (n * 10000.0) for lb, (s, n) in sums.items() if lb != mine
        )
        sil = (b - a) / max(a, b)
        sq = int(rnd(sil * 1048576.0, 1))
        tot, cnt, neg = per.get(mine, (0, 0, 0))
        per[mine] = (tot + sq, cnt + 1, neg + (1 if sq < 0 else 0))
    got = {
        r["label"]: r
        for r in registry.QUERIES["emb_silhouette_by_label"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(per)
    for lb, (tot, cnt, neg) in per.items():
        r = got[lb]
        assert r["n_anchors"] == cnt
        assert r["n_negative"] == neg
        assert abs(r["mean_silhouette"] - tot / (cnt * 1048576.0)) < 1e-12
        assert -1.0 - 1e-9 <= r["mean_silhouette"] <= 1.0 + 1e-9


def test_brier_decomposition_identity_and_bounds(spark, sf_small):
    """The 5-term Stephenson identity must close to grid precision, the
    direct Brier must equal the n-weighted mean of the calibration
    table's bin_brier, and each component must respect its bounds."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    r = registry.QUERIES["brier_decomposition"](spark, sf_small).collect()[0]
    ident = (
        r["reliability"]
        - r["resolution"]
        + r["uncertainty"]
        + r["within_bin_var"]
        - r["within_bin_cov"]
    )
    assert abs(r["brier"] - ident) < 1e-4
    assert 0.0 <= r["brier"] <= 1.0
    assert r["reliability"] >= 0.0 and r["resolution"] >= 0.0
    assert 0.0 <= r["uncertainty"] <= 0.25
    assert r["within_bin_var"] >= -1e-9
    assert abs(
        r["uncertainty"] - r["base_rate"] * (1 - r["base_rate"])
    ) < 1e-12
    bins = registry.QUERIES["score_calibration_bins"](
        spark, sf_small
    ).collect()
    n = sum(b["n_docs"] for b in bins)
    brier_from_bins = (
        sum(b["n_docs"] * b["bin_brier"] for b in bins) / n
    )
    assert n == r["n"]
    assert abs(r["brier"] - brier_from_bins) < 1e-9


def test_backoff_score_matches_python_replay(spark, sf_small):
    """Per-source backoff tallies and quantized mean must equal a pure
    Python leave-one-source-out replay."""
    import math
    import re
    from collections import Counter

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    toks = {
        r.Index: (r.source, re.split(r"\s+", r.text.strip()))
        for r in docs.itertuples()
    }
    uni, bi, tri = Counter(), Counter(), Counter()
    uni_s, bi_s, tri_s = Counter(), Counter(), Counter()
    n_all = 0
    n_src = Counter()
    for src, ts in toks.values():
        n_all += len(ts)
        n_src[src] += len(ts)
        for w in ts:
            uni[w] += 1
            uni_s[(src, w)] += 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] += 1
            bi_s[(src, a, b)] += 1
        for a, b, c in zip(ts, ts[1:], ts[2:]):
            tri[(a, b, c)] += 1
            tri_s[(src, a, b, c)] += 1
    per = {}
    for src, ts in toks.values():
        for a, b, c in zip(ts, ts[1:], ts[2:]):
            t_o = tri[(a, b, c)] - tri_s[(src, a, b, c)]
            b12_o = bi[(a, b)] - bi_s[(src, a, b)]
            b23_o = bi[(b, c)] - bi_s[(src, b, c)]
            u2_o = uni[b] - uni_s[(src, b)]
            u3_o = uni[c] - uni_s[(src, c)]
            if t_o > 0:
                lvl, s = 0, t_o / b12_o
            elif b23_o > 0:
                lvl, s = 1, 0.4 * (b23_o / u2_o)
            else:
                lvl, s = 2, 0.4 * (0.4 * (u3_o / (n_all - n_src[src])))
            sq = int(math.copysign(math.floor(abs(s) * 1048576.0 + 0.5), s))
            tot = per.setdefault(src, [0, 0, 0, 0, 0])
            tot[0] += 1
            tot[1 + lvl] += 1
            tot[4] += sq
    got = {
        r["source"]: r
        for r in registry.QUERIES["crosssource_backoff_score"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(per)
    for src, (np_, t0, t1, t2, sq) in per.items():
        r = got[src]
        assert (
            r["n_positions"],
            r["n_tri_hits"],
            r["n_bi_hits"],
            r["n_uni_backoffs"],
        ) == (np_, t0, t1, t2)
        assert abs(r["mean_score"] - sq / (np_ * 1048576.0)) < 1e-12
        assert r["n_tri_hits"] + r["n_bi_hits"] + r["n_uni_backoffs"] == np_


def test_markov_removal_matches_python_replay(spark, sf_small):
    """Removal-effect attribution must equal an exact integer-grid value
    iteration replay, shares must sum to 1, and removing a channel must
    never raise conversion."""
    from collections import Counter, defaultdict

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    ev = _load_pdf(sf_small, "events").sort_values(
        ["user_id", "ts", "event_id"]
    )
    ONE, H, CONV = 1 << 20, 4, "purchase"
    tr = Counter()
    firsts = Counter()
    for _, grp in ev.groupby("user_id"):
        ts = grp["event_type"].tolist()
        firsts[ts[0]] += 1
        for a, b in zip(ts, ts[1:]):
            tr[(a, b)] += 1
    states = sorted({a for a, _ in tr} | {b for _, b in tr})
    outs = defaultdict(int)
    for (a, _), n in tr.items():
        outs[a] += n

    def run(removed):
        v = {s: (ONE if s == CONV else 0) for s in states}
        for _ in range(H):
            nv = {}
            for s in states:
                if s == CONV:
                    nv[s] = ONE
                elif s == removed:
                    nv[s] = 0
                else:
                    sv = sum(
                        n * v[d] for (a, d), n in tr.items() if a == s
                    )
                    nv[s] = (2 * sv + outs[s]) // (2 * outs[s])
            v = nv
        nu = sum(firsts.values())
        sv = sum(firsts[t] * v[t] for t in firsts)
        return (2 * sv + nu) // (2 * nu)

    base_q = run(None)
    got = {
        r["channel"]: r
        for r in registry.QUERIES["attribution_markov_removal"](
            spark, sf_small
        ).collect()
    }
    chans = [s for s in states if s != CONV]
    assert set(got) == set(chans)
    effs = {c: max(base_q - run(c), 0) for c in chans}
    tot = sum(effs.values())
    for c in chans:
        r = got[c]
        assert abs(r["base_conv"] - base_q / ONE) < 1e-12
        assert abs(r["conv_without"] - run(c) / ONE) < 1e-12
        assert r["conv_without"] <= r["base_conv"] + 1e-12
        assert abs(r["removal_effect"] - effs[c] / base_q) < 1e-12
        assert abs(r["attribution_share"] - effs[c] / tot) < 1e-12
    assert abs(sum(r["attribution_share"] for r in got.values()) - 1.0) < 1e-9


def test_cuped_matches_numpy_replay(spark, sf_small):
    """theta, variance reduction, and both effect estimates must match a
    numpy replay on exact cent sums; the adjustment must preserve the
    identity diff_cuped = diff_unadj - theta * (pre-period arm diff)."""
    import numpy as np
    import pandas as pd

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    tns = ev.ts.astype("datetime64[ns]").astype("int64")
    mid = (tns.min() + tns.max()) // 2
    cents = (ev.value * 100.0).round().astype("int64")
    pdf = pd.DataFrame(
        {"user_id": ev.user_id, "pre": tns < mid, "c": cents}
    )
    x = pdf[pdf.pre].groupby("user_id").c.sum()
    y = pdf[~pdf.pre].groupby("user_id").c.sum()
    users = sorted(pdf.user_id.unique())
    X = np.array([x.get(u, 0) for u in users], dtype=float)
    Y = np.array([y.get(u, 0) for u in users], dtype=float)
    arm = np.array([u % 2 for u in users])
    n = len(users)
    cov = n * (X * Y).sum() - X.sum() * Y.sum()
    varx = n * (X * X).sum() - X.sum() ** 2
    vary = n * (Y * Y).sum() - Y.sum() ** 2
    theta = cov / varx
    r = registry.QUERIES["cuped_adjustment"](spark, sf_small).collect()[0]
    assert r["n_treat"] == int((arm == 1).sum())
    assert r["n_control"] == int((arm == 0).sum())
    assert abs(r["theta"] - theta) < 1e-9 * max(1.0, abs(theta))
    assert abs(r["var_reduction"] - cov * cov / (varx * vary)) < 1e-9
    d_un = (Y[arm == 1].mean() - Y[arm == 0].mean()) / 100.0
    d_x = (X[arm == 1].mean() - X[arm == 0].mean()) / 100.0
    assert abs(r["diff_unadjusted"] - d_un) < 1e-6 * max(1.0, abs(d_un))
    assert abs(r["diff_cuped"] - (d_un - theta * d_x)) < 1e-6 * max(
        1.0, abs(d_un)
    )
    assert 0.0 <= r["var_reduction"] <= 1.0


def test_conformal_matches_numpy_replay_and_covers(spark, sf_small):
    """q-hat must equal the exact order-statistic replay per type and
    test coverage must sit near the 1-alpha=0.9 target."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    ev["c"] = (ev.value * 100.0).round().astype("int64")
    ev["fold"] = ev.event_id % 2
    got = {
        r["event_type"]: r
        for r in registry.QUERIES["conformal_interval_calibration"](
            spark, sf_small
        ).collect()
    }
    for t, grp in ev.groupby("event_type"):
        cal = grp[grp.fold == 0].sort_values("event_id")
        tst = grp[grp.fold == 1]
        n, s = len(cal), int(cal.c.sum())
        scores = sorted(
            (abs(n * int(c) - s), eid)
            for c, eid in zip(cal.c, cal.event_id)
        )
        k = (9 * (n + 1) + 9) // 10
        q = scores[k - 1][0]
        r = got[t]
        assert r["n_calib"] == n
        assert r["n_test"] == len(tst)
        assert abs(r["q_hat"] - q / (n * 100.0)) < 1e-9
        n_cov = int(sum(abs(n * int(c) - s) <= q for c in tst.c))
        assert r["n_covered"] == n_cov
        assert abs(r["coverage"] - n_cov / len(tst)) < 1e-12
        assert 0.75 <= r["coverage"] <= 1.0  # near the 0.9 guarantee


def test_conductance_consistent_with_modularity_counts(spark, sf_small):
    """Conductance must be derivable from graph_modularity's exact counts
    (cut = degree_sum - 2*intra over the same composed labels) and sit
    in [0, 1]."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    mod = {
        r["community"]: r
        for r in registry.QUERIES["graph_modularity"](
            spark, sf_small
        ).collect()
    }
    cond = {
        r["community"]: r
        for r in registry.QUERIES["graph_conductance"](
            spark, sf_small
        ).collect()
    }
    assert set(mod) == set(cond)
    two_m = sum(r["degree_sum"] for r in mod.values())
    for c, rm in mod.items():
        rc = cond[c]
        assert rc["n_nodes"] == rm["n_nodes"]
        assert rc["volume"] == rm["degree_sum"]
        cut = rm["degree_sum"] - 2 * rm["intra_edges"]
        assert rc["cut_edges"] == cut
        denom = min(rm["degree_sum"], two_m - rm["degree_sum"])
        if denom:
            assert abs(rc["conductance"] - cut / denom) < 1e-12
            assert 0.0 <= rc["conductance"] <= 1.0 + 1e-12


def test_temperature_mix_matches_numpy_replay(spark, sf_small):
    """Mix shares must equal sqrt-temperature renormalization from exact
    token counts; shares sum to 1; upsampling order is inverse to size."""
    import math
    import re

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    docs["dl"] = docs.text.map(lambda t: len(re.split(r"\s+", t.strip())))
    per = docs.groupby("source").dl.sum()
    t_all = int(per.sum())
    z = sum(sorted(math.sqrt(float(n)) for n in per))
    got = {
        r["source"]: r
        for r in registry.QUERIES["source_temperature_mix"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(per.index)
    for src, n in per.items():
        r = got[src]
        assert r["n_tokens"] == int(n)
        assert abs(r["natural_share"] - n / t_all) < 1e-12
        assert abs(r["mix_share"] - math.sqrt(float(n)) / z) < 1e-9
        assert abs(r["epochs"] - r["mix_share"] / r["natural_share"]) < 1e-9
    assert abs(sum(r["mix_share"] for r in got.values()) - 1.0) < 1e-9
    # sqrt temperature upsamples smaller sources: epochs anti-correlate
    # with size
    sizes = sorted(per.items(), key=lambda kv: kv[1])
    assert got[sizes[0][0]]["epochs"] >= got[sizes[-1][0]]["epochs"]


def test_fd_audit_matches_pandas_and_key_holds(spark, sf_small):
    """Each FD row must match a pandas nunique replay, and the true key
    dependency must audit clean."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    got = {
        r["fd"]: r
        for r in registry.QUERIES["fd_candidate_audit"](
            spark, sf_small
        ).collect()
    }
    cands = (
        ("orders", "o_orderkey", "o_orderdate"),
        ("orders", "o_custkey", "o_orderpriority"),
        ("lineitem", "l_orderkey", "l_shipdate"),
        ("events", "user_id", "event_type"),
    )
    for t, a, b in cands:
        pdf = _load_pdf(sf_small, t)
        k = pdf.groupby(a)[b].nunique()
        r = got[f"{t}.{a} -> {b}"]
        assert r["n_lhs"] == len(k)
        assert r["n_violating_lhs"] == int((k > 1).sum())
        assert r["max_rhs_per_lhs"] == int(k.max())
        assert abs(
            r["violation_share"] - int((k > 1).sum()) / len(k)
        ) < 1e-12
    assert got["orders.o_orderkey -> o_orderdate"]["n_violating_lhs"] == 0


def test_simhash_recall_consistent_with_components(spark, sf_small):
    """The audit's three counts must match its two component queries, and
    the ratios must be consistent."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    r = registry.QUERIES["dedup_simhash_recall"](spark, sf_small).collect()[0]
    truth = {
        (x["a_id"], x["b_id"])
        for x in registry.QUERIES["dedup_prefix_filter_jaccard"](
            spark, sf_small
        ).collect()
    }
    sh = {
        (x["a_id"], x["b_id"])
        for x in registry.QUERIES["dedup_simhash_hamming1"](
            spark, sf_small
        ).collect()
    }
    assert r["n_truth"] == len(truth)
    assert r["n_simhash"] == len(sh)
    assert r["n_hit"] == len(truth & sh)
    if truth:
        assert abs(r["recall"] - len(truth & sh) / len(truth)) < 1e-12
    if sh:
        assert abs(
            r["matched_share"] - len(truth & sh) / len(sh)
        ) < 1e-12


def test_two_phase_rank_equals_pandas_global_sort(spark, sf_small):
    """Two-phase ranks must equal a pandas single-sort global rank at the
    sampled positions, and the sampled positions must cover the range."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    li = _load_pdf(sf_small, "lineitem")
    li["price_c"] = (li.l_extendedprice * 100).round().astype("int64")
    li = li.sort_values(
        ["price_c", "l_orderkey", "l_linenumber"]
    ).reset_index(drop=True)
    li["rnk"] = li.index + 1
    want = li[(li.rnk % 1000 == 0) | (li.rnk <= 5)]
    got = (
        registry.QUERIES["global_rank_two_phase"](spark, sf_small)
        .orderBy("rnk")
        .collect()
    )
    assert len(got) == len(want)
    for r, w in zip(got, want.itertuples()):
        assert (
            r["rnk"],
            r["l_orderkey"],
            r["l_linenumber"],
            r["price_c"],
        ) == (w.rnk, w.l_orderkey, w.l_linenumber, w.price_c)
    assert got[-1]["rnk"] >= len(li) - 1000  # sample spans the full range


def test_f1_threshold_is_argmax_of_python_sweep(spark, sf_small):
    """The reported threshold must maximize F1 over an exhaustive Python
    sweep of the same scored relation, with the same tie-break."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    from metas_judiciarias_etl_spark.plans.evaluation_ext import _scored

    rows = _scored(spark, sf_small).collect()
    xs = sorted({r["x"] for r in rows})
    p_all = sum(r["y"] for r in rows)
    best = None
    for v in xs:
        pred = [r for r in rows if r["x"] >= v]
        tp = sum(r["y"] for r in pred)
        f1 = 2 * tp / (len(pred) + p_all) if (len(pred) + p_all) else 0.0
        key = (-f1, v)
        if best is None or key < best[0]:
            best = (key, v, len(pred), tp, f1)
    r = registry.QUERIES["f1_optimal_threshold"](
        spark, sf_small
    ).collect()[0]
    assert r["threshold_x"] == best[1]
    assert r["pred_pos"] == best[2]
    assert r["tp"] == best[3]
    assert abs(r["f1"] - best[4]) < 1e-12
    assert abs(
        r["f1"]
        - 2
        / (1 / r["precision_at"] + 1 / r["recall_at"])
    ) < 1e-9  # harmonic-mean identity


def test_did_and_mde_match_numpy_replays(spark, sf_small):
    """DiD cells and the MDE must equal numpy replays on exact cents."""
    import math

    import numpy as np

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    tns = ev.ts.astype("datetime64[ns]").astype("int64")
    mid = (tns.min() + tns.max()) // 2
    cents = (ev.value * 100.0).round().astype("int64")
    arm = (ev.user_id % 2).to_numpy()
    post = (tns >= mid).to_numpy()

    def cell_mean(a, p):
        sel = (arm == a) & (post == p)
        return cents[sel].sum() / sel.sum()

    r = registry.QUERIES["diff_in_diff"](spark, sf_small).collect()[0]
    td = (cell_mean(1, True) - cell_mean(1, False)) / 100.0
    cd = (cell_mean(0, True) - cell_mean(0, False)) / 100.0
    assert abs(r["treat_delta"] - td) < 1e-9
    assert abs(r["control_delta"] - cd) < 1e-9
    assert abs(r["did_estimate"] - (td - cd)) < 1e-9
    assert r["n_events"] == len(ev)

    per = (
        ev.assign(c=cents)
        .groupby("user_id")
        .c.sum()
    )
    users = per.index.to_numpy()
    y = per.to_numpy(dtype=float)
    a = users % 2
    v1 = np.var(y[a == 1], ddof=1)
    v0 = np.var(y[a == 0], ddof=1)
    se = math.sqrt(v1 / (a == 1).sum() + v0 / (a == 0).sum()) / 100.0
    r2 = registry.QUERIES["ab_test_power_mde"](spark, sf_small).collect()[0]
    assert r2["n_treat"] == int((a == 1).sum())
    assert r2["n_control"] == int((a == 0).sum())
    assert abs(r2["se_diff"] - se) < 1e-9 * max(1.0, se)
    assert abs(
        r2["mde_abs"] - (1.959963984540054 + 0.8416212335729143) * se
    ) < 1e-9 * max(1.0, se)
    assert r2["mde_abs"] > r2["se_diff"] > 0


def test_sampled_sum_matches_replay_and_ci_prices_error(spark, sf_small):
    """Estimate/CI must equal a replay with the same hash sample; the
    realized error must be within ~3 design-based standard errors."""
    import math

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.functions.hashing import HASH_HEX_LEN
    import hashlib

    registry.load_all()

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:HASH_HEX_LEN], 16)

    li = _load_pdf(sf_small, "lineitem")
    li["c"] = (li.l_extendedprice * 100).round().astype("int64")
    per = li.groupby("l_orderkey").c.sum()
    total = int(per.sum())
    picked = [int(y) for k, y in per.items() if h48(str(k)) % 10 == 0]
    sy, syy = sum(picked), sum(y * y for y in picked)
    r = registry.QUERIES["sampled_sum_estimate"](
        spark, sf_small
    ).collect()[0]
    assert r["n_orders"] == len(per)
    assert r["n_s"] == len(picked)
    assert abs(r["exact_total"] - total / 100.0) < 1e-6
    assert abs(r["est_total"] - sy * 10 / 100.0) < 1e-6
    ci = 1.959963984540054 * math.sqrt(90.0 * float(syy)) / 100.0
    assert abs(r["ci_half"] - ci) < 1e-6 * max(1.0, ci)
    err_abs = abs(r["est_total"] - r["exact_total"])
    assert err_abs <= 1.6 * r["ci_half"]  # within ~3 design-based SEs


def test_lang_agreement_ari_matches_exact_replay(spark, sf_small):
    """ARI must equal an exact-rational Python replay of the textbook
    formula from the same confusion cells, and sit in [-1, 1]."""
    from fractions import Fraction

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    cells = {
        (r["lang_label"], r["lang_pred"]): r["n_docs"]
        for r in registry.QUERIES["text_lang_confusion"](
            spark, sf_small
        ).collect()
    }
    n = sum(cells.values())
    c2 = lambda x: x * (x - 1) // 2  # noqa: E731
    s_ij = sum(c2(v) for v in cells.values())
    ai: dict[str, int] = {}
    bj: dict[str, int] = {}
    for (u, v), c in cells.items():
        ai[u] = ai.get(u, 0) + c
        bj[v] = bj.get(v, 0) + c
    s_a = sum(c2(x) for x in ai.values())
    s_b = sum(c2(x) for x in bj.values())
    C = c2(n)
    exp = Fraction(s_ij) - Fraction(s_a * s_b, C)
    exp /= Fraction(s_a + s_b, 2) - Fraction(s_a * s_b, C)
    r = registry.QUERIES["lang_agreement_ari"](spark, sf_small).collect()[0]
    assert (r["n_docs"], r["s_ij"], r["s_a"], r["s_b"]) == (n, s_ij, s_a, s_b)
    assert abs(r["ari"] - float(exp)) < 1e-12
    assert -1.0 <= r["ari"] <= 1.0


def test_lang_agreement_nmi_identities(spark, sf_small):
    """NMI entropies must satisfy the information identities: each H in
    [0, ln(cells)], max(H_u, H_v) <= H_joint <= H_u + H_v (=> MI >= 0),
    and nmi = mi / mean(H) recomputed from the unrounded Python fold."""
    import math

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    r = registry.QUERIES["lang_agreement_nmi"](spark, sf_small).collect()[0]
    assert 0.0 <= r["h_true"] and 0.0 <= r["h_pred"]
    assert max(r["h_true"], r["h_pred"]) <= r["h_joint"] + 1e-6
    assert r["h_joint"] <= r["h_true"] + r["h_pred"] + 1e-6
    assert r["mutual_info"] >= -1e-6
    assert -1e-6 <= r["nmi"] <= 1.0 + 1e-6
    # replay the sorted fold exactly from the confusion cells
    cells = sorted(
        (r2["lang_label"], r2["lang_pred"], r2["n_docs"])
        for r2 in registry.QUERIES["text_lang_confusion"](
            spark, sf_small
        ).collect()
    )
    n = sum(c for _, _, c in cells)

    def h(terms):
        acc = 0.0
        for c in terms:
            acc += -(c / n) * math.log(c / n)
        return acc

    h_uv = h([c for _, _, c in cells])
    au: dict[str, int] = {}
    bv: dict[str, int] = {}
    for u, v, c in cells:
        au[u] = au.get(u, 0) + c
        bv[v] = bv.get(v, 0) + c
    h_u = h([au[k] for k in sorted(au)])
    h_v = h([bv[k] for k in sorted(bv)])
    assert abs(r["h_joint"] - round(h_uv, 6)) < 1e-9
    assert abs(r["mutual_info"] - round(h_u + h_v - h_uv, 6)) < 1e-9
    assert (
        abs(r["nmi"] - round((h_u + h_v - h_uv) / ((h_u + h_v) / 2), 6))
        < 1e-9
    )


def test_l_diversity_matches_pandas_and_is_monotone(spark, sf_small):
    """Class tallies must match a pandas nunique replay per threshold, and
    at-risk counts must be non-decreasing in l (a class below l=2 is
    below l=3 too)."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.profiling_ext import (
        KANON_LEN_BAND,
        LDIV_LS,
    )

    registry.load_all()
    got = {
        r["l"]: r
        for r in registry.QUERIES["l_diversity_audit"](
            spark, sf_small
        ).collect()
    }
    pdf = _load_pdf(sf_small, "documents")
    pdf = pdf.assign(len_band=pdf["n_chars"] // KANON_LEN_BAND)
    g = pdf.groupby(["source", "len_band"])["lang"].agg(["nunique", "size"])
    for l_thr in LDIV_LS:
        below = g[g["nunique"] < l_thr]
        r = got[l_thr]
        assert r["n_classes"] == len(g)
        assert r["n_classes_below"] == len(below)
        assert r["n_docs_at_risk"] == int(below["size"].sum())
        assert abs(
            r["risk_share"] - int(below["size"].sum()) / int(g["size"].sum())
        ) < 1e-12
    ls = sorted(LDIV_LS)
    for lo, hi in zip(ls, ls[1:]):
        assert got[lo]["n_classes_below"] <= got[hi]["n_classes_below"]
        assert got[lo]["n_docs_at_risk"] <= got[hi]["n_docs_at_risk"]


def test_sim_mrr_grid_consistency(spark, sf_small):
    """One row per query; ranks within [0, TOPK]; the reciprocal is the
    exact 2520-grid integer (0 sentinel on a miss); and the top-1 hit
    must agree with the NDCG audit's per-query hit set."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import (
        MRR_SCALE,
        N_QUERIES,
        TOPK,
    )

    registry.load_all()
    rows = registry.QUERIES["sim_mrr_ivf"](spark, sf_small).collect()
    assert len(rows) == N_QUERIES
    assert len({r["query_id"] for r in rows}) == N_QUERIES
    for r in rows:
        assert 0 <= r["approx_rank"] <= TOPK
        if r["approx_rank"] == 0:
            assert r["rr_x2520"] == 0
        else:
            assert MRR_SCALE % r["approx_rank"] == 0
            assert r["rr_x2520"] == MRR_SCALE // r["approx_rank"]


def test_psi_drift_matches_python_replay(spark, sf_small):
    """Per-source PSI must match an exact Python replay of the smoothed
    formula from pandas bin counts, and PSI must be non-negative."""
    import math

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.profiling_ext import (
        PSI_BIN_CHARS,
        PSI_N_BINS,
    )

    registry.load_all()
    got = {
        r["source"]: r
        for r in registry.QUERIES["score_psi_drift"](spark, sf_small).collect()
    }
    pdf = _load_pdf(sf_small, "documents")
    pdf = pdf.assign(
        b=(pdf["n_chars"] // PSI_BIN_CHARS).clip(upper=PSI_N_BINS - 1)
    )
    n_all = len(pdf)
    pooled = pdf.groupby("b").size()
    for src, sub in pdf.groupby("source"):
        n_src = len(sub)
        cnt = sub.groupby("b").size()
        psi = 0.0
        for b in range(PSI_N_BINS):
            p = (int(cnt.get(b, 0)) + 1) / (n_src + PSI_N_BINS)
            q = (int(pooled.get(b, 0)) + 1) / (n_all + PSI_N_BINS)
            psi += (p - q) * math.log(p / q)
        r = got[src]
        assert r["n_docs"] == n_src
        assert abs(r["psi"] - round(psi, 6)) < 1e-9
        assert r["psi"] >= -1e-6  # PSI is a symmetrized KL: non-negative


def test_js_divergence_bounds_and_replay(spark, sf_small):
    """JSD must match a Python replay and obey 0 <= jsd <= ln 2."""
    import math

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    r = registry.QUERIES["dist_js_divergence"](spark, sf_small).collect()[0]
    pdf = _load_pdf(sf_small, "events")
    a = pdf[pdf["user_id"] % 2 == 0].groupby("event_type").size()
    b = pdf[pdf["user_id"] % 2 == 1].groupby("event_type").size()
    types = sorted(set(a.index) | set(b.index))
    n_a, n_b = int(a.sum()), int(b.sum())
    jsd = 0.0
    for t in types:
        p = int(a.get(t, 0)) / n_a
        q = int(b.get(t, 0)) / n_b
        if p > 0:
            jsd += 0.5 * p * math.log(2 * p / (p + q))
        if q > 0:
            jsd += 0.5 * q * math.log(2 * q / (p + q))
    assert (r["n_a"], r["n_b"], r["n_types"]) == (n_a, n_b, len(types))
    assert abs(r["jsd"] - round(jsd, 6)) < 1e-9
    assert -1e-6 <= r["jsd"] <= math.log(2) + 1e-6


def test_repeated_substrings_matches_bruteforce(spark, sf_small):
    """Window tallies must match a brute-force Python window scan, and a
    doc with a >= W-char verbatim span shared with another doc must show
    n_shared_windows > 0."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.dedup import SUBSTR_W

    registry.load_all()
    got = {
        r["doc_id"]: r
        for r in registry.QUERIES["dedup_repeated_substrings"](
            spark, sf_small
        ).collect()
    }
    pdf = _load_pdf(sf_small, "documents")
    wins: dict[int, set[str]] = {}
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        n = max(len(text) - SUBSTR_W + 1, 1)
        wins[int(doc_id)] = {text[i : i + SUBSTR_W] for i in range(n)}
    counts: dict[str, int] = {}
    for ws in wins.values():
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    any_shared = False
    for doc_id, ws in wins.items():
        shared = sum(1 for w in ws if counts[w] > 1)
        r = got[doc_id]
        assert r["n_windows"] == len(ws)
        assert r["n_shared_windows"] == shared
        assert abs(r["shared_share"] - shared / len(ws)) < 1e-12
        any_shared = any_shared or shared > 0
    assert any_shared  # the fixture contains near-dups with verbatim spans


def test_rbo_matches_textbook_prefix_formula(spark, sf_small):
    """The suffix-weight integer form must equal the textbook truncated
    RBO sum (1-p) Σ p^(d-1)·ov_d/d computed over explicit prefix
    intersections in exact rational arithmetic."""
    from fractions import Fraction

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import TOPK

    registry.load_all()

    def ranking(name):
        rows = registry.QUERIES[name](spark, sf_small).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(
                (-r["cosine"], r["vec_id"])
            )
        return {
            q: [v for _, v in sorted(lst)] for q, lst in by_q.items()
        }

    la, lb = ranking("sim_cosine_topk_lsh"), ranking("sim_cosine_topk_ivf")
    got = {
        r["query_id"]: r
        for r in registry.QUERIES["sim_rbo_overlap"](spark, sf_small).collect()
    }
    assert set(got) == set(la) | set(lb)
    # identical lists give ov_d = d, so truncated RBO tops out at 1 - 2^-K
    max_rbo = Fraction(2**TOPK - 1, 2**TOPK)
    for q in got:
        a, b = la.get(q, []), lb.get(q, [])
        rbo = sum(
            Fraction(len(set(a[:d]) & set(b[:d])), d * 2**d)
            for d in range(1, TOPK + 1)
        )
        r = got[q]
        assert r["n_matched"] == len(set(a) & set(b))
        assert abs(r["rbo"] - float(rbo)) < 1e-12
        assert abs(r["rbo_norm"] - float(rbo / max_rbo)) < 1e-12
        assert 0.0 <= r["rbo_norm"] <= 1.0 + 1e-12


def test_attribution_shapley_equal_split_replay(spark, sf_small):
    """Shapley credit must equal the closed-form equal split over each
    purchase's distinct-channel lookback set (unanimity decomposition),
    and total credit must conserve the purchase count EXACTLY (1/12
    grid, no rounding)."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.sessions_ext import (
        ATTR_LOOKBACK_US,
    )

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    ev = ev.assign(
        ts_us=ev["ts"].astype("datetime64[ns]").astype("int64") // 1000
    )
    p = ev[ev["event_type"] == "purchase"]
    t = ev[ev["event_type"] != "purchase"]
    by_user = {u: sub for u, sub in t.groupby("user_id")}
    n_credits = {}
    credit24 = {}  # credit on the 1/12 grid x 2 to stay integer-safe
    n_none = 0
    for _, pr in p.iterrows():
        sub = by_user.get(pr["user_id"])
        chans = set()
        if sub is not None:
            qual = (
                (sub["ts_us"] < pr["ts_us"])
                | (
                    (sub["ts_us"] == pr["ts_us"])
                    & (sub["event_id"] < pr["event_id"])
                )
            ) & (pr["ts_us"] - sub["ts_us"] <= ATTR_LOOKBACK_US)
            chans = set(sub.loc[qual, "event_type"])
        if not chans:
            n_none += 1
            continue
        k = len(chans)
        for c in chans:
            n_credits[c] = n_credits.get(c, 0) + 1
            credit24[c] = credit24.get(c, 0) + 12 // k
    rows = registry.QUERIES["attribution_shapley"](spark, sf_small).collect()
    got = {r["touch_type"]: r for r in rows}
    assert got["none"]["n_credits"] == n_none
    assert got["none"]["credit"] == float(n_none)
    for c in n_credits:
        assert got[c]["n_credits"] == n_credits[c]
        assert abs(got[c]["credit"] - credit24[c] / 12.0) < 1e-12
    total = sum(r["credit"] for r in rows)
    assert abs(total - len(p)) < 1e-9  # exact conservation on the grid


def test_delta_method_matches_python_replay(spark, sf_small):
    """Per-arm ratio, SE, and CI must match an exact-integer-moment
    Python replay of the delta-method formula, with ci_lo < R < ci_hi."""
    import math

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    Z = 1.959963984540054
    ev = _load_pdf(sf_small, "events")
    per = ev.assign(cents=(ev["value"] * 100.0).round().astype("int64"))
    g = per.groupby("user_id").agg(y=("cents", "sum"), x=("cents", "size"))
    got = {
        r["arm"]: r
        for r in registry.QUERIES["delta_method_ratio_ci"](
            spark, sf_small
        ).collect()
    }
    for arm in (0, 1):
        sub = g[g.index % 2 == arm]
        n = len(sub)
        sy, sx = float(sub["y"].sum()), float(sub["x"].sum())
        syy = float((sub["y"].astype(object) ** 2).sum())
        sxx = float((sub["x"].astype(object) ** 2).sum())
        syx = float(
            (sub["y"].astype(object) * sub["x"].astype(object)).sum()
        )
        R = sy / sx
        vy = (n * syy - sy * sy) / (n * (n - 1.0))
        vx = (n * sxx - sx * sx) / (n * (n - 1.0))
        cyx = (n * syx - sy * sx) / (n * (n - 1.0))
        se = math.sqrt((vy - 2 * R * cyx + R * R * vx) / n) / (sx / n)
        r = got[arm]
        assert r["n_users"] == n
        assert abs(r["ratio_cents_per_event"] - R) < 1e-9 * abs(R)
        assert abs(r["se"] - se) < 1e-9 * max(se, 1e-12)
        assert r["ci_lo"] < R < r["ci_hi"]
        assert abs(r["ci_hi"] - (R + Z * se)) < 1e-9 * max(abs(R), 1.0)


def test_sprt_matches_integer_grid_replay(spark, sf_small):
    """Per-day llr and Wald decisions must match a Python replay of the
    cumulative integer-grid statistic."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.evaluation_ext import (
        _SPRT_GRID,
        _SPRT_I1,
        _SPRT_I2,
        _SPRT_IA,
        _SPRT_IB,
    )

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    ev = ev.assign(
        day_id=ev["ts"].astype("datetime64[ns]").astype("int64")
        // (86400 * 10**9)
    )
    daily = (
        ev.groupby("day_id")
        .agg(
            n=("event_type", "size"),
            k=("event_type", lambda s: int((s == "purchase").sum())),
        )
        .sort_index()
    )
    rows = {
        r["day_id"]: r
        for r in registry.QUERIES["sprt_sequential_test"](
            spark, sf_small
        ).collect()
    }
    assert set(rows) == set(daily.index)
    n_cum = k_cum = 0
    for day, rec in daily.iterrows():
        n_cum += int(rec["n"])
        k_cum += int(rec["k"])
        grid = k_cum * _SPRT_I1 + (n_cum - k_cum) * _SPRT_I2
        want = (
            "accept_h1"
            if grid >= _SPRT_IA
            else ("accept_h0" if grid <= _SPRT_IB else "continue")
        )
        r = rows[day]
        assert (r["n_cum"], r["k_cum"]) == (n_cum, k_cum)
        assert r["llr"] == grid / _SPRT_GRID
        assert r["decision"] == want


def test_empirical_bayes_shrinks_toward_pool(spark, sf_small):
    """alpha/beta must match the method-of-moments replay, and every
    shrunk rate must land BETWEEN its raw rate and the prior mean (the
    convex-combination property of beta-binomial shrinkage)."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.profiling_ext import (
        _EB_SHORT_CHARS,
    )

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    per = docs.groupby("source").agg(
        n=("n_chars", "size"),
        k=("n_chars", lambda s: int((s < _EB_SHORT_CHARS).sum())),
    )
    srcs = sorted(per.index)
    s = len(srcs)
    m = sum(per.loc[c, "k"] / per.loc[c, "n"] / s for c in srcs)
    ex2 = sum((per.loc[c, "k"] / per.loc[c, "n"]) ** 2 / s for c in srcs)
    v = ex2 - m * m
    rows = {
        r["source"]: r
        for r in registry.QUERIES["empirical_bayes_rates"](
            spark, sf_small
        ).collect()
    }
    assert set(rows) == set(srcs)
    valid = v > 0 and 0 < m < 1 and s >= 2 and m * (1 - m) > v
    for c in srcs:
        r = rows[c]
        raw = per.loc[c, "k"] / per.loc[c, "n"]
        assert r["n_docs"] == per.loc[c, "n"]
        assert r["k_short"] == per.loc[c, "k"]
        assert abs(r["raw_rate"] - raw) < 1e-15
        if valid:
            cfac = m * (1 - m) / v - 1
            alpha, beta = m * cfac, (1 - m) * cfac
            assert abs(r["alpha"] - alpha) < 1e-9 * max(alpha, 1.0)
            want = (per.loc[c, "k"] + alpha) / (per.loc[c, "n"] + alpha + beta)
            assert abs(r["shrunk_rate"] - want) < 1e-12
            lo, hi = min(raw, m), max(raw, m)
            assert lo - 1e-12 <= r["shrunk_rate"] <= hi + 1e-12
        else:
            assert r["alpha"] is None and r["beta"] is None
            assert r["shrunk_rate"] == r["raw_rate"]


def test_feature_mi_control_is_noise_floor(spark, sf_small):
    """MI must match a Python entropy replay per feature; the id-parity
    control (independent by construction) must sit at the noise floor,
    below the informative features; MI >= 0 up to rounding."""
    import math

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.profiling_ext import (
        _MI_LEN_BIN,
        _MI_LEN_BINS,
    )

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    feats = {
        "len_band": (docs["n_chars"] // _MI_LEN_BIN)
        .clip(upper=_MI_LEN_BINS - 1)
        .astype(str),
        "source": docs["source"],
        "id_parity": (docs["doc_id"] % 2).astype(str),
    }
    got = {
        r["feature"]: r
        for r in registry.QUERIES["feature_mi_ranking"](
            spark, sf_small
        ).collect()
    }
    n = len(docs)

    def h(series_tuples):
        counts = {}
        for t in series_tuples:
            counts[t] = counts.get(t, 0) + 1
        return sum(
            -(c / n) * math.log(c / n) for _, c in sorted(counts.items())
        )

    for name, fv in feats.items():
        h_f = h(list(zip(fv)))
        h_l = h(list(zip(docs["lang"])))
        h_fl = h(list(zip(fv, docs["lang"])))
        mi = h_f + h_l - h_fl
        r = got[name]
        assert r["n_docs"] == n
        assert abs(r["mutual_info"] - round(mi, 6)) < 2e-6
        assert r["mutual_info"] >= -1e-6
    assert got["id_parity"]["mutual_info"] < 0.02
    assert got["source"]["mutual_info"] >= got["id_parity"]["mutual_info"]


def test_tokenizer_fertility_matches_replay(spark, sf_small):
    """Per-lang token tallies must match a Python regex replay, and
    fertility >= 1 (every whitespace chunk yields >= 1 BPE token)."""
    import re

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.textstats import _BPE_PATTERN

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    pat = re.compile(_BPE_PATTERN)
    agg = {}
    for lang, text, nc in zip(docs["lang"], docs["text"], docs["n_chars"]):
        ws = len(re.split(r"\s+", text.strip()))
        bpe = len(pat.findall(text))
        d = agg.setdefault(lang, [0, 0, 0, 0])
        d[0] += 1
        d[1] += ws
        d[2] += bpe
        d[3] += int(nc)
    rows = registry.QUERIES["tokenizer_fertility_by_lang"](
        spark, sf_small
    ).collect()
    assert {r["lang"] for r in rows} == set(agg)
    for r in rows:
        n, ws, bpe, nc = agg[r["lang"]]
        assert (r["n_docs"], r["ws_tokens"], r["bpe_tokens"], r["chars"]) == (
            n,
            ws,
            bpe,
            nc,
        )
        assert r["fertility"] == bpe / ws
        assert r["chars_per_token"] == nc / bpe
        assert r["fertility"] >= 1.0


def test_decontam_embedding_matches_bruteforce(spark, sf_small):
    """The one-row semantic-decontamination summary must match a full
    Python replay: hash split, LCG sign-projection buckets, list-ordered
    dot products rounded to 4 dp, threshold count."""
    import hashlib

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import (
        DIM,
        LSH_PLANES,
        NEAR_DUP_COS,
        _LCG_A,
        _LCG_C,
        _LCG_M,
        _LCG_SHIFT,
    )

    registry.load_all()
    emb = _load_pdf(sf_small, "embeddings")

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    def bucket(v):
        b = 0
        for j in range(LSH_PLANES):
            acc = 0.0
            for i, x in enumerate(v):
                coef = (_LCG_A * (j * DIM + i) + _LCG_C) % _LCG_M - _LCG_SHIFT
                acc = acc + float(x) * coef
            if acc > 0:
                b += 1 << j
        return b

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    tr, ev = [], []
    for vid, v in zip(emb["vec_id"], emb["embedding"]):
        hb = h48(str(vid)) % 100
        if hb < 80:
            tr.append((int(vid), list(v)))
        elif hb >= 90:
            ev.append((int(vid), list(v)))
    import math

    def nrm(v):
        return math.sqrt(dot(v, v))

    buckets_ev = {}
    for vid, v in ev:
        buckets_ev.setdefault(bucket(v), []).append((vid, v))
    n_pairs = 0
    contaminated = set()
    max_cos = -1.0
    for vid, v in tr:
        for evid, evv in buckets_ev.get(bucket(v), []):
            c = round(dot(v, evv) / (nrm(v) * nrm(evv)), 4)
            n_pairs += 1
            max_cos = max(max_cos, c)
            if c >= NEAR_DUP_COS:
                contaminated.add(vid)
    r = registry.QUERIES["decontam_embedding_cosine"](
        spark, sf_small
    ).collect()[0]
    assert r["n_train"] == len(tr)
    assert r["n_eval"] == len(ev)
    assert r["n_candidate_pairs"] == n_pairs
    assert r["n_contaminated"] == len(contaminated)
    assert abs(r["contaminated_share"] - len(contaminated) / len(tr)) < 1e-15
    assert abs(r["max_cosine"] - max_cos) < 5e-5


def test_group_sequential_boundaries_and_replay(spark, sf_small):
    """Look rows must match a pandas cumulative replay; OF boundaries
    strictly decrease toward ~2.04 at the final look; decisions are
    consistent with |z| vs boundary."""
    import math

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.evaluation_ext import (
        _GSD_C,
        _GSD_K,
    )

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    ev = ev.assign(
        day_id=ev["ts"].astype("datetime64[ns]").astype("int64")
        // (86400 * 10**9),
        a1=(ev["user_id"] % 2 == 1),
        p=(ev["event_type"] == "purchase"),
    )
    daily = (
        ev.groupby("day_id")
        .agg(
            n1=("a1", "sum"),
            x1=("p", lambda s: int((s & ev.loc[s.index, "a1"]).sum())),
            n0=("a1", lambda s: int((~s).sum())),
            x0=("p", lambda s: int((s & ~ev.loc[s.index, "a1"]).sum())),
        )
        .sort_index()
    )
    d = len(daily)
    cum = daily.cumsum()
    got = {
        r["look"]: r
        for r in registry.QUERIES["group_sequential_looks"](
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(range(1, _GSD_K + 1))
    prev_bound = float("inf")
    for k in range(1, _GSD_K + 1):
        rn = math.ceil(k * d / _GSD_K)
        row = cum.iloc[rn - 1]
        r = got[k]
        assert r["look_day_id"] == daily.index[rn - 1]
        assert (r["n1"], r["x1"], r["n0"], r["x0"]) == (
            int(row["n1"]),
            int(row["x1"]),
            int(row["n0"]),
            int(row["x0"]),
        )
        n1, x1, n0, x0 = (int(row[c]) for c in ("n1", "x1", "n0", "x0"))
        phat = (x1 + x0) / (n1 + n0)
        z = (x1 / n1 - x0 / n0) / math.sqrt(
            phat * (1 - phat) * (1 / n1 + 1 / n0)
        )
        bound = float(_GSD_C) * math.sqrt(_GSD_K / k)
        assert abs(r["z"] - z) < 1e-12
        assert abs(r["of_bound"] - bound) < 1e-12
        assert r["of_bound"] < prev_bound
        prev_bound = r["of_bound"]
        want = "stop_reject" if abs(z) >= bound else "continue"
        assert r["decision"] == want
    assert abs(got[_GSD_K]["of_bound"] - float(_GSD_C)) < 1e-12


def test_stratified_standardization_replay(spark, sf_small):
    """Cell table must match a pandas replay; contributions must sum to
    the standardized ATE; every band keeps both arms populated at test
    scale (positivity)."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.evaluation_ext import (
        _STD_BAND_EVENTS,
        _STD_BANDS,
    )

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    ev = ev.assign(cents=(ev["value"] * 100.0).round().astype("int64"))
    g = ev.groupby("user_id").apply(
        lambda s: (
            min(len(s) // _STD_BAND_EVENTS, _STD_BANDS - 1),
            int(5 * int((s["event_type"] == "signup").sum()) > len(s)),
            int(s.loc[s["event_type"] == "purchase", "cents"].sum()),
        ),
        include_groups=False,
    )
    cells = {}
    for cell, t, y in g:
        d = cells.setdefault(cell, [0, 0, 0, 0, 0])  # n, nt, nc, syt, syc
        d[0] += 1
        if t:
            d[1] += 1
            d[3] += y
        else:
            d[2] += 1
            d[4] += y
    n = sum(d[0] for d in cells.values())
    rows = registry.QUERIES["stratified_standardization"](
        spark, sf_small
    ).collect()
    got = {r["cell"]: r for r in rows}
    assert set(got) == set(cells)
    ate = 0.0
    n_full = 0
    for cell, (nc_, nt, nc0, syt, syc) in cells.items():
        r = got[cell]
        assert (r["n_cell"], r["n_treat"], r["n_ctrl"]) == (nc_, nt, nc0)
        assert abs(r["weight"] - nc_ / n) < 1e-15
        if nt == 0 or nc0 == 0:
            # positivity violation: the NULL path, not an extrapolation
            assert r["cell_effect"] is None and r["contribution"] is None
            continue
        n_full += 1
        eff = syt / nt - syc / nc0
        assert abs(r["cell_effect"] - eff) < 1e-9 * max(abs(eff), 1.0)
        contrib = eff * (nc_ / n)
        assert abs(r["contribution"] - contrib) < 1e-9 * max(abs(contrib), 1)
        ate += contrib
    assert n_full >= 1  # the estimate exists on at least one stratum
    got_ate = sum(
        r["contribution"] for r in rows if r["contribution"] is not None
    )
    assert abs(got_ate - ate) < 1e-6 * max(abs(ate), 1.0)


def test_srm_check_flags_the_buggy_split_only(spark, sf_small):
    """Counts must match a hashlib replay; the parity split must pass
    and the 33/67 hash split must alarm at test scale."""
    import hashlib
    import math

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    users = sorted(set(int(u) for u in ev["user_id"]))
    n = len(users)
    par = sum(u % 2 for u in users)
    bug = sum(
        1
        for u in users
        if int(hashlib.md5(str(u).encode()).hexdigest()[:12], 16) % 3 == 0
    )
    got = {
        r["assignment"]: r
        for r in registry.QUERIES["ab_srm_check"](spark, sf_small).collect()
    }
    assert set(got) == {"parity", "hash_third"}
    for name, t in [("parity", par), ("hash_third", bug)]:
        r = got[name]
        assert (r["n_units"], r["n_treat"], r["n_ctrl"]) == (n, t, n - t)
        chi2 = (t - (n - t)) ** 2 / n
        assert abs(r["chi2"] - chi2) < 1e-12
        # p-value sits within the A&S approximation error of math.erfc
        assert abs(r["p_value"] - math.erfc(math.sqrt(chi2 / 2))) < 2e-6
        assert 0.0 <= r["p_value"] <= 1.0
    assert not got["parity"]["srm_flag"]  # healthy split passes
    # flag must be exactly the pinned-p comparison; at n >= 100 the 33/67
    # imbalance is statistically detectable and the alarm must fire
    for r in got.values():
        assert r["srm_flag"] == (r["p_value"] < 0.001)
    if n >= 100:
        assert got["hash_third"]["srm_flag"]


def test_forecast_backtest_matches_replay(spark, sf_small):
    """MAE/WAPE must match an exact pandas lag-7 replay per stream."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.timeseries_ext import _BT_LAG_DAYS

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    ev = ev.assign(
        day_id=ev["ts"].astype("datetime64[ns]").astype("int64")
        // (86400 * 10**9),
        cents=(ev["value"] * 100.0).round().astype("int64"),
    )
    daily = (
        ev.groupby(["event_type", "day_id"])["cents"].sum().reset_index()
    )
    got = {
        r["event_type"]: r
        for r in registry.QUERIES["forecast_backtest_naive"](
            spark, sf_small
        ).collect()
    }
    for et, sub in daily.groupby("event_type"):
        c = sub.sort_values("day_id")["cents"].tolist()
        errs = [
            abs(c[i] - c[i - _BT_LAG_DAYS])
            for i in range(_BT_LAG_DAYS, len(c))
        ]
        acts = [abs(c[i]) for i in range(_BT_LAG_DAYS, len(c))]
        r = got[et]
        assert r["n_days"] == len(errs)
        assert r["mae_cents"] == sum(errs) / len(errs)
        assert r["wape"] == sum(errs) / sum(acts)
        assert r["wape"] >= 0.0


def test_qini_deciles_replay_and_endpoint(spark, sf_small):
    """Decile cells must match a pandas replay; the final cumulative
    depth must cover every user; qini at full depth equals the overall
    scaled incremental conversions."""
    import math

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.evaluation_ext import (
        _QINI_BUCKETS,
    )

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    pu = []
    for uid, sub in ev.groupby("user_id"):
        score = int((sub["event_type"] == "signup").sum())
        conv = int(5 * int((sub["event_type"] == "purchase").sum()) > len(sub))
        pu.append((int(uid) % 2, int(uid), score, conv))
    pu.sort(key=lambda r: (-r[2], r[1]))
    n = len(pu)
    cells = {}
    for rank0, (t, _, _, conv) in enumerate(pu):
        dec = math.ceil((rank0 + 1) * _QINI_BUCKETS / n)
        d = cells.setdefault(dec, [0, 0, 0, 0])
        d[0] += t
        d[1] += 1 - t
        d[2] += conv if t else 0
        d[3] += conv if not t else 0
    rows = registry.QUERIES["uplift_qini_deciles"](spark, sf_small).collect()
    got = {r["decile"]: r for r in rows}
    assert set(got) == set(cells)
    cn_t = cn_c = cc_t = cc_c = 0
    for dec in sorted(cells):
        nt, nc, ct, cc = cells[dec]
        r = got[dec]
        assert (r["n_t"], r["n_c"], r["conv_t"], r["conv_c"]) == (
            nt,
            nc,
            ct,
            cc,
        )
        cn_t += nt
        cn_c += nc
        cc_t += ct
        cc_c += cc
        if cn_c > 0:
            want = cc_t - cc_c * cn_t / cn_c
            assert abs(r["qini"] - want) < 1e-9 * max(abs(want), 1.0)
    assert cn_t + cn_c == n  # full depth covers every user


def test_yuen_matches_python_replay(spark, sf_small):
    """Trimmed means, Yuen variance terms, t, and df must match an exact
    Python replay with rank-based trimming and winsorized moments."""
    import math

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.evaluation_ext import (
        _YUEN_TRIM_PCT,
    )

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    ev = ev.assign(cents=(ev["value"] * 100.0).round().astype("int64"))
    per = ev.groupby("user_id")["cents"].sum()
    stats = {}
    for arm in (0, 1):
        ys = sorted(
            (int(y), int(u)) for u, y in per.items() if u % 2 == arm
        )
        n = len(ys)
        g = (n * _YUEN_TRIM_PCT + 99) // 100
        h = n - 2 * g
        kept = [y for y, _ in ys[g : n - g]]
        m = sum(kept) / h
        lo, hi = ys[g][0], ys[n - g - 1][0]
        wvals = [min(max(y, lo), hi) for y, _ in ys]
        ws, wss = sum(wvals), sum(v * v for v in wvals)
        swin = (wss - ws * ws / n) / (n - 1)
        d = swin * (n - 1.0) / (h * (h - 1.0))
        stats[arm] = (n, h, m, d)
    r = registry.QUERIES["yuen_trimmed_ttest"](spark, sf_small).collect()[0]
    n1, h1, m1, d1 = stats[1]
    n0, h0, m0, d0 = stats[0]
    assert (r["n1"], r["n0"], r["h1"], r["h0"]) == (n1, n0, h1, h0)
    assert abs(r["trimmed_mean_1"] - m1) < 1e-6 * max(abs(m1), 1.0)
    assert abs(r["trimmed_mean_0"] - m0) < 1e-6 * max(abs(m0), 1.0)
    t = (m1 - m0) / math.sqrt(d1 + d0)
    df = (d1 + d0) ** 2 / (d1 * d1 / (h1 - 1.0) + d0 * d0 / (h0 - 1.0))
    assert abs(r["t_stat"] - t) < 1e-9 * max(abs(t), 1.0)
    assert abs(r["df"] - df) < 1e-6 * max(df, 1.0)
    assert 1.0 <= r["df"] <= (h1 - 1) + (h0 - 1) + 1e-9


def test_join_state_peak_matches_bruteforce(spark, sf_small):
    """Peak retained rows must equal a brute-force max over arrival
    instants of the [ts, ts+H) retention window, per stream."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.sessions_ext import (
        _JSP_HORIZON_NS,
    )

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    ev = ev.assign(t=ev["ts"].astype("datetime64[ns]").astype("int64"))
    got = {
        r["event_type"]: r
        for r in registry.QUERIES["stream_join_state_peak"](
            spark, sf_small
        ).collect()
    }
    for et, sub in ev.groupby("event_type"):
        ts = sorted(int(t) for t in sub["t"])
        # retained at arrival instant t: rows with t' in (t - H, t]
        peak = 0
        import bisect

        for i, t in enumerate(ts):
            lo = bisect.bisect_right(ts, t - _JSP_HORIZON_NS)
            peak = max(peak, (i + 1) - lo)
        r = got[et]
        assert r["n_events"] == len(ts)
        assert r["peak_state_rows"] == peak
        assert r["horizon_minutes"] == _JSP_HORIZON_NS // 60_000_000_000


def test_median_order_ci_brackets_and_replay(spark, sf_small):
    """Rank cutoffs and selected values must match a sorted-list replay;
    the order-statistic CI must bracket the lower median."""
    import math

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    Z = 1.959963984540054
    li = _load_pdf(sf_small, "lineitem")
    li = li.assign(cents=(li["l_extendedprice"] * 100.0).round().astype("int64"))
    got = {
        r["l_returnflag"]: r
        for r in registry.QUERIES["median_order_ci"](
            spark, sf_small
        ).collect()
    }
    for flag, sub in li.groupby("l_returnflag"):
        ys = sorted(
            zip(sub["cents"], sub["l_orderkey"], sub["l_linenumber"])
        )
        n = len(ys)
        klo = math.floor((n - Z * math.sqrt(n)) / 2)
        khi = math.ceil(1 + (n + Z * math.sqrt(n)) / 2)
        r = got[flag]
        assert (r["n"], r["klo"], r["khi"]) == (n, klo, khi)
        assert r["median_lo_cents"] == ys[(n + 1) // 2 - 1][0]
        assert r["ci_lo_cents"] == ys[klo - 1][0]
        assert r["ci_hi_cents"] == ys[khi - 1][0]
        assert r["ci_lo_cents"] <= r["median_lo_cents"] <= r["ci_hi_cents"]


def test_hill_matches_replay_and_pairs_with_zipf(spark, sf_small):
    """alpha must match an exact Python replay over the top-(k+1) token
    counts and be positive; the frontier threshold is the (k+1)-th
    count."""
    import math
    import re

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.textstats import _HILL_K

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    counts = {}
    for t in docs["text"]:
        toks = re.split(r"\s+", t.strip())
        shingles = (
            [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
            if len(toks) >= 3
            else [" ".join(toks)]
        )
        for tok in shingles:
            counts[tok] = counts.get(tok, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
        : _HILL_K + 1
    ]
    ck1 = top[_HILL_K][1]
    s = sum(math.log(c / ck1) for _, c in top[:_HILL_K])
    r = registry.QUERIES["tail_index_hill"](spark, sf_small).collect()[0]
    assert r["k"] == _HILL_K
    assert r["x_k1"] == ck1
    assert abs(r["alpha_hill"] - _HILL_K / s) < 1e-9 * max(_HILL_K / s, 1.0)
    assert r["alpha_hill"] > 0.0


def test_covariate_balance_matches_replay(spark, sf_small):
    """Per-covariate SMDs must match an exact-moment Python replay, and
    the flag must be |smd| > 0.1 exactly."""
    import math

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    ev = ev.assign(
        cents=(ev["value"] * 100.0).round().astype("int64"),
        day=ev["ts"].astype("datetime64[ns]").astype("int64")
        // (86400 * 10**9),
    )
    users = {}
    for uid, sub in ev.groupby("user_id"):
        t = int(5 * int((sub["event_type"] == "signup").sum()) > len(sub))
        users[int(uid)] = (
            t,
            {
                "n_events": len(sub),
                "n_purchases": int((sub["event_type"] == "purchase").sum()),
                "total_cents": int(sub["cents"].sum()),
                "active_days": int(sub["day"].nunique()),
            },
        )
    got = {
        r["covariate"]: r
        for r in registry.QUERIES["covariate_balance_smd"](
            spark, sf_small
        ).collect()
    }
    covs = ["n_events", "n_purchases", "total_cents", "active_days"]
    assert set(got) == set(covs)
    for cov in covs:
        a1 = [v[cov] for t, v in users.values() if t == 1]
        a0 = [v[cov] for t, v in users.values() if t == 0]
        n1, n0 = len(a1), len(a0)
        m1, m0 = sum(a1) / n1, sum(a0) / n0
        v1 = (sum(x * x for x in a1) - sum(a1) ** 2 / n1) / (n1 - 1)
        v0 = (sum(x * x for x in a0) - sum(a0) ** 2 / n0) / (n0 - 1)
        smd = (m1 - m0) / math.sqrt((v1 + v0) / 2)
        r = got[cov]
        assert (r["n1"], r["n0"]) == (n1, n0)
        assert abs(r["mean_treat"] - m1) < 1e-9 * max(abs(m1), 1.0)
        assert abs(r["smd"] - smd) < 1e-9 * max(abs(smd), 1.0)
        assert r["imbalanced"] == (abs(r["smd"]) > 0.1)


def test_prf_terms_match_bruteforce(spark, sf_small):
    """Expansion terms must match a brute-force replay: top-3 BM25 docs'
    term tallies excluding the original query terms; idf exact."""
    import re

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.retrieval_ext import (
        _PRF_FB_DOCS,
        _PRF_TERMS,
        BM25_NTERMS,
    )

    registry.load_all()
    fb_ids = [
        r["doc_id"]
        for r in registry.QUERIES["bm25_topk"](spark, sf_small).collect()
        if r["rn"] <= _PRF_FB_DOCS
    ]
    docs = _load_pdf(sf_small, "documents")
    n_docs = len(docs)
    df_counts = {}
    for t in docs["text"]:
        for tok in set(re.split(r"\s+", t.strip())):
            df_counts[tok] = df_counts.get(tok, 0) + 1
    qterms = {
        t
        for t, _ in sorted(df_counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :BM25_NTERMS
        ]
    }
    fbtf = {}
    fb_set = set(fb_ids)
    for did, t in zip(docs["doc_id"], docs["text"]):
        if int(did) not in fb_set:
            continue
        for tok in re.split(r"\s+", t.strip()):
            if tok not in qterms:
                fbtf[tok] = fbtf.get(tok, 0) + 1
    want = sorted(fbtf.items(), key=lambda kv: (-kv[1], kv[0]))[:_PRF_TERMS]
    rows = registry.QUERIES["bm25_prf_terms"](spark, sf_small).collect()
    assert len(rows) == len(want)
    for r, (tok, tf_) in zip(sorted(rows, key=lambda r: r["rank"]), want):
        assert r["token"] == tok
        assert r["fb_tf"] == tf_
        assert r["df"] == df_counts[tok]
        idf = (n_docs - df_counts[tok] + 0.5) / (df_counts[tok] + 0.5)
        assert abs(r["idf"] - idf) < 1e-12
        assert tok not in qterms


def test_partial_correlation_matches_numpy(spark, sf_small):
    """All three correlations and the partial form must match an exact
    replay; |r| bounds hold; the partial form must equal the formula
    applied to the reported raw correlations."""
    import math

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    ev = ev.assign(
        cents=(ev["value"] * 100.0).round().astype("int64"),
        day=ev["ts"].astype("datetime64[ns]").astype("int64")
        // (86400 * 10**9),
    )
    xs, ys, zs = [], [], []
    for _, sub in ev.groupby("user_id"):
        xs.append(len(sub))
        ys.append(int(sub["cents"].sum()))
        zs.append(int(sub["day"].nunique()))
    n = len(xs)

    def corr(a, b):
        sa, sb = sum(a), sum(b)
        sab = sum(u * v for u, v in zip(a, b))
        saa = sum(u * u for u in a)
        sbb = sum(v * v for v in b)
        return (n * sab - sa * sb) / math.sqrt(
            (n * saa - sa * sa) * (n * sbb - sb * sb)
        )

    rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
    r = registry.QUERIES["partial_correlation"](spark, sf_small).collect()[0]
    assert r["n_users"] == n
    for got, want in ((r["rxy"], rxy), (r["rxz"], rxz), (r["ryz"], ryz)):
        assert abs(got - want) < 1e-9
        assert -1.0 - 1e-12 <= got <= 1.0 + 1e-12
    part = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert abs(r["r_xy_given_z"] - part) < 1e-9
    # consistency with the engine's own reported raw correlations
    own = (r["rxy"] - r["rxz"] * r["ryz"]) / math.sqrt(
        (1 - r["rxz"] ** 2) * (1 - r["ryz"] ** 2)
    )
    assert abs(r["r_xy_given_z"] - own) < 1e-12


def test_decision_stump_matches_bruteforce(spark, sf_small):
    """The chosen split must minimize the exact-fraction weighted Gini
    over ALL cuts (ties to the smallest cut), with gain >= 0 vs the
    parent impurity."""
    from fractions import Fraction

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.evaluation_ext import _scored

    registry.load_all()
    spark_sc = _scored(spark, sf_small)  # the registered (x, y) relation
    rows = [(r["x"], r["y"]) for r in spark_sc.collect()]
    per_v = {}
    for x, y in rows:
        t, t1 = per_v.get(x, (0, 0))
        per_v[x] = (t + 1, t1 + y)
    n = len(rows)
    p = sum(y for _, y in rows)

    def child_g(k, m):
        return m - Fraction(k * k + (m - k) * (m - k), m)

    best = None
    nl = kl = 0
    for v in sorted(per_v):
        t, t1 = per_v[v]
        nl += t
        kl += t1
        if n - nl == 0:
            break
        g = Fraction(child_g(kl, nl) + child_g(p - kl, n - nl), n)
        if best is None or g < best[0]:
            best = (g, v, nl, kl)
    r = registry.QUERIES["decision_stump_split"](spark, sf_small).collect()[0]
    g, v, nl, kl = best
    assert r["split_x"] == v
    assert (r["n_left"], r["pos_left"]) == (nl, kl)
    assert (r["n_right"], r["pos_right"]) == (n - nl, p - kl)
    assert abs(r["gini_after"] - float(g)) < 1e-12
    parent = float(Fraction(child_g(p, n), n))
    assert abs(r["gini_parent"] - parent) < 1e-12
    assert r["gini_gain"] >= -1e-12


def test_kappa_matches_replay_and_bounds(spark, sf_small):
    """kappa must match a replay over the composed confusion cells, obey
    kappa <= p_observed normalization, and the integer rearrangement
    must equal the textbook (po-pe)/(1-pe)."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    cells = registry.QUERIES["text_lang_confusion"](spark, sf_small).collect()
    n = sum(r["n_docs"] for r in cells)
    agree = sum(
        r["n_docs"] for r in cells if r["lang_label"] == r["lang_pred"]
    )
    a, b = {}, {}
    for r in cells:
        a[r["lang_label"]] = a.get(r["lang_label"], 0) + r["n_docs"]
        b[r["lang_pred"]] = b.get(r["lang_pred"], 0) + r["n_docs"]
    chance_num = sum(a[l] * b.get(l, 0) for l in a)
    po, pe = agree / n, chance_num / (n * n)
    r = registry.QUERIES["cohens_kappa_langid"](spark, sf_small).collect()[0]
    assert (r["n_docs"], r["agree"]) == (n, agree)
    assert abs(r["p_observed"] - po) < 1e-15
    assert abs(r["p_chance"] - pe) < 1e-15
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-12
    assert r["kappa"] <= 1.0 + 1e-12


def test_tost_matches_replay(spark, sf_small):
    """TOST cells, CI bounds, and the equivalence boolean must match an
    exact replay; the boolean must be exactly the band containment."""
    import math

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    Z90 = 1.6448536269514722
    MARGIN = 0.02
    ev = _load_pdf(sf_small, "events")
    cells = {1: [0, 0], 0: [0, 0]}
    for uid, sub in ev.groupby("user_id"):
        conv = int(5 * int((sub["event_type"] == "purchase").sum()) > len(sub))
        c = cells[int(uid) % 2]
        c[0] += 1
        c[1] += conv
    n1, x1 = cells[1]
    n0, x0 = cells[0]
    p1, p0 = x1 / n1, x0 / n0
    diff = p1 - p0
    se = math.sqrt(p1 * (1 - p1) / n1 + p0 * (1 - p0) / n0)
    r = registry.QUERIES["ab_tost_equivalence"](spark, sf_small).collect()[0]
    assert (r["n1"], r["x1"], r["n0"], r["x0"]) == (n1, x1, n0, x0)
    assert abs(r["diff"] - diff) < 1e-15
    assert abs(r["se"] - se) < 1e-15
    assert abs(r["ci90_lo"] - (diff - Z90 * se)) < 1e-12
    assert abs(r["ci90_hi"] - (diff + Z90 * se)) < 1e-12
    assert r["equivalent"] == (
        r["ci90_lo"] > -MARGIN and r["ci90_hi"] < MARGIN
    )


def test_dynamic_gap_sessions_replay(spark, sf_small):
    """Per-user session tallies must match a pandas island-merge replay
    of the [t, t+gap) rule, and the DYNAMIC gap must be live: some user
    merges sessions a fixed 10-minute gap would split."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.sessions_ext import (
        _DG_DEFAULT_US,
        _DG_GAPS_US,
    )

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    ev = ev.assign(
        t=ev["ts"].astype("datetime64[ns]").astype("int64") // 1000
    )
    got = {
        r["user_id"]: r
        for r in registry.QUERIES["dynamic_gap_sessions"](
            spark, sf_small
        ).collect()
    }

    def replay(sub, gaps, default):
        rows = sorted(
            (int(t), int(eid), gaps.get(et, default))
            for t, eid, et in zip(sub["t"], sub["event_id"], sub["event_type"])
        )
        sessions = []
        end = None
        for t, _, g in rows:
            if end is None or t > end:
                sessions.append([t, t + g, 0])
                end = t + g
            else:
                end = max(end, t + g)
                sessions[-1][1] = end
            sessions[-1][2] += 1
        return sessions

    dynamic_is_live = False
    for uid, sub in ev.groupby("user_id"):
        sess = replay(sub, _DG_GAPS_US, _DG_DEFAULT_US)
        r = got[int(uid)]
        assert r["n_sessions"] == len(sess)
        assert r["n_events"] == sum(s[2] for s in sess)
        assert r["max_session_events"] == max(s[2] for s in sess)
        assert r["total_span_us"] == sum(s[1] - s[0] for s in sess)
        fixed = replay(sub, {}, _DG_DEFAULT_US)
        if len(fixed) != len(sess):
            dynamic_is_live = True
    assert dynamic_is_live  # the per-type gap changes real outcomes


def test_hll_overlap_exact_columns_and_tolerance(spark, sf_small):
    """Exact pair cells must match a Python set replay; every pair's
    sketch intersection must sit within the declared tolerance (the
    flag is 1 everywhere)."""
    import re

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    vocab = {}
    for src, t in zip(docs["source"], docs["text"]):
        toks = re.split(r"\s+", t.strip())
        sh = (
            {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
            if len(toks) >= 3
            else {" ".join(toks)}
        )
        vocab.setdefault(src, set()).update(sh)
    rows = registry.QUERIES["source_shingle_overlap_hll"](
        spark, sf_small
    ).collect()
    srcs = sorted(vocab)
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        a, b = vocab[r["src_a"]], vocab[r["src_b"]]
        assert r["src_a"] < r["src_b"]
        assert r["n_common"] == len(a & b)
        assert (r["vocab_a"], r["vocab_b"]) == (len(a), len(b))
        assert r["n_union"] == len(a | b)
        assert abs(r["jaccard"] - len(a & b) / len(a | b)) < 1e-12
        assert r["inter_within_tol"] == 1  # the sketch holds its bound


def test_detector_ensemble_census_replay(spark, sf_small):
    """The mask histogram must equal the set-algebra replay of the three
    composed detectors' pair sets, and popcounts must be consistent."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()

    def pairs(name):
        return {
            (r["a_id"], r["b_id"])
            for r in registry.QUERIES[name](spark, sf_small).collect()
        }

    m = pairs("dedup_minhash_lsh")
    g = pairs("dedup_ngram_jaccard")
    s = pairs("dedup_simhash_hamming1")
    masks = {}
    for p in m | g | s:
        mask = (1 if p in m else 0) + (2 if p in g else 0) + (4 if p in s else 0)
        masks[mask] = masks.get(mask, 0) + 1
    rows = registry.QUERIES["dedup_detector_ensemble"](
        spark, sf_small
    ).collect()
    got = {r["mask"]: (r["n_votes"], r["n_pairs"]) for r in rows}
    assert set(got) == set(masks)
    for mask, n in masks.items():
        assert got[mask] == (bin(mask).count("1"), n)
    assert sum(n for _, n in got.values()) == len(m | g | s)


def test_loso_influence_matches_replay_and_identity(spark, sf_small):
    """LOSO deltas must match the closed form from per-source totals, and
    the weighted deltas must satisfy the mean identity (dropping a
    below-mean source raises the mean)."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    per = docs.groupby("source")["n_chars"].agg(["count", "sum"])
    n_all = int(per["count"].sum())
    t_all = float(per["sum"].sum())
    got = {
        r["source"]: r
        for r in registry.QUERIES["loso_source_influence"](
            spark, sf_small
        ).collect()
    }
    for src in per.index:
        n, t = int(per.loc[src, "count"]), float(per.loc[src, "sum"])
        r = got[src]
        assert r["n_docs"] == n
        assert abs(r["source_mean_chars"] - t / n) < 1e-9
        delta = (t_all - t) / (n_all - n) - t_all / n_all
        assert abs(r["loso_delta"] - delta) < 1e-9
        # dropping a below-corpus-mean source must RAISE the mean
        assert (delta > 0) == (t / n < t_all / n_all)


def test_pinball_q90_beats_mean_by_construction(spark, sf_small):
    """The empirical P90 must win the tau=0.9 pinball comparison (the
    quantile is the loss minimizer), and both losses must match an
    exact integer replay."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    orders = _load_pdf(sf_small, "orders")
    cents = sorted(
        zip(
            (orders["o_totalprice"] * 100.0).round().astype("int64"),
            orders["o_orderkey"],
        )
    )
    vals = [int(c) for c, _ in cents]
    n = len(vals)
    q90 = vals[(n * 9 + 9) // 10 - 1]
    mean_floor = sum(vals) // n

    def loss_x10(q):
        return sum(
            9 * (v - q) if v >= q else 1 * (q - v) for v in vals
        )

    r = registry.QUERIES["pinball_loss_eval"](spark, sf_small).collect()[0]
    assert r["n_orders"] == n
    assert r["q90_cents"] == q90
    assert abs(r["pinball_q90"] - loss_x10(q90) / (10 * n)) < 1e-6
    assert abs(r["pinball_mean"] - loss_x10(mean_floor) / (10 * n)) < 1e-6
    assert r["quantile_wins"] == 1
    assert r["pinball_q90"] <= r["pinball_mean"]


def test_ips_policy_replay_matches_replay(spark, sf_small):
    """IPS/SNIPS must match an exact Python replay; the IPS identity
    ips = 2 * match_rate * snips must hold on the reported values."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    ev = ev.assign(cents=(ev["value"] * 100.0).round().astype("int64"))
    n = n_match = r_all = r_match = 0
    for uid, sub in ev.groupby("user_id"):
        pi = int(5 * int((sub["event_type"] == "signup").sum()) > len(sub))
        logged = int(uid) % 2
        r = int(sub.loc[sub["event_type"] == "purchase", "cents"].sum())
        n += 1
        r_all += r
        if pi == logged:
            n_match += 1
            r_match += r
    row = registry.QUERIES["ips_policy_replay"](spark, sf_small).collect()[0]
    assert (row["n_users"], row["n_match"]) == (n, n_match)
    assert abs(row["match_rate"] - n_match / n) < 1e-15
    assert abs(row["logged_value"] - r_all / (100 * n)) < 1e-12
    assert abs(row["ips_value"] - 2 * r_match / (100 * n)) < 1e-12
    assert abs(row["snips_value"] - r_match / (100 * n_match)) < 1e-12
    ident = 2 * row["match_rate"] * row["snips_value"]
    assert abs(row["ips_value"] - ident) < 1e-9


def test_heavy_hitter_drift_replay(spark, sf_small):
    """Movements and signed rank gains must match a Python leaderboard
    replay; movement labels must be consistent with the rank columns."""
    import re

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.textstats import _HHD_TOPK

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    cnt = {0: {}, 1: {}}
    for did, t in zip(docs["doc_id"], docs["text"]):
        h = int(did) % 2
        for tok in re.split(r"\s+", t.strip()):
            cnt[h][tok] = cnt[h].get(tok, 0) + 1
    tops = {
        h: {
            tok: (c, rk + 1)
            for rk, (tok, c) in enumerate(
                sorted(cnt[h].items(), key=lambda kv: (-kv[1], kv[0]))[
                    :_HHD_TOPK
                ]
            )
        }
        for h in (0, 1)
    }
    rows = {
        r["token"]: r
        for r in registry.QUERIES["heavy_hitter_drift"](
            spark, sf_small
        ).collect()
    }
    assert set(rows) == set(tops[0]) | set(tops[1])
    for tok, r in rows.items():
        a = tops[0].get(tok)
        b = tops[1].get(tok)
        assert (r["rk_a"] is None) == (a is None)
        assert (r["rk_b"] is None) == (b is None)
        if a:
            assert (r["c_a"], r["rk_a"]) == a
        if b:
            assert (r["c_b"], r["rk_b"]) == b
        ra = a[1] if a else _HHD_TOPK + 1
        rb = b[1] if b else _HHD_TOPK + 1
        assert r["rank_gain"] == ra - rb
        want = (
            "entered"
            if not a
            else "dropped"
            if not b
            else "held"
            if ra == rb
            else "rose"
            if rb < ra
            else "fell"
        )
        assert r["movement"] == want


def test_holm_subset_of_bh_and_stepdown_rule(spark, sf_small):
    """Holm must replay from the composed BH p-values (stop at the first
    threshold failure), and Holm rejections must be a SUBSET of BH's."""
    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.textstats import FDR_ALPHA

    registry.load_all()
    rows = sorted(
        registry.QUERIES["holm_fwer_token_drift"](spark, sf_small).collect(),
        key=lambda r: r["k_rank"],
    )
    m = len(rows)
    alive = True
    for r in rows:
        ok = r["p_value"] <= FDR_ALPHA / (m - r["k_rank"] + 1)
        alive = alive and ok
        assert r["holm_rejected"] == int(alive)
        if r["holm_rejected"]:
            assert r["bh_rejected"] == 1  # FWER rejections ⊆ FDR rejections


def test_norm_effect_rbo_matches_textbook(spark, sf_small):
    """The dot-vs-cosine RBO must equal the textbook prefix formula over
    the two rankings recomputed in Python from the embeddings."""
    import math
    from fractions import Fraction

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import (
        N_QUERIES,
        TOPK,
    )

    registry.load_all()
    emb = _load_pdf(sf_small, "embeddings")
    vecs = {int(v): [float(x) for x in e] for v, e in zip(emb["vec_id"], emb["embedding"])}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def ranking(qid, use_cos):
        scored = []
        qv = vecs[qid]
        qn = math.sqrt(dot(qv, qv))
        for vid, v in vecs.items():
            d = dot(qv, v)
            s = round(d / (qn * math.sqrt(dot(v, v))), 4) if use_cos else round(d, 4)
            scored.append((-s, vid))
        return [v for _, v in sorted(scored)[:TOPK]]

    got = {
        r["query_id"]: r
        for r in registry.QUERIES["sim_norm_effect_rbo"](
            spark, sf_small
        ).collect()
    }
    max_rbo = Fraction(2**TOPK - 1, 2**TOPK)
    for qid in range(N_QUERIES):
        a = ranking(qid, True)
        b = ranking(qid, False)
        rbo = sum(
            Fraction(len(set(a[:d]) & set(b[:d])), d * 2**d)
            for d in range(1, TOPK + 1)
        )
        r = got[qid]
        assert r["n_matched"] == len(set(a) & set(b))
        assert abs(r["rbo_norm"] - float(rbo / max_rbo)) < 1e-9
        assert 0.0 <= r["rbo_norm"] <= 1.0 + 1e-12


def test_ece_matches_bin_table(spark, sf_small):
    """ECE/MCE must equal the weighted/max gap recomputed from the
    composed reliability table, with 0 <= ECE <= MCE <= 1."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    bins = registry.QUERIES["score_calibration_bins"](
        spark, sf_small
    ).collect()
    n = sum(r["n_docs"] for r in bins)
    gaps = {
        r["bin"]: (r["n_docs"], abs(r["frac_kept"] - r["mean_score"]))
        for r in bins
    }
    ece = sum(nd / n * g for nd, g in (gaps[b] for b in sorted(gaps)))
    mce = max(g for _, g in gaps.values())
    r = registry.QUERIES["calibration_ece"](spark, sf_small).collect()[0]
    assert (r["n_bins"], r["n_total"]) == (len(bins), n)
    assert abs(r["ece"] - ece) < 1e-12
    assert abs(r["mce"] - mce) < 1e-12
    assert 0.0 <= r["ece"] <= r["mce"] <= 1.0


def test_lorenz_deciles_replay_and_convexity(spark, sf_small):
    """Decile cells must match a sorted replay; cumulative shares must be
    nondecreasing and convex-ish (each decile's share >= the previous,
    poorest-first), ending exactly at 1; equality gap >= 0 everywhere."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    cust = _load_pdf(sf_small, "customer")
    orders = _load_pdf(sf_small, "orders")
    cents = {int(k): 0 for k in cust["c_custkey"]}
    for k, p in zip(orders["o_custkey"], orders["o_totalprice"]):
        cents[int(k)] += int(round(p * 100))
    ranked = sorted((v, k) for k, v in cents.items())
    n = len(ranked)
    import math

    per = {}
    for i, (v, _) in enumerate(ranked):
        d = math.ceil((i + 1) * 10 / n)
        c = per.setdefault(d, [0, 0])
        c[0] += 1
        c[1] += v
    t = sum(v for _, v in per.values())
    rows = sorted(
        registry.QUERIES["lorenz_curve_deciles"](spark, sf_small).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == sorted(per)
    cum = 0
    prev_share = -1.0
    prev_inc = -1
    for r in rows:
        nc, rv = per[r["decile"]]
        assert (r["n_customers"], r["rev_cents"]) == (nc, rv)
        cum += rv
        assert r["cum_rev_cents"] == cum
        assert abs(r["cum_share"] - cum / t) < 1e-12
        assert r["cum_share"] >= prev_share
        prev_share = r["cum_share"]
        assert rv >= prev_inc  # poorest-first: increments nondecreasing
        prev_inc = rv
        assert r["equality_gap"] >= -1e-12
    assert abs(rows[-1]["cum_share"] - 1.0) < 1e-12


def test_popularity_baseline_matches_replay(spark, sf_small):
    """Hit rate must match a pandas replay of the temporal split, top-k
    frontier, and per-user membership check."""
    import math

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.analytics_ext import _POP_K

    registry.load_all()
    orders = _load_pdf(sf_small, "orders")
    li = _load_pdf(sf_small, "lineitem")
    orders = orders.assign(
        day=(
            orders["o_orderdate"].astype("datetime64[ns]").astype("int64")
            // (86400 * 10**9)
        )
    )
    fact = li.merge(
        orders[["o_orderkey", "o_custkey", "day"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    m = (int(orders["day"].min()) + int(orders["day"].max())) // 2
    train = fact[fact["day"] < m]
    cnt = train.groupby("l_partkey").size()
    top = {
        p
        for p, _ in sorted(
            cnt.items(), key=lambda kv: (-kv[1], kv[0])
        )[:_POP_K]
    }
    test = fact[fact["day"] >= m]
    hits = test.groupby("o_custkey")["l_partkey"].apply(
        lambda s: int(bool(set(s) & top))
    )
    r = registry.QUERIES["popularity_baseline_hitrate"](
        spark, sf_small
    ).collect()[0]
    assert r["k"] == _POP_K
    assert r["n_test_users"] == len(hits)
    assert r["n_hit"] == int(hits.sum())
    assert abs(r["hit_rate"] - hits.sum() / len(hits)) < 1e-12
    assert 0.0 <= r["hit_rate"] <= 1.0


def test_atkinson_matches_replay_and_bounds(spark, sf_small):
    """Atkinson(eps=1) must match a gridded-ln Python replay, sit in
    [0, 1), and agree with AM >= GM (index >= 0, equality iff all
    revenues equal)."""
    import math

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.plans.analytics_ext import _ATK_GRID

    registry.load_all()
    orders = _load_pdf(sf_small, "orders")
    rev = {}
    for k, p in zip(orders["o_custkey"], orders["o_totalprice"]):
        rev[int(k)] = rev.get(int(k), 0) + int(round(p * 100))
    n = len(rev)
    t = sum(rev.values())
    lq = sum(round(math.log(v) * _ATK_GRID) for v in rev.values())
    geo = math.exp((lq / _ATK_GRID) / n)
    atk = 1 - geo / (t / n)
    r = registry.QUERIES["atkinson_index"](spark, sf_small).collect()[0]
    assert (r["n_purchasers"], r["total_cents"]) == (n, t)
    # engine snaps exp-carrying outputs (2 dp / 6 dp grids)
    assert abs(r["geomean_cents"] - round(geo, 2)) < 1e-8 * max(geo, 1.0)
    assert abs(r["atkinson_eps1"] - round(atk, 6)) < 1e-9
    assert 0.0 <= r["atkinson_eps1"] < 1.0  # AM >= GM on positive values


# ---------------------------------------------------------------------------
# Round-6 additions: DP sensitivity, pass@k, scrub loss, CDC, onion, PQ.
# ---------------------------------------------------------------------------
def test_dp_sensitivity_matches_pandas_replay(spark, sf_small):
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    ev = ev.assign(cents=(ev["value"] * 100).round().astype("int64"))
    g = ev.groupby(["event_type", "user_id"]).agg(
        n_ev=("event_id", "size"), val=("cents", "sum")
    ).reset_index()
    exp = {
        t: (
            len(d),
            int(d["n_ev"].sum()),
            int(d["n_ev"].max()),
            int(d["val"].abs().max()),
        )
        for t, d in g.groupby("event_type")
    }
    rows = registry.QUERIES["privacy_dp_sensitivity_audit"](
        spark, sf_small
    ).collect()
    assert len(rows) == len(exp)
    for r in rows:
        n_users, n_events, linf, vmax = exp[r["event_type"]]
        assert (r["n_users"], r["n_events"]) == (n_users, n_events)
        assert r["linf_count_sensitivity"] == linf
        assert r["linf_value_sensitivity_cents"] == vmax
        assert r["laplace_b_eps1"] == float(linf)


def test_pass_at_k_matches_exact_fractions(spark, sf_small):
    """Replay the estimator with EXACT rational arithmetic: per task
    1 - C(n-c,k)/C(n,k) via math.comb, mean as a Fraction — the engine's
    float chain must sit within 1e-9 of the exact value, and the k rows
    must use exactly the n >= k task panels."""
    from fractions import Fraction
    from math import comb

    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    ev = _load_pdf(sf_small, "events")
    g = ev.groupby("user_id").agg(
        n=("event_id", "size"),
        c=("event_type", lambda s: int((s == "purchase").sum())),
    )
    rows = {
        r["k"]: r
        for r in registry.QUERIES["eval_pass_at_k"](spark, sf_small).collect()
    }
    for k in (1, 5, 10):
        panel = g[g["n"] >= k]
        exact = sum(
            Fraction(1) - Fraction(comb(n - c, k), comb(n, k))
            if n - c >= k
            else Fraction(1)
            for n, c in zip(panel["n"], panel["c"])
        ) / len(panel)
        assert rows[k]["n_tasks"] == len(panel)
        assert abs(rows[k]["mean_pass_at_k"] - float(exact)) < 1e-9


def test_scrub_loss_matches_python_re(spark, sf_small):
    import re

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.textstats import (
        _PII_EMAIL,
        _PII_PHONE,
    )

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    seeded = [
        (
            src,
            t + f" contact user{d}@example.com or 555-123-4567"
            if d % 3 == 0
            else t,
        )
        for d, t, src in zip(docs["doc_id"], docs["text"], docs["source"])
    ]
    exp: dict = {}
    for src, t in seeded:
        after = re.sub(
            _PII_PHONE, "<PHONE>", re.sub(_PII_EMAIL, "<EMAIL>", t)
        )
        n, before, red, touched = exp.get(src, (0, 0, 0, 0))
        exp[src] = (
            n + 1,
            before + len(t),
            red + len(t) - len(after),
            touched + (len(after) != len(t)),
        )
    rows = registry.QUERIES["pii_scrub_loss_stats"](spark, sf_small).collect()
    assert len(rows) == len(exp)
    for r in rows:
        n, before, red, touched = exp[r["source"]]
        assert (r["n_docs"], r["chars_before"], r["chars_redacted"]) == (
            n, before, red,
        )
        assert r["docs_touched"] == touched


def test_cdc_chunks_census_conservation(spark, sf_small):
    """Chunks PARTITION each document: mean_chunk_len * n_chunks must
    equal the corpus' total text length exactly (the reassembly
    witness), and the census counts must nest."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    docs = _load_pdf(sf_small, "documents")
    total_chars = int(docs["text"].str.len().sum())
    r = registry.QUERIES["dedup_cdc_chunks"](spark, sf_small).collect()[0]
    assert r["n_docs"] == len(docs)
    assert round(r["mean_chunk_len"] * r["n_chunks"]) == total_chars
    assert 0 < r["n_distinct_chunks"] <= r["n_chunks"]
    assert 0 <= r["cross_doc_chunks"] <= r["n_distinct_chunks"]
    assert 0.0 <= r["dup_chunk_share"] < 1.0


def test_onion_layer_algebra(spark, sf_small):
    """Layer chaining: docs_in(k+1) == docs_out(k); cumulative share
    consistent; on a corpus with no exact/canonical dups the near-dup
    layer must remove exactly the registered clusters' non-keepers."""
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    rows = {
        r["layer"]: r
        for r in registry.QUERIES["text_dedup_onion"](
            spark, sf_small
        ).collect()
    }
    l1, l2, l3 = rows["1_exact"], rows["2_normalized"], rows["3_near_dup"]
    n0 = l1["docs_in"]
    assert l2["docs_in"] == l1["docs_out"]
    assert l3["docs_in"] == l2["docs_out"]
    for r in rows.values():
        assert r["docs_out"] == r["docs_in"] - r["docs_removed"]
        assert abs(
            r["cum_removed_share"] - (n0 - r["docs_out"]) / n0
        ) < 1e-12
    if l1["docs_removed"] == 0 and l2["docs_removed"] == 0:
        cl = registry.QUERIES["dedup_clusters"](spark, sf_small).collect()
        non_keepers = sum(1 for r in cl if r["doc_id"] != r["cluster_id"])
        assert l3["docs_removed"] == non_keepers


def test_pq_distortion_matches_numpy(spark, sf_small):
    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.similarity import (
        N_QUERIES,
        PQ_DSUB,
        PQ_K,
        PQ_M,
    )

    registry.load_all()
    emb = _load_pdf(sf_small, "embeddings")
    mat = np.array(list(emb["embedding"]), dtype=np.float64)
    cb = mat[
        (emb["vec_id"] >= N_QUERIES) & (emb["vec_id"] < N_QUERIES + PQ_K)
    ]
    rows = {
        r["subspace"]: r
        for r in registry.QUERIES["sim_pq_distortion"](
            spark, sf_small
        ).collect()
    }
    for m in range(PQ_M):
        sl = slice(m * PQ_DSUB, (m + 1) * PQ_DSUB)
        d = ((mat[:, None, sl] - cb[None, :, sl]) ** 2).sum(axis=2)
        dmin = d.min(axis=1)
        grid = int(np.round(dmin * 1_000_000.0).astype(np.int64).sum())
        r = rows[m]
        assert r["n_vectors"] == len(mat)
        # numpy sums subspace terms in a different order than the pinned
        # left-assoc chain -> per-vector 1-2 ulp wiggle; the 1e-6 grid
        # absorbs it except for exact .5 boundaries, so allow a hair.
        assert abs(r["sq_err_grid"] - grid) <= len(mat)
        assert 1 <= r["n_codes_used"] <= PQ_K


def test_truth_sample_estimator_calibration(spark, sf_small):
    """The Horvitz-Thompson estimate must sit within ~5 sigma of the
    EXACT truth-pair count (Var(est) ~= truth * MOD for a 1/MOD
    Bernoulli sample), and the exact columns must reconcile: the sample
    is a subset of candidates, and candidates are a superset of truth
    (prefix-filter losslessness seen from the estimator's side)."""
    import math

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.dedup import TRUTH_SAMPLE_MOD

    registry.load_all()
    r = registry.QUERIES["dedup_truth_sample_estimate"](
        spark, sf_small
    ).collect()[0]
    truth = registry.QUERIES["dedup_prefix_filter_jaccard"](
        spark, sf_small
    ).count()
    assert r["sample_mod"] == TRUTH_SAMPLE_MOD
    assert 0 <= r["n_sampled"] <= r["n_candidates"]
    assert r["n_true_sampled"] <= r["n_sampled"]
    assert truth <= r["n_candidates"]
    tol = 5.0 * math.sqrt(max(truth, 4) * TRUTH_SAMPLE_MOD)
    assert abs(r["est_true_pairs"] - truth) <= tol
