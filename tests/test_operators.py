"""Direct unit tests for the operator library (DataFrame-in/out, small
hand-computed fixtures — the SURVEY.md §5 strategy)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from toyocr_spark.operators.dedup import exact_dedup, minhash_lsh_dedup, simhash16, survivors
from toyocr_spark.operators.islands import gap_islands
from toyocr_spark.operators.occupancy import occupancy_projection
from toyocr_spark.operators.rangejoin import (
    bucketed_overlap_join,
    greedy_iou_match,
    interval_overlap_join,
    mutual_first_match,
    overlap_anti_join,
)
from toyocr_spark.operators.selection import local_max_filter, threshold_filter, topk_per_group
from toyocr_spark.operators.evalagg import global_pr_hmean, pr_hmean
from toyocr_spark.operators.similarity import (
    brute_force_cosine_topk,
    bucketed_cosine_topk,
    recall_at_k,
)


def test_threshold_filter_pushdown(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = threshold_filter(li.select("l_orderkey", "l_quantity"), "l_quantity", 45.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_quantity" in plan, "filter must reach the scan"
    assert out.filter(F.col("l_quantity") <= 45.0).count() == 0


def test_topk_per_group_strict_k(spark):
    df = spark.createDataFrame(
        [("a", i, float(i % 3)) for i in range(10)] + [("b", 99, 5.0)],
        "g string, id int, v double",
    )
    out = topk_per_group(df, ["g"], [F.col("v").desc(), F.col("id").asc()], 2)
    rows = {(r["g"], r["id"]) for r in out.collect()}
    assert rows == {("a", 2), ("a", 5), ("b", 99)}


def test_local_max(spark):
    # values 1,3,2,5,4 -> local maxima at 3 and 5
    df = spark.createDataFrame(
        [("u", i, v) for i, v in enumerate([1.0, 3.0, 2.0, 5.0, 4.0])],
        "g string, pos int, v double",
    )
    out = local_max_filter(df, ["g"], "pos", "v")
    assert sorted(r["pos"] for r in out.collect()) == [1, 3]


def test_gap_islands_hand_case(spark):
    # gaps: 0-10-20 | 100-110 | 500  with gap threshold 50
    df = spark.createDataFrame(
        [("u", t) for t in [0, 10, 20, 100, 110, 500]], "k string, t long"
    )
    out = gap_islands(df, ["k"], "t", gap=50, agg={"n": F.count("*"), "lo": F.min("t")})
    got = sorted((r["island_id"], r["n"], r["lo"]) for r in out.collect())
    assert got == [(0, 3, 0), (1, 2, 100), (2, 1, 500)]


def test_interval_overlap_join_iou(spark):
    a = spark.createDataFrame([("k", 0, 10)], "k string, start long, end long")
    b = spark.createDataFrame(
        [("k", 5, 15), ("k", 20, 30)], "k string, start long, end long"
    )
    out = interval_overlap_join(a, b, ["k"]).collect()
    assert len(out) == 1
    assert out[0]["overlap"] == 5 and abs(out[0]["iou"] - 5 / 15) < 1e-12


def test_overlap_anti_join(spark):
    det = spark.createDataFrame(
        [("k", 1, 0, 10), ("k", 2, 100, 110)], "k string, id int, start long, end long"
    )
    dc = spark.createDataFrame([("k", 0, 9)], "k string, start long, end long")
    # det1 overlaps dc with fraction 0.9 > 0.5 -> dropped; det2 survives
    out = overlap_anti_join(det, dc, ["k"], 0.5)
    assert [r["id"] for r in out.collect()] == [2]


def test_greedy_iou_match_one_to_one(spark):
    gt = spark.createDataFrame(
        [("k", 0, 0, 10), ("k", 1, 0, 10)], "k string, gt_idx int, start long, end long"
    )
    det = spark.createDataFrame(
        [("k", 0, 0, 10), ("k", 1, 1, 11)], "k string, det_idx int, start long, end long"
    )
    out = greedy_iou_match(gt, det, ["k"], 0.5).collect()
    pairs = sorted((r["gt_idx"], r["det_idx"]) for r in out)
    # exact greedy in index order: gt0-det0, gt1-det1 (det0 already used)
    assert pairs == [(0, 0), (1, 1)]
    # the declarative mutual-first variant under-matches here by design:
    # det1's first choice gt0 discards it in pass 2
    mf = sorted(
        (r["gt_idx"], r["det_idx"]) for r in mutual_first_match(gt, det, ["k"], 0.5).collect()
    )
    assert mf == [(0, 0)]


def test_bucketed_overlap_join_no_dup_pairs(spark):
    a = spark.createDataFrame([(1, 0, 250)], "id int, start long, end long")
    b = spark.createDataFrame([(2, 100, 400)], "id2 int, start long, end long")
    out = bucketed_overlap_join(a, b, bucket_width=100)
    assert out.count() == 1  # spans 3 shared buckets but dedups to one pair


def test_occupancy_projection(spark):
    df = spark.createDataFrame([(0, 10), (5, 12), (30, 31)], "s long, e long")
    out = {r["bucket"]: r["weight"] for r in occupancy_projection(df, "s", "e", 10).collect()}
    # [0,10) -> bucket 0; [5,12) -> buckets 0,1; [30,31) -> bucket 3
    assert out == {0: 2, 1: 1, 3: 1}


def test_pr_hmean_zero_guards(spark):
    df = spark.createDataFrame(
        [("g1", 1, 1, 1), ("g2", 0, 0, 0)], "g string, m int, gt int, det int"
    )
    out = pr_hmean(df, ["g"], F.col("m"), F.col("gt"), F.col("det"))
    got = {r["g"]: (r["precision"], r["recall"], r["hmean"]) for r in out.collect()}
    assert got["g1"] == (1.0, 1.0, 1.0)
    assert got["g2"] == (0.0, 1.0, 0.0)  # the reference's empty-GT convention
    g = global_pr_hmean(out).collect()[0]
    assert g["precision"] == 1.0 and g["recall"] == 1.0


def test_exact_dedup_and_survivors(spark):
    df = spark.createDataFrame(
        [(1, "xx"), (2, "xx"), (3, "yy")], "doc_id long, text string"
    )
    groups = exact_dedup(df, "doc_id", "text")
    got = {r["keep_id"]: r["n_dups"] for r in groups.collect()}
    assert got == {1: 2, 3: 1}
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    kept = survivors(df, "doc_id", pairs)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]


def test_minhash_lsh_finds_near_identical(spark):
    base = "the quick brown fox jumps over the lazy dog and keeps running onward"
    df = spark.createDataFrame(
        [(1, base), (2, base + " x"), (3, "completely different content entirely here")],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_dedup(df, "doc_id", "text", k=8, bands=8, min_jaccard=0.5)
    got = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    assert got == [(1, 2)]


def test_simhash_close_for_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog and keeps running onward"
    df = spark.createDataFrame(
        [(1, base), (2, base + " x"), (3, "zzz qqq completely unrelated words vvv www yyy")],
        "doc_id long, text string",
    )
    out = {r["id"]: r["simhash"] for r in simhash16(df, "doc_id", "text").collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(out[1], out[2]) < ham(out[1], out[3])


def test_ann_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 4)
    exact = brute_force_cosine_topk(emb, q, 5)
    approx = bucketed_cosine_topk(emb, q, 5, bits=2)
    rec = recall_at_k(approx, exact)
    rows = rec.collect()
    assert len(rows) == 4
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)


def test_broadcast_join_in_plan(spark, sf_dir):
    from toyocr_spark.queries import QUERIES

    df = QUERIES["q11_region_revenue"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "dim joins must broadcast"


def test_skew_safe_topk_matches_naive(spark):
    """Two-phase salted top-K must be row-identical to the naive
    single-window form, on data with one pathologically hot key."""
    import random

    from toyocr_spark.operators.selection import skew_safe_topk, topk_per_group

    rng = random.Random(3)
    rows = [("hot", i, rng.randint(0, 10_000)) for i in range(5000)]
    rows += [(f"cold{j}", j * 100 + i, rng.randint(0, 10_000)) for j in range(20) for i in range(10)]
    df = spark.createDataFrame(rows, "key: string, rid: long, score: long")

    from pyspark.sql import functions as F

    naive = topk_per_group(
        df, ["key"], [F.col("score").desc(), F.col("rid").asc()], 7
    ).select("key", "rid", "score", "rk")
    safe = skew_safe_topk(df, ["key"], "score", 7, tiebreak_col="rid").select(
        "key", "rid", "score", "rk"
    )
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, safe.collect()))


def test_approx_sketches_tolerance(spark, sf_dir):
    """q35's driver check IS the tolerance test (sketch_ok must be
    true everywhere for the oracle hash to match); independently
    re-verify here that the exact columns it certifies against are
    right: exact_orders == countDistinct and the rank-selected
    exact_q sits within one interpolation step of Spark's exact
    percentile()."""
    from pyspark.sql import functions as F

    from toyocr_spark.queries import QUERIES

    rows = QUERIES["q35_approx_sketches"].spark(spark, sf_dir).collect()
    assert rows and all(r["sketch_ok"] for r in rows), rows
    exact_orders = {r["l_returnflag"]: r["exact_orders"] for r in rows}
    exact_q = {(r["l_returnflag"], r["p"]): r["exact_q"] for r in rows}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ref = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))").alias("qs"),
        )
        .collect()
    }
    assert set(exact_orders) == set(ref)
    for k, e in ref.items():
        assert exact_orders[k] == e["orders"]
        for p, qe in zip([0.5, 0.95, 0.99], e["qs"]):
            # rank selection (lower neighbour) vs interpolated exact:
            # within a hair of one inter-row gap
            assert abs(exact_q[(k, p)] - qe) <= max(10.0, 0.01 * qe)


def test_hot_shingle_cap_bounds_pairs_and_is_noop_when_cold(spark):
    """The df cap must (a) drop a boilerplate shingle shared by every
    doc BEFORE the pair join (the O(n^2) scale-killer: cookie-banner
    text), and (b) change nothing when no shingle is hot — the sf-small
    guarantee the oracle parity relies on."""
    from toyocr_spark.operators.dedup import char_shingles, jaccard_pairs

    # 40 docs sharing one 8-char boilerplate prefix, otherwise disjoint
    # (md5-hex bodies share no 8-gram)
    import hashlib

    rows = [
        (i, "COOKIES!" + hashlib.md5(str(i).encode()).hexdigest())
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    sh = char_shingles(df, "doc_id", "t", 8)
    capped = jaccard_pairs(sh, min_jaccard=0.0, max_doc_freq=8)
    uncapped = jaccard_pairs(sh, min_jaccard=0.0)
    # uncapped: the shared prefix alone links every pair -> 40*39/2
    assert uncapped.count() == 780
    # pure-Python oracle of the capped semantics: drop shingles with
    # df > 8, pair docs with any remaining shared shingle
    shingle_sets = {
        i: {t[p : p + 8] for p in range(len(t) - 7)} for i, t in rows
    }
    df_count: dict[str, int] = {}
    for s in shingle_sets.values():
        for g in s:
            df_count[g] = df_count.get(g, 0) + 1
    kept = {i: {g for g in s if df_count[g] <= 8} for i, s in shingle_sets.items()}
    expected = {
        (a, b)
        for a in kept
        for b in kept
        if a < b and kept[a] & kept[b]
    }
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == expected
    # the hot-shingle all-pairs explosion is gone
    assert len(got) < 100

    # cold corpus (every shingle df=1..2): cap is a provable no-op
    rows2 = [(1, "abcdefghij"), (2, "abcdefghij"), (3, "zzzzzzzzzz")]
    df2 = spark.createDataFrame(rows2, "doc_id long, t string")
    sh2 = char_shingles(df2, "doc_id", "t", 8)
    a = sorted(tuple(r) for r in jaccard_pairs(sh2, 0.0, max_doc_freq=8).collect())
    b = sorted(tuple(r) for r in jaccard_pairs(sh2, 0.0).collect())
    assert a == b and len(a) == 1


def test_skew_safe_topk_rejects_degenerate_salt(spark):
    """tiebreak_col seeds the salt; a group key (constant within each
    group) would collapse every hot-key row into one salt bucket."""
    from toyocr_spark.operators.selection import skew_safe_topk

    df = spark.createDataFrame([("a", 1, 1.0)], "key string, rid int, score double")
    with pytest.raises(ValueError, match="group key"):
        skew_safe_topk(df, ["key"], "score", 3, tiebreak_col="key")
    with pytest.raises(TypeError):
        skew_safe_topk(df, ["key"], "score", 3)  # tiebreak_col required


def test_simhash64_width_and_banding(spark):
    """64-bit SimHash: chunks reconstruct the hex string, near-dups are
    closer than unrelated docs, and banded pairing finds exactly the
    pairs within the hamming budget (pigeonhole completeness)."""
    from toyocr_spark.operators.dedup import simhash64, simhash64_pairs

    base = "the quick brown fox jumps over the lazy dog and keeps running onward"
    df = spark.createDataFrame(
        [(1, base), (2, base + " x"), (3, "zzz qqq completely unrelated words vvv www yyy")],
        "doc_id long, text string",
    )
    sim = simhash64(df, "doc_id", "text")
    rows = {r["id"]: r for r in sim.collect()}
    for r in rows.values():
        assert r["simhash"] == "".join(f"{r[f'c{j}']:04x}" for j in range(4))
        assert all(0 <= r[f"c{j}"] < 1 << 16 for j in range(4))

    def ham(a, b):
        return sum(bin(a[f"c{j}"] ^ b[f"c{j}"]).count("1") for j in range(4))

    assert ham(rows[1], rows[2]) < ham(rows[1], rows[3])
    # banded pairing == brute force at any threshold the bands guarantee
    budget = max(3, ham(rows[1], rows[2]))  # ensure at least one pair
    if budget > 3:
        # widen bands' guarantee? no — verify only the <=3 contract
        budget = 3
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash64_pairs(sim, budget).collect()}
    brute = {
        (a, b): ham(rows[a], rows[b])
        for a in rows
        for b in rows
        if a < b and ham(rows[a], rows[b]) <= budget
    }
    assert got == brute


def test_paragraph_dedup_first_occurrence_policy(spark):
    from toyocr_spark.operators.dedup import paragraph_dedup

    # 3-word "paragraphs" for the hand case. Doc 1 owns chunk A and
    # repeats it internally; doc 2 repeats A (dropped, doc 1 is first)
    # then has its own chunk B; doc 3 is all-boilerplate (everything
    # dropped -> empty survivor text, still one output row).
    A = "aa bb cc"
    B = "dd ee ff"
    df = spark.createDataFrame(
        [(1, f"{A} {A}"), (2, f"{A} {B}"), (3, A)],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in paragraph_dedup(df, "doc_id", "text", words_per_para=3).collect()
    }
    assert out[1]["n_paras"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["text_kept"] == A  # internal repeat dropped too
    assert out[2]["n_paras"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["text_kept"] == B
    assert out[3]["n_paras"] == 1 and out[3]["n_kept"] == 0
    assert out[3]["text_kept"] == ""


def test_duplicate_span_removal_matches_python_model(spark):
    """Differential check of the distributed plan against a transparent
    single-process model of the same policy, over a corpus engineered
    for the tricky shapes: cross-doc repeats, in-doc repeats, overlap
    chains, short docs, and a boilerplate window present everywhere."""
    import random

    from toyocr_spark.operators.dedup import duplicate_span_removal

    rng = random.Random(7)
    k = 3
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> dense collisions
    docs = []
    for i in range(40):
        n = rng.randint(1, 20)
        words = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.3:
            words[0:3] = ["bp1", "bp2", "bp3"]  # shared boilerplate head
        docs.append((i, " ".join(words)))

    # python model: first occurrence of each k-window survives globally
    first: dict[tuple, tuple] = {}
    for i, text in docs:
        ws = text.split(" ")
        for p in range(len(ws) - k + 1):
            key = tuple(ws[p : p + k])
            if key not in first:
                first[key] = (i, p)
    expected = {}
    for i, text in docs:
        ws = text.split(" ")
        removed = set()
        n_dup = 0
        for p in range(len(ws) - k + 1):
            if first[tuple(ws[p : p + k])] != (i, p):
                n_dup += 1
                removed.update(range(p, p + k))
        kept = " ".join(w for j, w in enumerate(ws) if j not in removed)
        expected[i] = (len(ws), n_dup, len(removed), kept)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: (r["n_words"], r["n_dup_wins"], r["n_removed"], r["text_kept"])
        for r in duplicate_span_removal(df, "doc_id", "text", k_words=k).collect()
    }
    assert got == expected


def test_phrase_retrieval_positions(spark):
    from toyocr_spark.operators.textindex import phrase_retrieve

    # doc 1: phrase twice; doc 2: words present but never adjacent;
    # doc 3: phrase once at the end; doc 4: reversed order only.
    df = spark.createDataFrame(
        [
            (1, "big table hash x big table hash"),
            (2, "table x hash table y hash"),
            (3, "z z table hash"),
            (4, "hash table"),
        ],
        "doc_id long, text string",
    )
    rows = phrase_retrieve(df, "doc_id", "text", ["table", "hash"], k=10).collect()
    got = {r["id"]: (r["rk"], r["n_hits"]) for r in rows}
    assert got == {1: (1, 2), 3: (2, 1)}
    # three-term phrase crosses two join legs
    rows3 = phrase_retrieve(df, "doc_id", "text", ["big", "table", "hash"], k=10).collect()
    assert {r["id"]: r["n_hits"] for r in rows3} == {1: 2}


def test_normalized_dedup_collapses_case_and_punct(spark):
    from pyspark.sql import functions as F
    from toyocr_spark.queries import _NORM_STRIP

    df = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello world"),
            (3, "HELLO WORLD."),
            (4, "different text"),
        ],
        "doc_id long, text string",
    )
    digest = F.md5(F.lower(F.translate(F.col("text"), _NORM_STRIP, "")))
    groups = (
        df.select(digest.alias("digest"), F.col("doc_id").alias("id"))
        .groupBy("digest")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("n_dups"))
        .collect()
    )
    by_keep = {r["keep_id"]: r["n_dups"] for r in groups}
    assert by_keep == {1: 3, 4: 1}


def test_duplicate_span_removal_policy(spark):
    from toyocr_spark.operators.dedup import duplicate_span_removal

    # k=3 word windows for the hand case. Doc 1 is the first occurrence
    # of the passage "a b c d" (windows "a b c" and "b c d") and keeps
    # everything. Doc 2 repeats the passage mid-document: both its
    # windows are non-first occurrences, so the 4 covered words drop and
    # only the unique flanks survive. Doc 3 is too short for a window
    # (2 words) and passes through untouched. Doc 4 duplicates doc 1
    # exactly -> fully removed.
    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "x1 x2 a b c d y1 y2"),
            (3, "a b"),
            (4, "a b c d"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in duplicate_span_removal(df, "doc_id", "text", k_words=3).collect()
    }
    assert out[1]["n_removed"] == 0 and out[1]["text_kept"] == "a b c d"
    assert out[2]["n_dup_wins"] == 2
    assert out[2]["n_removed"] == 4
    assert out[2]["text_kept"] == "x1 x2 y1 y2"
    assert out[3]["n_dup_wins"] == 0 and out[3]["text_kept"] == "a b"
    assert out[4]["n_removed"] == 4 and out[4]["text_kept"] == ""
    # overlapping duplicate windows must merge, not double-count
    assert out[2]["n_words"] == 8


def test_bloom_no_false_negatives_and_probe_agreement(spark):
    from toyocr_spark.operators.bloom import bloom_build, bloom_maybe_seen, with_bloom_verdict

    df = spark.range(500).select(
        F.col("id"), F.concat(F.lit("k-"), F.col("id").cast("string")).alias("key")
    )
    members = df.filter(F.col("id") % 3 == 0)
    for m_bits in (1 << 13, 256):  # roomy and saturated
        bloom = bloom_build(members, F.col("key"), m_bits=m_bits, k=5)
        joined = {
            r["id"]: r["maybe_seen"]
            for r in bloom_maybe_seen(df, "id", F.col("key"), bloom, m_bits=m_bits, k=5).collect()
        }
        mapped = {
            r["id"]: r["maybe_seen"]
            for r in with_bloom_verdict(df, F.col("key"), bloom, m_bits=m_bits, k=5).collect()
        }
        # the two probe implementations are the same filter
        assert joined == mapped
        # no false negatives, ever
        assert all(joined[i] for i in range(0, 500, 3))
    # near-saturated bloom (835 probes into 256 bits -> expected FP rate
    # (1-e^{-835/256})^5 ~ 0.8): most non-members must flip to yes,
    # proving the probes read real bits rather than actual membership
    non_members = [i for i in range(500) if i % 3 != 0]
    fp = sum(1 for i in non_members if mapped[i])
    assert fp > len(non_members) // 2


def test_kmeans_separates_clusters_and_is_integer_exact(spark):
    from toyocr_spark.operators.kmeans import kmeans_fit

    # group A near 0, group B near 100; seeds are ids 0 and 1 (both in
    # A — Lloyd must still pull one centroid over to B by round 3)
    rows = [
        (0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [1.0, 1.0]),
        (3, [100.0, 100.0]), (4, [101.0, 99.0]), (5, [99.0, 101.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["id"]: r for r in kmeans_fit(df, "vec_id", "embedding", k=2, iters=3).collect()}
    a = {got[i]["cid"] for i in (0, 1, 2)}
    b = {got[i]["cid"] for i in (3, 4, 5)}
    assert len(a) == 1 and len(b) == 1 and a != b
    # distances are exact integers of the scaled space: member 2 sits
    # sqrt(2) * 1e6 fixed-point units from the (0.33..,0.33..)-floor
    # centroid -- just assert exactness-critical invariants instead of
    # hand-deriving: nonnegative, and byte-stable across a re-run
    again = {r["id"]: r for r in kmeans_fit(df, "vec_id", "embedding", k=2, iters=3).collect()}
    assert {i: (r["cid"], r["dist"]) for i, r in got.items()} == {
        i: (r["cid"], r["dist"]) for i, r in again.items()
    }
    assert all(r["dist"] >= 0 for r in got.values())


def test_ivf_recall_against_brute_force(spark, sf_dir):
    from toyocr_spark.operators.kmeans import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 4)
    exact = brute_force_cosine_topk(emb, q, 5)
    approx = ivf_topk(emb, q, k=5, nprobe=2)
    rows = recall_at_k(approx, exact).collect()
    assert len(rows) == 4
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
    # probing 2 of 8 lists on clusterable data should beat coin-flip recall
    assert sum(r["recall"] for r in rows) / len(rows) >= 0.4


def test_first_occurrence_exact_for_full_range_int64_ids(spark):
    """Regression (round-2 ADVICE): first-occurrence ordering used an
    id * 1e6 + pos packed int64 key, which silently WRAPS for
    full-range doc ids (prep_job derives ids via xxhash64 — huge or
    negative), aliasing ids that differ by ~2^58. The struct(id, pos)
    key must order exactly: the lowest (id, pos) wins — here the large
    NEGATIVE id, which the packed key would have mangled."""
    from toyocr_spark.operators.dedup import duplicate_span_removal, paragraph_dedup

    A = "aa bb cc"
    neg = -(2**62) - 12345     # xxhash64-style ids: full int64 range
    pos_id = 2**62 + 777
    df = spark.createDataFrame(
        [(pos_id, A), (neg, A)], "doc_id long, text string"
    )
    out = {r["id"]: r for r in paragraph_dedup(df, "doc_id", "text", words_per_para=3).collect()}
    assert out[neg]["n_kept"] == 1 and out[neg]["text_kept"] == A
    assert out[pos_id]["n_kept"] == 0 and out[pos_id]["text_kept"] == ""

    txt = "w0 w1 w2 w3"
    df2 = spark.createDataFrame([(pos_id, txt), (neg, txt)], "doc_id long, text string")
    out2 = {r["id"]: r for r in duplicate_span_removal(df2, "doc_id", "text", k_words=3).collect()}
    assert out2[neg]["n_removed"] == 0 and out2[neg]["text_kept"] == txt
    assert out2[pos_id]["n_removed"] == 4 and out2[pos_id]["text_kept"] == ""


def test_ivf_recall_monotone_in_nprobe(spark, sf_dir):
    """q74: recall@5 must be non-decreasing in nprobe, and probing all
    n_centroids cells IS brute force — recall exactly 1.0 at nprobe=8."""
    from toyocr_spark.queries import QUERIES

    rows = sorted(
        (r["nprobe"], r["hits"] / r["n_exact"], r["candidates_touched"])
        for r in QUERIES["q74_ivf_recall_curve"].spark(spark, sf_dir).collect()
    )
    recalls = [r[1] for r in rows]
    cands = [r[2] for r in rows]
    assert recalls == sorted(recalls), f"recall not monotone: {rows}"
    assert rows[-1][0] == 8 and rows[-1][1] == 1.0
    assert cands == sorted(cands) and cands[0] < cands[-1]


def test_gopher_rules_split_and_consistency(spark, sf_dir):
    """q82: the decision table must actually discriminate on this
    corpus (both keep classes present, every individual rule fires
    both ways somewhere) and keep == AND of the rule columns."""
    from toyocr_spark.queries import QUERIES

    rows = QUERIES["q82_gopher_rules"].spark(spark, sf_dir).collect()
    assert rows
    keeps = {r["keep"] for r in rows}
    assert keeps == {0, 1}, "degenerate keep split"
    for rule in ("r_wordcount", "r_meanlen", "r_repetition", "r_stopwords"):
        assert {r[rule] for r in rows} == {0, 1}, f"degenerate rule {rule}"
    for r in rows:
        assert r["keep"] == (
            r["r_wordcount"] & r["r_meanlen"] & r["r_repetition"] & r["r_stopwords"]
        )


def test_quality_classifier_separates_distinct_vocabularies(spark):
    from toyocr_spark.functions.textfns import hashed_nb_classifier

    # two classes with class-specific vocabularies plus shared filler —
    # the CCNet Wikipedia-vs-crawl shape with an actual learnable
    # signal (the sf documents table's labels are deliberately near-
    # independent of its ~40-word vocabulary, so separation is asserted
    # here, on a corpus where a correct fit MUST separate)
    import random

    rng = random.Random(7)
    good_v = [f"wiki{i}" for i in range(20)]
    bad_v = [f"spam{i}" for i in range(20)]
    shared = [f"word{i}" for i in range(20)]
    rows = []
    for i in range(80):
        good = i % 2 == 0
        own = good_v if good else bad_v
        words = [rng.choice(own if j % 2 == 0 else shared) for j in range(30)]
        rows.append((i, 1 if good else 0, " ".join(words)))
    df = spark.createDataFrame(rows, "id long, good int, text string")
    out = hashed_nb_classifier(df, "id", "text", F.col("good") == 1, dim=256)
    joined = out.join(df.select("id", "good"), "id").collect()
    acc = sum(1 for r in joined if r["label"] == r["good"]) / len(joined)
    assert acc >= 0.95, f"in-sample accuracy {acc}"
    # integer-exactness: score_num is a BIGINT reproducible bit-for-bit
    again = {
        r["id"]: r["score_num"]
        for r in hashed_nb_classifier(df, "id", "text", F.col("good") == 1, dim=256).collect()
    }
    assert all(again[r["id"]] == r["score_num"] for r in joined)


def test_lang_mix_sample_hits_balanced_target(spark, sf_dir):
    from toyocr_spark.queries import q84_lang_mix_sample

    rows = q84_lang_mix_sample(spark, sf_dir).collect()
    target = rows[0]["target"]
    assert all(r["target"] == target for r in rows)
    for r in rows:
        assert r["n_kept"] <= r["n_docs"]
        # md5-bucket admission is binomial around the target rate
        assert 0.5 * target <= r["n_kept"] <= 1.5 * target, r
    # the smallest language is kept (almost) whole
    smallest = min(rows, key=lambda r: r["n_docs"])
    assert smallest["n_kept"] >= 0.9 * smallest["n_docs"]


def test_template_strip_drops_banner_everywhere(spark):
    from toyocr_spark.operators.dedup import template_strip

    banner = "one two three four"
    rows = [
        (i, "a", f"{banner} u{i} v{i} w{i} x{i}") for i in range(6)
    ] + [  # host below min_host_docs: nothing stripped even though shared
        (10 + i, "b", f"{banner} y{i} z{i} p{i} q{i}") for i in range(3)
    ]
    df = spark.createDataFrame(rows, "id long, host string, text string")
    out = {
        r["id"]: r
        for r in template_strip(df, "id", "host", "text", words_per_para=4).collect()
    }
    for i in range(6):  # host a: banner para stripped from EVERY doc
        assert out[i]["n_paras"] == 2 and out[i]["n_kept"] == 1, out[i]
    for i in range(3):  # host b (3 docs < 5): kept whole
        assert out[10 + i]["n_kept"] == out[10 + i]["n_paras"] == 2
    # a doc that is ALL furniture survives with n_kept = 0 and md5('')
    allb = spark.createDataFrame(
        [(i, "c", banner) for i in range(6)], "id long, host string, text string"
    )
    r0 = template_strip(allb, "id", "host", "text", words_per_para=4).collect()[0]
    assert r0["n_kept"] == 0 and r0["chars_kept"] == 0
    import hashlib

    assert r0["text_md5"] == hashlib.md5(b"").hexdigest()


def test_robots_rules_parse_and_admission(spark):
    from toyocr_spark.functions.urlfns import parse_robots_rules, robots_admission

    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /private\nDisallow:\n# note"),
            ("b.com", "Disallow: /x\nDisallow: /y/z"),
        ],
        "host string, txt string",
    )
    rules = parse_robots_rules(robots, "host", "txt")
    got = {(r["host"], r["prefix"]) for r in rules.collect()}
    # the empty Disallow and the comment line must not become rules
    assert got == {("a.com", "/private"), ("b.com", "/x"), ("b.com", "/y/z")}

    urls = spark.createDataFrame(
        [
            ("a.com", "/private/doc"),   # blocked (prefix)
            ("a.com", "/public"),        # allowed
            ("b.com", "/y/zebra"),       # blocked (/y/z prefix)
            ("b.com", "/y/a"),           # allowed
            ("c.com", "/private/doc"),   # no rules for host: allowed
        ],
        "host string, path string",
    )
    verdicts = {
        (r["host"], r["path"]): r["blocked"]
        for r in robots_admission(urls, rules).collect()
    }
    assert verdicts == {
        ("a.com", "/private/doc"): 1,
        ("a.com", "/public"): 0,
        ("b.com", "/y/zebra"): 1,
        ("b.com", "/y/a"): 0,
        ("c.com", "/private/doc"): 0,
    }


def test_phrase_hits_and_drop(spark):
    from pyspark.sql import functions as F

    from toyocr_spark.functions.textfns import drop_blocked_phrases, phrase_hits

    df = spark.createDataFrame(
        [
            (1, "the sort merge join wins"),
            (2, "Sort  Merge twice: sort merge again"),  # case+whitespace
            (3, "a batch batch batch storm"),
            (4, "merge sort is a different phrase"),
            (5, "so"),  # shorter than any phrase
        ],
        "doc_id long, text string",
    )
    phrases = ["sort merge", "batch batch batch", "click here"]
    hits = {
        (r["id"], r["phrase"]): r["n_hits"]
        for r in phrase_hits(df, "doc_id", "text", phrases).collect()
    }
    assert hits == {
        (1, "sort merge"): 1,
        (2, "sort merge"): 2,
        (3, "batch batch batch"): 1,
    }
    kept = sorted(
        r["doc_id"]
        for r in drop_blocked_phrases(df, "doc_id", "text", phrases).collect()
    )
    assert kept == [4, 5]
    # a doc SHORTER than a phrase length must emit no truncated gram:
    # with a greatest(_, 1) clamp, doc 6's lone word would surface as
    # a truncated 2-gram equal to the 1-word phrase "click" and
    # double-count its n_hits (1 from the 1-grams + 1 truncated)
    short = spark.createDataFrame([(6, "click")], "doc_id long, text string")
    short_hits = {
        (r["id"], r["phrase"]): r["n_hits"]
        for r in phrase_hits(short, "doc_id", "text", ["click here", "click"]).collect()
    }
    assert short_hits == {(6, "click"): 1}
    # phrase table is broadcast: no shuffle Exchange on the corpus side
    plan = (
        phrase_hits(df, "doc_id", "text", phrases)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_gale_church_reference_properties():
    """align_lengths: identical sides give all-1-1 at ~zero cost; a
    planted 2-1 merge is recovered; beads always tile both sides
    exactly in order; empty sides produce pure insertion/deletion
    beads. (Deletion beads are intentionally rare in the published
    model: match(l, 0) is expensive, so merges win unless a side is
    empty — faithful Gale-Church.)"""
    from toyocr_spark.operators.bitext import align_lengths

    a = [50, 70, 40, 60, 80, 30]
    same = align_lengths(a, a)
    assert [(s[1], s[3]) for s in same] == [(1, 1)] * 6
    assert all(s[4] <= 5 for s in same)  # near-zero centi-cost

    b = [52, 69, 101, 82, 29]  # merges a[2]+a[3]
    beads = align_lengths(a, b)
    assert [(s[1], s[3]) for s in beads] == [(1, 1), (1, 1), (2, 1), (1, 1), (1, 1)]

    # tiling invariant on a ragged case
    b2 = [120, 41, 59, 81, 29]
    beads2 = align_lengths(a, b2)
    ai = bi = 0
    for _, al, _, bl, _ in [(s[0], s[1], s[2], s[3], s[4]) for s in beads2]:
        ai += al
        bi += bl
    assert (ai, bi) == (len(a), len(b2))

    assert [(s[1], s[3]) for s in align_lengths([], [5])] == [(0, 1)]
    assert [(s[1], s[3]) for s in align_lengths([7, 9], [])] == [(1, 0), (1, 0)]
    assert align_lengths([], []) == []


def test_gale_church_beads_spark_kernel(spark):
    """The mapInArrow kernel reproduces the pure-Python reference
    bead-for-bead and stays map-only (no Exchange in the plan)."""
    from toyocr_spark.operators.bitext import align_lengths, gale_church_beads

    rows = [
        (1, 101, [50, 70, 40, 60, 80, 30], [52, 69, 101, 82, 29]),
        (2, 102, [30, 30, 30], [31, 29, 30]),
        (3, 103, [], [40]),
    ]
    df = spark.createDataFrame(
        rows, "id_a long, id_b long, lens_a array<int>, lens_b array<int>"
    )
    got = [
        (r.id_a, r.id_b, r.a_start, r.a_len, r.b_start, r.b_len, r.cost_centi)
        for r in gale_church_beads(df).orderBy("id_a", "a_start", "b_start").collect()
    ]
    want = []
    for id_a, id_b, la, lb in rows:
        for s in align_lengths(la, lb):
            want.append((id_a, id_b, *s))
    assert got == sorted(want, key=lambda t: (t[0], t[2], t[4]))
    plan = gale_church_beads(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_q116_planted_families_match_closed_form():
    """THE q116 oracle proof: for every planted pair the pure-Python DP
    returns exactly the closed-form beads the driver's SQL oracle
    emits — so the oracle never re-implements the DP (no erfc in
    DuckDB) yet the driver hash check is a full-value check. Families:
    0 = equal lengths (all-1-1, cost 0); 1/2 = exact pairwise merges
    (all-2-1 / all-1-2, penalty-only 23000 centi: delta = 0 ->
    erfc(0) = 1 -> match cost exactly 0); 3 = one (small,large) <->
    (large,small) swap pinned between equal anchor runs (a single 2-2
    at 44000 — the anchors make every shifted pairing strictly more
    expensive than the swap penalty)."""
    from toyocr_spark.operators.bitext import align_lengths

    def planted(id_a):
        fam = id_a % 4
        anchor = lambda i: 20 + (id_a * 7 + i * 13) % 40  # noqa: E731
        if fam == 0:
            n = 5 + id_a % 7
            la = [anchor(i) for i in range(n)]
            return la, list(la), [(i, 1, i, 1, 0) for i in range(n)]
        m = 3 + id_a % 5
        if fam == 1:
            la = [15 + (id_a * 5 + i * 11) % 30 for i in range(2 * m)]
            lb = [la[2 * j] + la[2 * j + 1] for j in range(m)]
            return la, lb, [(2 * j, 2, j, 1, 23000) for j in range(m)]
        if fam == 2:
            lb = [15 + (id_a * 3 + i * 7) % 30 for i in range(2 * m)]
            la = [lb[2 * j] + lb[2 * j + 1] for j in range(m)]
            return la, lb, [(j, 1, 2 * j, 2, 23000) for j in range(m)]
        n_post = 3 + id_a % 3
        p, q = 8 + id_a % 5, 70 + id_a % 9
        pre = [anchor(i) for i in range(3)]
        post = [anchor(3 + i) for i in range(n_post)]
        la, lb = pre + [p, q] + post, pre + [q, p] + post
        beads = [(i, 1, i, 1, 0) for i in range(3)]
        beads.append((3, 2, 3, 2, 44000))
        beads += [(5 + i, 1, 5 + i, 1, 0) for i in range(n_post)]
        return la, lb, beads

    for id_a in range(80):
        la, lb, want = planted(id_a)
        assert align_lengths(la, lb) == want, id_a


def test_pq_adc_search_properties(spark, sf_dir):
    """Product quantization (q126): codebook/codes shapes, ADC identity
    (a candidate's ADC distance == the sum of its 8 per-subspace
    table entries — checked independently of the join machinery),
    exactness on the quantized representative itself, and usable
    recall of ADC top-5 against the exact-distance top-5."""
    from toyocr_spark.operators.pq import pq_adc_topk, pq_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    codebook, codes = pq_train(emb, m_sub=8, ksub=16, iters=2, dim=64)
    cb = {(r["sub"], r["scid"]): r["scv"] for r in codebook.collect()}
    cd = {}
    for r in codes.collect():
        cd.setdefault(r["id"], {})[r["sub"]] = r["scid"]
    n = emb.count()
    assert len(cd) == n and all(len(v) == 8 for v in cd.values())
    assert len(cb) <= 8 * 16 and len({s for s, _ in cb}) == 8

    q = emb.filter(F.col("vec_id") < 8)
    out = {
        (r["query_id"], r["rank"]): (r["item_id"], r["adc_dist"])
        for r in pq_adc_topk(q, codebook, codes, k=5).collect()
    }
    assert len(out) == 8 * 5

    # independent ADC recomputation from raw vectors + the collected
    # codebook/codes (pure Python, no Spark joins)
    scale = 1_000_000
    import math

    vecs = {
        r["vec_id"]: [math.floor(float(x) * scale) for x in r["embedding"]]
        for r in emb.collect()
    }
    def adc(qid, iid):
        total = 0
        for s in range(8):
            qsub = vecs[qid][s * 8 : s * 8 + 8]
            cv = cb[(s, cd[iid][s])]
            total += sum((a - b) * (a - b) for a, b in zip(qsub, cv))
        return total

    for (qid, rank), (iid, dist) in out.items():
        assert adc(qid, iid) == dist, (qid, rank, iid)

    # the distributed top-k must equal the full pure-Python ADC
    # ranking (operator correctness, independent of quantization
    # quality — the fixture embeddings are near-random, PQ's worst
    # case, so exact-top-5 recall is NOT a sound assertion here)
    for qid in range(8):
        full = sorted((adc(qid, i), i) for i in vecs if i != qid)
        want = [i for _, i in full[:5]]
        got = [out[(qid, r)][0] for r in range(1, 6)]
        assert got == want, (qid, got, want)

    # quality smoke: even on unstructured vectors, the exact nearest
    # neighbour should usually sit inside the ADC top-50 shortlist
    # (the re-rank window an IVF-PQ deployment would scan)
    found = 0
    for qid in range(8):
        exact1 = min(
            (sum((a - b) * (a - b) for a, b in zip(vecs[qid], vecs[i])), i)
            for i in vecs if i != qid
        )[1]
        shortlist = {i for _, i in sorted((adc(qid, i), i) for i in vecs if i != qid)[:50]}
        found += exact1 in shortlist
    assert found >= 6, found


def test_ivf_pq_composition(spark, sf_dir):
    """q127: the composed IVF-PQ result must equal 'PQ-ADC ranking
    restricted to the probed coarse cells' computed independently in
    pure Python from the collected index artifacts — i.e. the
    composition adds exactly candidate restriction and nothing else."""
    import math

    from pyspark.sql import functions as F

    from toyocr_spark.operators.kmeans import kmeans_index
    from toyocr_spark.operators.pq import ivf_pq_topk, pq_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids, assigned, _ = kmeans_index(emb, "vec_id", "embedding", k=8, iters=3)
    codebook, codes = pq_train(emb, m_sub=8, ksub=16, iters=2, dim=64)
    q = emb.filter(F.col("vec_id") < 8)
    out = {
        (r["query_id"], r["rank"]): (r["item_id"], r["adc_dist"])
        for r in ivf_pq_topk(
            q, centroids, assigned, codebook, codes, k=5, nprobe=2
        ).collect()
    }

    scale = 1_000_000
    vecs = {
        r["vec_id"]: [math.floor(float(x) * scale) for x in r["embedding"]]
        for r in emb.collect()
    }
    cv = {r["cid"]: r["cv"] for r in centroids.collect()}
    cell = {r["id"]: r["cid"] for r in assigned.collect()}
    cb = {(r["sub"], r["scid"]): r["scv"] for r in codebook.collect()}
    cd = {}
    for r in codes.collect():
        cd.setdefault(r["id"], {})[r["sub"]] = r["scid"]

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def adc(qid, iid):
        return sum(
            l2(vecs[qid][s * 8 : s * 8 + 8], cb[(s, cd[iid][s])]) for s in range(8)
        )

    for qid in range(8):
        probed = {c for _, c in sorted((l2(vecs[qid], cv[c]), c) for c in cv)[:2]}
        cands = [i for i in vecs if i != qid and cell[i] in probed]
        want = sorted((adc(qid, i), i) for i in cands)[:5]
        got = [out[(qid, r)] for r in range(1, 6) if (qid, r) in out]
        assert [(i, d) for d, i in want] == got, (qid, got, want)


def test_semantic_dedup_precomputed_assignment_matches_inline(spark, sf_dir):
    """The production entry point (assigned= from a persisted offline
    index) must be pure routing: handing semantic_dedup the inline
    trainer's OWN assignment reproduces the inline result exactly, and
    a bounded-cell bucket assignment is accepted as-is (every cid in
    the output is the one supplied)."""
    from toyocr_spark.operators.dedup import semantic_dedup
    from toyocr_spark.operators.kmeans import kmeans_fit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    inline = semantic_dedup(emb, threshold=0.40)
    pre = kmeans_fit(emb, "vec_id", "embedding", k=8, iters=3)
    routed = semantic_dedup(emb, threshold=0.40, assigned=pre)
    assert sorted(map(tuple, inline.collect())) == sorted(map(tuple, routed.collect()))

    buckets = emb.select(
        F.col("vec_id").alias("id"), F.pmod("vec_id", F.lit(16)).alias("cid")
    )
    out = semantic_dedup(emb, threshold=0.40, assigned=buckets).collect()
    assert len(out) == emb.count()
    assert all(r["cid"] == r["vec_id"] % 16 for r in out)


def test_repair_mojibake_literal_pins(spark):
    """Known-answer pins for the cp1252 double-encoding repair: the
    mojibake form and its clean recovery are EXPLICIT literals (typed,
    not produced by any codec call), so a shared table bug between the
    fixture path and the operator's translate table cannot fake a
    pass. Guards: clean non-ASCII stays byte-identical, CJK text
    carrying the em-dash digram is refused (Latin-1 encode would
    '?'-substitute it), and an invalid roundtrip (lone lead byte
    image) is refused rather than corrupted."""
    from pyspark.sql import functions as F

    from toyocr_spark.functions.textfns import repair_mojibake

    clean = "caf\u00e9 \u2014 \u201cna\u00efve\u00bb\u2026 Gr\u00fc\u00dfe"
    moji = (
        "caf\u00c3\u00a9 \u00e2\u20ac\u201d \u00e2\u20ac\u0153na\u00c3\u00afve"
        "\u00c2\u00bb\u00e2\u20ac\u00a6 Gr\u00c3\u00bc\u00c3\u0178e"
    )
    cases = [
        (moji, clean),  # the repair
        (clean, clean),  # already clean: byte-identical
        ("plain ascii", "plain ascii"),
        # CJK + mojibake digram: signature fires, Latin-1 guard refuses
        ("\u771f\u00b7mixed \u00e2\u20ac\u201d text", "\u771f\u00b7mixed \u00e2\u20ac\u201d text"),
        # 'A-tilde' + space = invalid UTF-8 roundtrip: refused
        ("bad pair \u00c3=\u00c3", "bad pair \u00c3=\u00c3"),
        # double mojibake repairs ONE layer per pass (the ftfy contract)
        (
            "caf\u00c3\u0083\u00c2\u00a9",
            "caf\u00c3\u00a9",
        ),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "t string")
    got = [r.r for r in df.select(repair_mojibake(F.col("t")).alias("r")).collect()]
    want = [w for _, w in cases]
    assert got == want


def test_render_markdown_all_kinds(spark):
    """render_markdown over a hand-built extraction product: every
    block kind gets its documented marker (## title, - list, > figure,
    bare text/table), blocks join with a blank line, and span slicing
    is exact (the SEP byte between blocks never leaks into a slice)."""
    from pyspark.sql import functions as F

    from toyocr_spark.functions.textfns import render_markdown

    text = "Head\nBody para\nitem one\nr1 c1 r1 c2\ncaption"
    spans = [
        (0, 4, "title"),
        (5, 14, "text"),
        (15, 23, "list"),
        (24, 35, "table"),
        (36, 43, "figure"),
    ]
    df = spark.createDataFrame(
        [(text, spans)],
        "extracted_text string, spans array<struct<start:bigint,end:bigint,kind:string>>",
    )
    got = df.select(
        render_markdown(F.col("extracted_text"), F.col("spans")).alias("md")
    ).collect()[0].md
    assert got == (
        "## Head\n\nBody para\n\n- item one\n\nr1 c1 r1 c2\n\n> caption"
    )
    # empty spans -> empty markdown, not NULL
    empty = spark.createDataFrame(
        [("", [])],
        "extracted_text string, spans array<struct<start:bigint,end:bigint,kind:string>>",
    )
    assert empty.select(
        render_markdown(F.col("extracted_text"), F.col("spans")).alias("md")
    ).collect()[0].md == ""


def test_textrank_hub_word_wins(spark, sf_dir):
    """TextRank semantics on a planted star graph: a document whose
    every bigram passes through one hub word must rank the hub first
    (it receives contributions from every spoke), and per-doc ranks
    must conserve probability mass up to integer-division drift
    (sum of ranks within n of the 10^12 scale)."""
    from pyspark.sql import functions as F

    from toyocr_spark.queries import QUERIES

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [
                (0, "hub alpha hub beta hub gamma hub delta"),
                (1, "x y"),
            ],
            "doc_id long, text string",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        out = QUERIES["q175_textrank_keywords"].spark(spark, td)
        rows = out.collect()
        top0 = [r for r in rows if r.doc_id == 0 and r.rn == 1][0]
        assert top0.word == "hub"
        # doc 1: two words, symmetric graph -> identical ranks, tie
        # broken by word order
        d1 = sorted([r for r in rows if r.doc_id == 1], key=lambda r: r.rn)
        assert [r.word for r in d1] == ["x", "y"]
        assert d1[0].rank_scaled == d1[1].rank_scaled
        assert d1[0].rank_scaled + d1[1].rank_scaled <= 10**12
        assert d1[0].rank_scaled + d1[1].rank_scaled >= 10**12 - 4


def test_lang_segments_islands(spark):
    """lang_segments merges CONSECUTIVE same-language paragraphs only:
    an A-B-A language sandwich yields three segments (never two), a
    single-language doc yields one, and markerless paragraphs segment
    as 'und' rather than inheriting a neighbour's language."""
    from toyocr_spark.functions.textfns import lang_segments

    en = "the cat and the dog is near the door of the house"
    de = "der hund und die katze ist im haus und der baum"
    docs = spark.createDataFrame(
        [
            (0, en + "\n\n" + de + "\n\n" + en),
            (1, en + "\n\n" + en + "\n\n" + en),
            (2, en + "\n\n" + "zzz qqq 123" + "\n\n" + en),
        ],
        "doc_id long, body string",
    )
    out = lang_segments(docs, "doc_id", "body")
    rows = sorted(
        [(r.id, r.seg_idx, r.seg_lang, r.n_paras) for r in out.collect()]
    )
    assert rows == [
        (0, 1, "en", 1),
        (0, 2, "de", 1),
        (0, 3, "en", 1),
        (1, 1, "en", 3),
        (2, 1, "en", 1),
        (2, 2, "und", 1),
        (2, 3, "en", 1),
    ]
    # re-joined text preserves paragraph order within a segment
    seg1 = [r for r in out.collect() if r.id == 1][0]
    assert seg1.seg_text == en + "\n\n" + en + "\n\n" + en


def test_crawl_budget_sums_exactly(spark, sf_dir):
    """Largest-remainder apportionment: allocations sum to the budget
    EXACTLY (the property float-proportional splits cannot give), and
    allocation is monotone in weight up to the +1 remainder slot."""
    from toyocr_spark.queries import QUERIES

    rows = QUERIES["q177_crawl_budget"].spark(spark, sf_dir).collect()
    assert sum(r.pages_allocated for r in rows) == 10000
    by_w = sorted(rows, key=lambda r: (r.weight, r.host))
    for lo, hi in zip(by_w, by_w[1:]):
        assert hi.pages_allocated >= lo.pages_allocated - 1


def test_host_disjoint_split_no_leakage(spark):
    """The property that makes the split leakage-safe: every page of a
    domain (all subdomains included) lands in exactly ONE split, and
    the assignment is deterministic across sessions/calls. Checked on
    the raw assignment grain, not the aggregated report."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"sub{i % 5}.site-{i % 23}.example") for i in range(500)],
        "doc_id long, host string",
    )
    domain = F.substring_index(F.col("host"), ".", -2)
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("split1|"), domain)), 1, 4), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    a = docs.select(domain.alias("domain"), split.alias("split"))
    per_domain = a.groupBy("domain").agg(F.countDistinct("split").alias("k")).collect()
    assert all(r.k == 1 for r in per_domain)
    # deterministic across evaluations
    one = {(r.domain, r.split) for r in a.distinct().collect()}
    two = {(r.domain, r.split) for r in a.distinct().collect()}
    assert one == two


def test_revalidation_from_state_equals_batch(spark):
    """The one streaming state log answers both freshness questions:
    revalidation_from_state over ANY time-ordered segmentation of the
    observations equals revalidation_report over the full history
    (n_not_modified is the complement of the folded change count)."""
    from toyocr_spark.operators.recrawl import (
        change_segment,
        revalidation_from_state,
        revalidation_report,
    )

    rows = []
    for u in range(12):
        p = 1 + u % 6
        for t in range(6):
            rows.append((f"u{u}", t, f"d{t // p}"))
    obs = spark.createDataFrame(rows, "url string, snap_t long, digest string")
    batch = {
        (r.url, r.n_caps, r.n_not_modified)
        for r in revalidation_report(obs).collect()
    }
    segs = change_segment(obs.filter("snap_t < 2"), 0).unionByName(
        change_segment(obs.filter("snap_t >= 2 and snap_t < 5"), 1)
    ).unionByName(change_segment(obs.filter("snap_t >= 5"), 2))
    from_state = {
        (r.url, r.n_caps, r.n_not_modified)
        for r in revalidation_from_state(segs).collect()
    }
    assert from_state == batch
