"""Deduplication operators for large-scale training-data pipelines:
exact hash dedup, char-shingle Jaccard, MinHash+LSH, SimHash.

Portability contract: every hash used here is md5-hex (not Spark's
murmur3 ``hash``), so an external ANSI-SQL engine reproduces the exact
values — the same determinism discipline as the extraction kernel.

Scale notes:
  * exact_dedup: one shuffle on the digest; min-id survivor via
    partial+final min.
  * shingle pipeline: explode is linear in total shingles; the
    candidate self-join keys on shingle (or LSH band signature), so
    the shuffle is on the shingle/band space, never a cross join. Hot
    shingles (stopword runs) are the skew axis — min-doc-frequency and
    LSH banding bound them.
  * minhash_lsh: bands*1 signature rows per doc; the band equi-join
    only materializes candidate pairs — the standard sub-quadratic
    near-dup shape at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Default doc-frequency cap for the shingle self-join skew guard: a
# shingle present in more docs than this is boilerplate (cookie-banner
# text, stopword runs) and is dropped BEFORE the pair join — a single
# ubiquitous shingle otherwise emits O(n_docs^2) candidate pairs, the
# one plan shape that goes quadratic on real crawl data. 128 is far
# above any document's organic shingle sharing at the test scales
# (max observed df: 43 @sf0.001, 38 @sf0.01) yet bounds the join fanout
# per shingle at 128^2 pairs regardless of corpus size.
HOT_SHINGLE_DF_CAP = 128


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by md5(text): (digest, keep_id, n_dups).
    Survivor = min id (deterministic). Downstream: semi-join survivors
    back to rows."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col).alias("id"))
        .groupBy("digest")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("n_dups"))
    )


def char_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, by_id: bool = False
) -> DataFrame:
    """Distinct char k-shingles per doc, all JVM-side: positions from
    sequence(), substring() per position. (id, shingle) rows.

    ``by_id=True`` hash-partitions the exploded rows by id BEFORE the
    per-doc dedup: hashpartitioning(id) satisfies the (id, shingle)
    clustering of the dedup AND every downstream per-id aggregation
    (signature/size groupBys), so the whole shingle->aggregate chain
    plans exactly ONE exchange instead of two (guide §2.4: operations
    keyed the same way share one exchange). Same rows either way; use
    it when every consumer aggregates per id."""
    n = F.length(F.col(text_col))
    pos = F.explode(F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))))
    raw = (
        df.filter(n >= k)
        .select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"), pos.alias("p"))
        .select("id", F.substring(F.col("_t"), F.col("p"), k).alias("shingle"))
    )
    if by_id:
        return raw.repartition("id").dropDuplicates(["id", "shingle"])
    return raw.distinct()


def jaccard_pairs(
    shingles: DataFrame,
    min_jaccard: float = 0.0,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Pairwise Jaccard over (id, shingle) rows: self-join on shingle
    (id_a < id_b) -> intersection counts; per-doc sizes joined back;
    jaccard = inter / (na + nb - inter).

    max_doc_freq drops ubiquitous shingles before the join (the skew
    guard: a shingle shared by every doc would emit O(n^2) pairs).

    Shape (r6): the shingle table is localCheckpointed before the cap
    (the doc-frequency aggregate and the semi-join probe both read it —
    previously the explode+dedup subtree recomputed per consumer) and
    again after it (three more consumers: sizes and both pair-join
    sides). The cap itself stays groupBy(shingle) + semi-join: the
    aggregate partial-aggregates map-side (O(1) state for a hot
    boilerplate shingle) and the semi-join's hot probe partitions are
    AQE-skew-splittable — a count-over-window form was tried and
    rejected because a window partitioned by shingle funnels every
    instance of a hot shingle through one task with no AQE escape.
    """
    if max_doc_freq is not None:
        shingles = shingles.localCheckpoint(eager=False)
        freq = shingles.groupBy("shingle").count().filter(F.col("count") <= max_doc_freq)
        shingles = shingles.join(freq.select("shingle"), "shingle", "left_semi")
    shingles = shingles.localCheckpoint(eager=False)
    sizes = shingles.groupBy("id").agg(F.count("*").alias("size"))
    a = shingles.select(F.col("id").alias("id_a"), "shingle")
    b = shingles.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("size").alias("size_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("size").alias("size_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double"),
        )
    )
    return out.filter(F.col("jaccard") >= min_jaccard)


def minhash_band_signatures(shingles: DataFrame, bands: int = 8) -> DataFrame:
    """Portable MinHash: signature(doc, band) = min(md5(band || '|' ||
    shingle)). min over uniformly-hashed strings == classic minhash;
    md5 keeps it engine-portable. One row per (id, band)."""
    band = F.explode(F.sequence(F.lit(0), F.lit(bands - 1)))
    return (
        shingles.select("id", "shingle", band.alias("band"))
        .groupBy("id", "band")
        .agg(F.min(F.md5(F.concat_ws("|", F.col("band"), F.col("shingle")))).alias("sig"))
    )


def minhash_lsh_candidates(signatures: DataFrame) -> DataFrame:
    """Docs sharing any band signature -> distinct candidate pairs.
    The band equi-join is the LSH bucket join."""
    a = signatures.select(F.col("id").alias("id_a"), "band", "sig")
    b = signatures.select(F.col("id").alias("id_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_for_pairs(
    shingles: DataFrame, pairs: DataFrame, min_jaccard: float = 0.0
) -> DataFrame:
    """Exact Jaccard restricted to given candidate pairs — the verify
    stage of LSH. Cost is O(|candidate pairs| x shingles-per-doc), NOT
    the O(shingle^2) full self-join: shingle sets are first semi-joined
    down to candidate ids, then intersected pair-wise through the
    candidate list. At corpus scale this is the whole point of LSH —
    the bucket join proposes, and only proposals pay for verification."""
    ids = pairs.selectExpr("id_a AS id").union(pairs.selectExpr("id_b AS id")).distinct()
    # the semi-joined shingle set feeds three consumers (sizes + both
    # sides of the intersection join); checkpointing it collapses the
    # repeated upstream shingle/semi-join exchanges (~70 -> ~40 stages
    # for the q15 plan) while keeping results bit-identical
    sh = shingles.join(ids, "id", "left_semi").localCheckpoint(eager=False)
    sizes = sh.groupBy("id").agg(F.count("*").alias("size"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("size").alias("size_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("size").alias("size_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double"),
        )
    )
    return out.filter(F.col("jaccard") >= min_jaccard)


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    bands: int = 8,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: shingle -> band signatures -> LSH
    candidates -> exact-Jaccard verification restricted to candidates
    (the canonical candidate-then-verify shape; sub-quadratic end to
    end)."""
    sh = char_shingles(df, id_col, text_col, k, by_id=True)
    cands = minhash_lsh_candidates(minhash_band_signatures(sh, bands))
    return jaccard_for_pairs(sh, cands, min_jaccard=min_jaccard)


def simhash16(df: DataFrame, id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """Portable 16-bit SimHash: per shingle take the first 4 md5 hex
    nibbles (16 bits); per bit sum +-1 over shingles; sign -> bit.
    Near-dups then cluster by hamming distance (bit_count(xor)).

    16 bits keeps the per-bit conditional-aggregate expansion readable
    and portable; the production variant is the same expression shape
    at 64 bits.
    """
    # expression loops as JVM-parsed SQL strings — see simhash64
    sh = char_shingles(df, id_col, text_col, k, by_id=True).withColumn(
        "h", F.conv(F.substring(F.md5(F.col("shingle")), 1, 4), 16, 10).cast("long")
    )
    bit_sums = [
        F.expr(f"sum(CASE WHEN (shiftright(h, {i}) & 1) = 1 THEN 1 ELSE -1 END) AS b{i}")
        for i in range(16)
    ]
    agg = sh.groupBy("id").agg(*bit_sums)
    sim = F.expr(
        "CAST(("
        + " + ".join(f"CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(16))
        + ") AS BIGINT) AS simhash"
    )
    return agg.select("id", sim)


def simhash64(df: DataFrame, id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """Production-width 64-bit SimHash, engine-portable.

    Same expression shape as simhash16 scaled to the first 16 md5 hex
    nibbles, materialized as FOUR 16-bit chunk columns c0..c3 (c0 = most
    significant nibbles) plus a 16-hex-char ``simhash`` string. Chunked
    representation is deliberate:
      * every chunk is a non-negative int < 2^16 — no signed-overflow
        trap at bit 63, identical semantics in any SQL engine;
      * the chunks ARE the LSH bands for banded pairing (4 bands x 16
        bits: any pair within hamming<=3 of 64 shares >=1 exact band —
        pigeonhole), so candidate joins need no bit-shifting at all;
      * hamming(a, b) = sum of bit_count(xor(ci_a, ci_b)).
    At 64 bits the band-bucket space is 2^16 per band (vs 2^4 for the
    16-bit demo), so candidate sets stay sparse at corpus scale.
    One groupBy with 64 conditional sums — a single shuffle, all
    whole-stage-codegen arithmetic.
    """
    # The 64-term conditional-sum / recombine loops are built as SQL
    # strings parsed JVM-side in one roundtrip each: the Column-DSL form
    # cost ~8 py4j roundtrips per term (~0.5 s of driver time per build)
    # for the identical analyzed expressions.
    hhex = F.substring(F.md5(F.col("shingle")), 1, 16)
    sh = char_shingles(df, id_col, text_col, k, by_id=True).withColumn("hhex", hhex)
    chunk_vals = [
        F.expr(f"CAST(conv(substring(hhex, {1 + 4 * j}, 4), 16, 10) AS BIGINT) AS v{j}")
        for j in range(4)
    ]
    hx = sh.select("id", *chunk_vals)
    bit_sums = [
        F.expr(
            f"sum(CASE WHEN (shiftright(v{j}, {i}) & 1) = 1"
            f" THEN 1 ELSE -1 END) AS b{j}_{i}"
        )
        for j in range(4)
        for i in range(16)
    ]
    agg = hx.groupBy("id").agg(*bit_sums)
    chunks = [
        F.expr(
            "CAST(("
            + " + ".join(
                f"CASE WHEN b{j}_{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(16)
            )
            + f") AS BIGINT) AS c{j}"
        )
        for j in range(4)
    ]
    out = agg.select("id", *chunks)
    hex_str = F.expr(
        "concat(" + ", ".join(f"lower(lpad(hex(c{j}), 4, '0'))" for j in range(4)) + ")"
    )
    return out.withColumn("simhash", hex_str)


def _band_side(sim: DataFrame, suffix: str, extra: list[str] | None = None) -> DataFrame:
    """Explode a chunked-band hash frame (id, c0..c3[, extras]) into
    one row per (band, bucket) with the id/chunk columns renamed by
    ``suffix`` — the shared half of every banded-hamming join (text
    simhash, image dHash, audio fingerprint all ride it)."""
    band_val = F.expr("stack(4, 0, c0, 1, c1, 2, c2, 3, c3) AS (band, bucket)")
    banded = sim.select("id", *(extra or []), "c0", "c1", "c2", "c3", band_val)
    return banded.select(
        F.col("id").alias(f"id_{suffix}"),
        *[F.col(e).alias(f"{e}_{suffix}") for e in (extra or [])],
        *[F.col(f"c{j}").alias(f"{suffix}{j}") for j in range(4)],
        "band",
        "bucket",
    )


def _hamming(prefix_a: str, prefix_b: str) -> Column:
    """Sum of per-chunk bit_count(xor) — exact hamming between two
    chunked hashes carried as {prefix}0..{prefix}3 columns."""
    ham = None
    for j in range(4):
        t = F.bit_count(F.col(f"{prefix_a}{j}").bitwiseXOR(F.col(f"{prefix_b}{j}")))
        ham = t if ham is None else ham + t
    return ham


def simhash64_pairs(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Banded near-dup pairing over simhash64 output: equi-join on any
    shared 16-bit chunk (band) proposes candidates — pigeonhole-complete
    for hamming <= 3 of 64 — then exact hamming verifies. Sub-quadratic:
    the shuffle keys on (band, 16-bit bucket), never on pairs.

    The signature table feeds both join sides; checkpointing it runs
    the shingle/signature aggregation once instead of twice (r6 — the
    jaccard_for_pairs discipline; one doc-count-sized materialization)."""
    sim = sim.localCheckpoint(eager=False)
    a = _band_side(sim, "a")
    b = _band_side(sim, "b")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", *[f"a{j}" for j in range(4)], *[f"b{j}" for j in range(4)])
        .distinct()
    )
    return (
        cand.withColumn("hamming", _hamming("a", "b").cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def paragraph_chunks(
    df: DataFrame, id_col: str, text_col: str, words_per_para: int = 12
) -> DataFrame:
    """(id, pos, para) rows: the text split into fixed ``words_per_para``
    word windows, in document order.

    The synthetic corpus has no newline structure, so "paragraph" is a
    fixed word window — the deterministic proxy for CCNet-style line /
    paragraph units (a real crawl would split on ``\\n\\n`` instead; only
    this splitter changes, the dedup shape below is identical). All
    JVM-side: split / slice / array_join, no Python.
    """
    words = F.split(F.col(text_col), " ")
    n_para = F.ceil(F.size(words) / F.lit(float(words_per_para)))
    pos = F.explode(F.sequence(F.lit(0).cast("long"), n_para - 1))
    return (
        df.filter(F.length(text_col) > 0)
        .select(F.col(id_col).alias("id"), words.alias("_w"), pos.alias("pos"))
        .select(
            "id",
            "pos",
            F.array_join(
                F.slice("_w", (F.col("pos") * words_per_para + 1).cast("int"), words_per_para),
                " ",
            ).alias("para"),
        )
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    words_per_para: int = 12,
) -> DataFrame:
    """Corpus-wide paragraph-level dedup (CCNet / "Deduplicating
    Training Data" policy): every repeated paragraph keeps exactly its
    FIRST occurrence — ordered by (doc id, position) — and is dropped
    everywhere else, including later repeats inside the same document.
    Returns one row per input document:
    (doc_id, n_paras, n_kept, text_kept) with the surviving paragraphs
    re-joined in original order ("\\n\\n" separator).

    Scale shape (the reason this is not a window function): first
    occurrence per digest is ``groupBy(digest).agg(min(inst_key))`` — a
    partially-aggregated shuffle that stays O(1) state per digest even
    for a boilerplate paragraph present in every document, where a
    ``row_number() OVER (PARTITION BY digest)`` window would funnel all
    instances of the hot digest through one reducer. The join back is
    1:1 per instance (one keep row per digest). The instance key is an
    orderable ``struct(id, pos)`` — NOT a packed ``id*scale+pos``
    integer, which silently wraps for full-range int64 doc ids (e.g.
    prep_job's xxhash64-derived ids) and can alias ids differing by
    2^58 into one "first occurrence".
    """
    paras = paragraph_chunks(df, id_col, text_col, words_per_para)
    keyed = paras.withColumn("digest", F.md5("para")).withColumn(
        "inst_key", F.struct("id", "pos")
    )
    keep = keyed.groupBy("digest").agg(F.min("inst_key").alias("keep_key"))
    kept = keyed.join(keep, "digest").filter(F.col("inst_key") == F.col("keep_key"))
    totals = keyed.groupBy("id").agg(F.count("*").alias("n_paras"))
    kept_agg = kept.groupBy("id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))), lambda x: x["para"]
            ),
            "\n\n",
        ).alias("text_kept"),
    )
    return (
        totals.join(kept_agg, "id", "left")
        .select(
            F.col("id"),
            F.col("n_paras"),
            F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
            F.coalesce(F.col("text_kept"), F.lit("")).alias("text_kept"),
        )
    )


def duplicate_span_removal(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_words: int = 8,
) -> DataFrame:
    """Substring-level exact dedup ("Deduplicating Training Data Makes
    Language Models Better", Lee et al. 2022 — the ExactSubstr policy,
    window-hash approximation): every duplicated ``k_words``-word window
    keeps exactly its global FIRST occurrence — ordered by (doc id,
    window position) — and every OTHER occurrence marks its covered word
    range for removal. Returns one row per input document:
    (id, n_words, n_dup_wins, n_removed, text_kept).

    This differs from paragraph_dedup in granularity: windows OVERLAP
    (stride 1), so a duplicated passage of any length >= k_words is
    caught regardless of paragraph alignment, and removal is by merged
    word-coverage, not by chunk. Lee et al. use a suffix array for
    arbitrary-length matches; the rolling fixed-k window is the
    standard distributed approximation (k = minimum match length).

    Scale shape (r6 optimization — fewer shuffles, fewer bytes,
    touch-only-affected-docs; results row-identical to the oracle):
      * window hashing is a linear explode (one row per word position),
        materialized ONCE (localCheckpoint) for its two consumers —
        the old plan recomputed the whole explode+md5 subtree for the
        first-occurrence aggregate AND the join probe;
      * digests shuffle as 16-byte BINARY (unhex(md5)) not 32-char hex
        — half the key bytes through every exchange (guide §2.3);
      * first occurrence stays groupBy(digest).min — a PARTIAL
        aggregation, O(1) state per digest even for a boilerplate
        window present in every document, and the join back is
        AQE-skew-splittable. (A min-over-window was tried and
        rejected: one exchange fewer, but a window partitioned by
        digest funnels every instance of a hot digest through one
        task with no AQE escape — the exact hazard paragraph_dedup
        documents.)
      * coverage expansion is a bounded k-fold fanout of DUPLICATE
        windows only, then distinct — equi-key shuffles on (id, wpos);
      * reconstruction (posexplode + anti-join + re-agg, the expensive
        per-token path) runs ONLY for documents that actually lost a
        window: everywhere else split+rejoin is the identity, so
        text_kept falls back to the original text column untouched.
        At crawl scale the duplicated minority pays the token path,
        the clean majority pays nothing.
    All JVM-side (split / slice / md5 / posexplode) — no Python.
    """
    words = F.split(F.col(text_col), " ")
    base = (
        df.filter(F.length(text_col) > 0)
        .select(F.col(id_col).alias("id"), F.col(text_col).alias("_text"), words.alias("w"))
        .withColumn("nw", F.size("w"))
    )
    pos = F.explode(F.sequence(F.lit(0), F.col("nw") - k_words))
    wins = (
        base.filter(F.col("nw") >= k_words)
        .select("id", "w", pos.alias("pos"))
        .select(
            "id",
            "pos",
            F.unhex(
                F.md5(F.array_join(F.slice("w", F.col("pos") + 1, k_words), " "))
            ).alias("digest"),
        )
        .withColumn("inst_key", F.struct("id", "pos"))
    )
    wins = wins.localCheckpoint(eager=False)
    keep = wins.groupBy("digest").agg(F.min("inst_key").alias("keep_key"))
    dup = (
        wins.join(keep, "digest")
        .filter(F.col("inst_key") != F.col("keep_key"))
        .select("id", "pos")
    )
    dup_counts = dup.groupBy("id").agg(F.count("*").alias("n_dup_wins"))
    removed = (
        dup.select(
            "id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + k_words - 1)).alias(
                "wpos"
            ),
        )
        .distinct()
    )
    rm_counts = removed.groupBy("id").agg(F.count("*").alias("n_removed"))
    # reconstruction only where something was removed: for every other
    # document split-then-rejoin on the same delimiter is the identity,
    # so the original text column IS text_kept
    affected = base.join(removed.select("id").distinct(), "id", "left_semi")
    tokens = affected.select("id", F.posexplode("w").alias("wpos", "word"))
    kept = tokens.join(removed, ["id", "wpos"], "left_anti")
    kept_agg = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("wpos", "word"))),
                lambda x: x["word"],
            ),
            " ",
        ).alias("text_kept")
    )
    return (
        base.select("id", "_text", F.col("nw").cast("long").alias("n_words"))
        .join(dup_counts, "id", "left")
        .join(rm_counts, "id", "left")
        .join(kept_agg, "id", "left")
        .select(
            "id",
            "n_words",
            F.coalesce("n_dup_wins", F.lit(0).cast("long")).alias("n_dup_wins"),
            F.coalesce("n_removed", F.lit(0).cast("long")).alias("n_removed"),
            F.when(F.col("n_removed").isNotNull() & (F.col("n_removed") > 0),
                   F.coalesce("text_kept", F.lit("")))
            .otherwise(F.col("_text"))
            .alias("text_kept"),
        )
    )


def ngram_digests(
    df: DataFrame, id_col: str, text_col: str, k_words: int = 8
) -> DataFrame:
    """(id, digest) rows: md5 of every rolling ``k_words``-word window
    (stride 1). The shared primitive under duplicate-span removal and
    benchmark decontamination. Linear explode, all JVM-side."""
    words = F.split(F.col(text_col), " ")
    base = (
        df.filter(F.length(text_col) > 0)
        .select(F.col(id_col).alias("id"), words.alias("w"))
        .withColumn("nw", F.size("w"))
        .filter(F.col("nw") >= k_words)
    )
    pos = F.explode(F.sequence(F.lit(0), F.col("nw") - k_words))
    return base.select("id", "w", pos.alias("p")).select(
        "id",
        F.md5(F.array_join(F.slice("w", F.col("p") + 1, k_words), " ")).alias(
            "digest"
        ),
    )


def contamination_scores(
    df: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    k_words: int = 8,
) -> DataFrame:
    """Benchmark decontamination scores: per corpus document, the
    fraction of its ``k_words``-gram windows that appear anywhere in the
    ``bench`` corpus (same (id, text) shape). Output: (id, n_wins,
    n_hit, contamination). Docs shorter than one window get no row —
    they cannot be measured and cannot leak a k-gram either.

    Scale shape: the benchmark gram set is small by definition and is
    BROADCAST; the corpus side is one linear window explode + equi-join
    on digest — never corpus x benchmark."""
    wins = ngram_digests(df, id_col, text_col, k_words)
    bench_grams = ngram_digests(bench, id_col, text_col, k_words).select(
        "digest"
    ).distinct()
    totals = wins.groupBy("id").agg(F.count("*").alias("n_wins"))
    hits = (
        wins.join(F.broadcast(bench_grams), "digest")
        .groupBy("id")
        .agg(F.count("*").alias("n_hit"))
    )
    return totals.join(hits, "id", "left").select(
        "id",
        "n_wins",
        F.coalesce("n_hit", F.lit(0).cast("long")).alias("n_hit"),
        F.round(
            F.coalesce("n_hit", F.lit(0)) * F.lit(1.0) / F.col("n_wins"), 6
        ).alias("contamination"),
    )


def survivors(df: DataFrame, id_col: str, dup_pairs: DataFrame) -> DataFrame:
    """Resolve pairs to a kept set: drop every id that appears as id_b
    of a pair whose id_a survives transitively. Single-pass
    approximation (min-id wins within each pair chain) — exact for
    clusters where all pairs share the min doc (the common near-dup
    case); full transitive closure is an iterative connected-components
    job, provided separately at cluster scale."""
    doomed = dup_pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(doomed, id_col, "left_anti")


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    max_iters: int = 25,
) -> DataFrame:
    """Near-dup PAIRS -> dedup CLUSTERS: (id, cluster_id) where
    cluster_id = the minimum id reachable through the pair graph.

    Min-label propagation: every node starts labeled with itself; each
    round a node takes the min of its own label and its neighbors'
    labels; converged when a round changes nothing. Rounds needed =
    graph diameter — near-dup clusters are shallow (dups of dups of a
    common source), so single digits in practice; max_iters is the
    runaway bound. Each round is one shuffle (join on the edge key) —
    the standard large-graph CC shape without GraphX, works at any
    corpus size. ``nodes`` supplies singleton docs (no edges) so every
    input row gets a cluster.

    Deterministic: min() is order-free; localCheckpoint truncates the
    lineage each round (iterative-plan hygiene at scale).

    Cost shape (round-2 rework): the edge set is checkpointed ONCE up
    front — without that, every round's join re-executes the entire
    upstream pair-generation plan (shingle explode + self-join), which
    dominated wall clock. The convergence check rides the same
    materialized round result: the previous label is carried as a
    column, so "did anything change" is a filter-count over the
    checkpointed rows — one action per round, no extra join.

    Iteration runs over the EDGE-INCIDENT nodes only: a node with no
    near-dup pair keeps label == id by definition, so singletons (the
    overwhelming majority of a crawl — dup clusters are a small
    fraction of the corpus) never enter a round's join. They are
    attached by one final left join. At 100 TB this is the difference
    between iterating over the corpus and iterating over the dup graph.
    """
    edges = (
        pairs.selectExpr("id_a AS a", "id_b AS b")
        .union(pairs.selectExpr("id_b AS a", "id_a AS b"))
        .distinct()
    ).localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=False)
    )
    from pyspark.sql import Observation

    for it in range(max_iters):
        # pointer jump first (path compression): label <- min(label,
        # label[label]). Both sides of the self-join read the SAME
        # checkpointed label table, and the jump halves the remaining
        # path length each round, so convergence takes O(log diameter)
        # rounds instead of diameter rounds — chain-shaped dup clusters
        # (doc1~doc2~...~docN) no longer cost N shuffle rounds. The
        # fixed point is unchanged: labels only ever hold ids of nodes
        # inside the component, so min over {label, label[label],
        # neighbors' labels} still converges to the component minimum.
        l2 = labels.select(F.col("id").alias("_lid"), F.col("label").alias("_llabel"))
        jumped = labels.join(l2, labels.label == l2._lid, "left").select(
            "id",
            F.col("label").alias("_old"),
            F.least(F.col("label"), F.coalesce("_llabel", "label")).alias("label"),
        )
        neigh = (
            edges.join(jumped, edges.a == jumped.id)
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("label").alias("nlabel"))
        )
        new = jumped.join(neigh, "id", "left").select(
            "id",
            "_old",
            F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
        )
        # convergence rides the checkpoint materialization itself
        # (observe): one action per round instead of checkpoint + a
        # separate filter-count job
        obs = Observation(f"cc-round-{it}")
        new = new.observe(
            obs, F.sum((F.col("label") != F.col("_old")).cast("long")).alias("chg")
        ).localCheckpoint()
        labels = new.select("id", "label")
        if (obs.get["chg"] or 0) == 0:
            break
    return (
        nodes.select(F.col(nodes.columns[0]).alias("id"))
        .distinct()
        .join(labels, "id", "left")
        .select("id", F.coalesce("label", F.col("id")).alias("cluster_id"))
    )


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    iters: int = 3,
    threshold: float = 0.40,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): embedding-space
    near-duplicate removal with the pairwise quadratic bounded by
    clustering. The corpus is partitioned into k-means cells (the
    bit-exact integer trainer, operators/kmeans.py), cosine pairs are
    computed only WITHIN a cell, and a vector is dropped when a
    lower-id cell-mate sits at/above ``threshold`` similarity.
    Returns (vec_id, cid, kept 1|0) for every input vector.

    Scale shape: at 100 TB the cluster count scales with the corpus so
    cells stay bounded (SemDeDup uses ~10-100k clusters for web scale),
    keeping within-cell pairing near-linear — never an all-pairs join.
    The assignment is materialized once (localCheckpoint here; a
    persisted table in production — see kmeans.ivf_write_index) so the
    self-join cannot re-run the trainer per side.

    ``assigned`` (columns id, cid) skips the inline trainer and dedups
    over a PRECOMPUTED cell assignment — the production entry point:
    exact inline assignment costs Θ(N·k), so with k grown ∝ N to keep
    cells bounded the trainer, not the pairing, becomes the quadratic
    term. At scale the assignment comes from a persisted index trained
    offline on a sample (the q75/q127 train-once/search-many
    discipline, with hierarchical/ANN centroid probing making it
    ~N·log k); this operator then stays linear in rows — evidenced by
    tools/scale_probe.py's bounded-cells row."""
    from toyocr_spark.operators.kmeans import kmeans_index
    from toyocr_spark.operators.similarity import _as_double, cosine_pre, l2norm

    if assigned is None:
        # the map-only assignment carries the double vector (iv), so
        # the cell table needs no join back to the corpus at all
        _, afull, _ = kmeans_index(emb, id_col, vec_col, k=n_clusters, iters=iters)
        m = afull.select(
            F.col("id").alias("vec_id"), "cid", F.col("iv").alias("v")
        )
    else:
        v = emb.select(
            F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
        )
        m = assigned.select(F.col("id").alias("vec_id"), "cid").join(v, "vec_id")
    # norm hoisted to one interpreted array fold per VECTOR; the
    # quadratic within-cell path pays only the dot product per pair
    m = m.withColumn("nrm", l2norm(F.col("v"))).localCheckpoint(eager=False)
    a = m.select(
        "cid", F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = m.select(
        "cid", F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    dropped = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine_pre(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")) >= threshold)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("_d", F.lit(1))
    )
    return (
        m.select("vec_id", "cid")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.when(F.col("_d").isNull(), 1).otherwise(0).cast("int").alias("kept"),
        )
    )


def template_strip(
    df: DataFrame,
    id_col: str,
    host_col: str,
    text_col: str,
    words_per_para: int = 8,
    min_host_docs: int = 5,
) -> DataFrame:
    """Site-template removal (the RefinedWeb/CCNet line-dedup policy at
    host scope): a paragraph whose digest appears in at least HALF of a
    host's documents is site furniture (nav text, cookie banner,
    footer) and is stripped from EVERY document of that host —
    including the first occurrence, which distinguishes this from
    ``paragraph_dedup``'s keep-first policy (furniture has no "first"
    worth keeping).

    Shapes at 100 TB: paragraphs are non-overlapping fixed word windows
    (linear explode, the corpus proxy for ``\\n\\n`` units); per-host
    document frequency is ``countDistinct(id)`` partial-aggregated on
    (host, digest); host sizes aggregate to one row per host
    (broadcast-able); the strip itself is a left-anti join on (host,
    digest) against the small template table; integer
    cross-multiplication (``n_docs*2 >= host_docs``) keeps the
    threshold float-free. Nothing funnels through a per-digest window.

    Returns one row per document:
    (id, host, n_paras, n_kept, chars_kept, text_md5) where text_md5
    fingerprints the surviving paragraphs re-joined in document order
    (empty string when everything was furniture).
    """
    base = df.filter(F.length(text_col) > 0).select(
        F.col(id_col).alias("id"), F.col(host_col).alias("host"), F.col(text_col).alias("_t")
    )
    paras = paragraph_chunks(base, "id", "_t", words_per_para)
    hosts = base.select("id", "host")
    # keyed feeds THREE consumers with different grouping keys (tpl,
    # kept, totals) — exchange reuse can't help, so without this the
    # word-window explode recomputes ~3x (measured 27.9s -> <8s at
    # sf0.1). Checkpoint once, the same discipline as semantic_dedup.
    keyed = (
        paras.join(hosts, "id").withColumn("digest", F.md5("para")).localCheckpoint(eager=False)
    )
    host_docs = base.groupBy("host").agg(F.count("*").alias("host_docs"))
    # NO broadcast hints here: host_docs scales with host cardinality
    # (~1e8 hosts in a real crawl) and tpl with hosts x furniture
    # digests — forcing them executor-resident OOMs at 100x. A shuffle
    # join on host / (host, digest) is one partial-agg-sized exchange;
    # AQE still picks broadcast when the side is genuinely small.
    tpl = (
        keyed.groupBy("host", "digest")
        .agg(F.countDistinct("id").alias("n_docs"))
        .join(host_docs, "host")
        .filter(
            (F.col("host_docs") >= min_host_docs)
            & (F.col("n_docs") * 2 >= F.col("host_docs"))
        )
        .select("host", "digest")
    )
    kept = keyed.join(tpl, ["host", "digest"], "left_anti")
    totals = keyed.groupBy("id", "host").agg(F.count("*").alias("n_paras"))
    kept_agg = kept.groupBy("id").agg(
        F.count("*").alias("n_kept"),
        F.sum(F.length("para")).cast("long").alias("chars_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda x: x["para"],
                ),
                "\n\n",
            )
        ).alias("text_md5"),
    )
    return totals.join(kept_agg, "id", "left").select(
        "id",
        "host",
        F.col("n_paras").cast("long").alias("n_paras"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("chars_kept"), F.lit(0)).cast("long").alias("chars_kept"),
        F.coalesce(F.col("text_md5"), F.md5(F.lit(""))).alias("text_md5"),
    )


def neardup_survivors(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Greedy-by-id near-dup ADMISSION over any chunked-band hash frame
    (id, c0..c3) — text simhash, image dHash, or audio fingerprint
    alike: a row survives iff NO row with a smaller id lies within
    ``max_hamming``. Monotone (a row's fate depends only on earlier
    rows, never on their fate), so it parallelizes as pairs + anti-join
    — unlike greedy independent-set admission, which is inherently
    sequential. One banded pairing pass, one anti-join on id."""
    drops = simhash64_pairs(sim, max_hamming).select(F.col("id_b").alias("id"))
    return sim.join(drops, "id", "left_anti")


def banded_neardup_drops(
    seen: DataFrame, incoming: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Distinct ``incoming`` ids having a banded-hamming neighbour of
    strictly smaller ``ord`` anywhere in ``seen`` — the incremental
    (stream-friendly) form of neardup_survivors: ``seen`` is the
    accumulated hash log, ``incoming`` the new micro-batch, and only
    (band, bucket) keys ever shuffle. Both frames carry
    (id, ord, c0..c3); ``ord`` may be any orderable type (long,
    struct(seq, id), ...) defining arrival order."""
    a = _band_side(seen, "a", extra=["ord"])
    b = _band_side(incoming, "b", extra=["ord"])
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("ord_a") < F.col("ord_b"))
        .select("id_b", *[f"a{j}" for j in range(4)], *[f"b{j}" for j in range(4)])
        .distinct()
    )
    return (
        cand.filter(_hamming("a", "b") <= max_hamming)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
