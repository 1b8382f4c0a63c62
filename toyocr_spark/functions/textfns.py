"""Text-analysis scalar functions: language-ID, quality scoring, token
counting, document fingerprinting — all as JVM-side column expressions
(no UDFs), portable 1:1 to ANSI SQL for oracle verification.

``occurrences`` is the replace-count trick — the only string-counting
primitive both Spark and external SQL engines evaluate identically
(regexp dialects differ; length/replace don't).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# marker-word tables for the n-gram language heuristic; markers are
# space-delimited so they only match whole words after padding
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": (" der ", " und ", " die ", " ist "),
    "en": (" the ", " and ", " of ", " is "),
    "es": (" el ", " los ", " que ", " es "),
    "fr": (" le ", " les ", " et ", " est "),
    "it": (" il ", " che ", " di ", " con "),
    "pt": (" o ", " os ", " que ", " um "),
}


def occurrences(text: Column, sub: str) -> Column:
    """Non-overlapping occurrence count of a literal substring."""
    return (F.length(text) - F.length(F.replace(text, F.lit(sub), F.lit("")))) / len(sub)


def token_count(text: Column) -> Column:
    """Whitespace tokens = single-space count + 1 on non-empty text
    (fixture text is already whitespace-collapsed; raw text callers
    normalize first)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        (occurrences(t, " ") + 1).cast("long")
    )


def quality_features(
    df: DataFrame,
    text_col: str,
    min_chars: int = 80,
    min_tokens: int = 16,
    min_punct: int = 1,
) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a 0/1
    keep flag — the classic pretraining-corpus filter. Integer-ish
    arithmetic only; default thresholds follow C4-style heuristics
    (min_punct=0 for corpora without sentence punctuation)."""
    t = F.col(text_col)
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_stop = sum(occurrences(padded, m) for m in LANG_MARKERS["en"])
    n_punct = occurrences(t, ".") + occurrences(t, ",") + occurrences(t, "!") + occurrences(t, "?")
    mean_tok = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(F.lit(0.0))
    keep = (
        (n_chars >= min_chars)
        & (n_tokens >= min_tokens)
        & (mean_tok >= 2.0)
        & (mean_tok <= 12.0)
        & (n_punct >= min_punct)
    )
    return df.select(
        "*",
        n_chars.cast("long").alias("q_chars"),
        n_tokens.alias("q_tokens"),
        F.round(mean_tok, 4).alias("q_mean_tok_len"),
        n_punct.cast("long").alias("q_punct"),
        n_stop.cast("long").alias("q_stopwords"),
        keep.cast("int").alias("q_keep"),
    )


def lang_id_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Marker-word language ID: per-language marker occurrence counts,
    argmax with deterministic alphabetical tie-break. Adds
    ``lang_pred`` plus one score column per language."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = {
        lang: sum(occurrences(padded, m) for m in markers).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }
    out = df.select("*", *[c.alias(f"score_{lang}") for lang, c in scores.items()])
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    pred = F.lit(None).cast("string")
    # alphabetical scan: first language reaching the max wins (stable)
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    return out.withColumn("lang_pred", F.when(best > 0, pred).otherwise(F.lit("und")))


def bottomk_fingerprint(df: DataFrame, id_col: str, text_col: str, k_shingle: int = 8, k_keep: int = 4) -> DataFrame:
    """Document fingerprint: bottom-k of the md5 char-shingle set,
    concatenated in order — a winnowing-style sketch; equal fingerprints
    => near-identical prefix content. Portable (md5 + string min)."""
    from toyocr_spark.operators.dedup import char_shingles

    sh = char_shingles(df, id_col, text_col, k_shingle).withColumn("h", F.md5(F.col("shingle")))
    w = Window.partitionBy("id").orderBy("h")
    ranked = sh.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k_keep)
    return ranked.groupBy("id").agg(
        F.concat_ws("", F.array_sort(F.collect_list("h"))).alias("fingerprint")
    )


def repetition_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals per document: the repetition
    class of quality filters (Rae et al. 2021 §A1.1) that length/punct
    heuristics (quality_features) cannot see.

    Returns (id, n_words, uniq_word_frac, top_word_frac,
    top_bigram_frac): a machine-generated or boilerplate-looped page has
    a high top-fraction and a low unique fraction. All built-ins —
    split + explode + two-level aggregation (word counts, then per-doc
    max/sum), one shuffle per level, partial aggregation map-side."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.col(text_col)), " ").alias("ws"),
    ).filter(F.size("ws") >= 2)
    # unigram counts
    uni = (
        words.select("id", F.explode("ws").alias("w"))
        .groupBy("id", "w")
        .agg(F.count("*").alias("c"))
    )
    uni_agg = uni.groupBy("id").agg(
        F.sum("c").alias("n_words"),
        F.max("c").alias("top_w"),
        F.count("*").alias("n_uniq"),
    )
    # bigram counts: zip each word with its successor, JVM-side
    bi = (
        words.select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("ws") - 2),
                    lambda i: F.concat_ws(" ", F.col("ws")[i], F.col("ws")[i + 1]),
                )
            ).alias("b"),
        )
        .groupBy("id", "b")
        .agg(F.count("*").alias("c"))
    )
    bi_agg = bi.groupBy("id").agg(F.sum("c").alias("n_bi"), F.max("c").alias("top_b"))
    return uni_agg.join(bi_agg, "id").select(
        "id",
        "n_words",
        F.round(F.col("n_uniq") / F.col("n_words"), 6).alias("uniq_word_frac"),
        F.round(F.col("top_w") / F.col("n_words"), 6).alias("top_word_frac"),
        F.round(F.col("top_b") / F.col("n_bi"), 6).alias("top_bigram_frac"),
    )


GOPHER_STOPWORDS = ("the", "a", "and", "of", "to", "in")


def gopher_rules(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style document filter as a per-rule decision table (Rae
    et al. 2021 §A1.1): each rule's boolean outcome is its own column,
    so a curation run can account attrition per rule instead of only
    seeing the final keep bit.

    Rules (thresholds scaled to the synthetic corpus's 10-100-word
    documents; the published ones assume full web pages):
      r_wordcount  — 20 <= n_words <= 10000
      r_meanlen    — 3 <= mean word length <= 5
      r_repetition — most-common-word fraction <= 0.12
      r_stopwords  — >= 2 stopword occurrences from GOPHER_STOPWORDS
    keep = every rule passes.

    One explode + two-level aggregation (word counts, then per-doc
    sums/max) — one shuffle per level, partial aggregation map-side;
    the same distributed shape as repetition_features."""
    uni = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("w"),
        )
        .groupBy("id", "w")
        .agg(F.count("*").alias("c"))
    )
    agg = uni.groupBy("id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.max("c").alias("top_w"),
        F.sum(F.when(F.col("w").isin(*GOPHER_STOPWORDS), F.col("c")).otherwise(0))
        .cast("long")
        .alias("stop_count"),
        F.sum(F.col("c") * F.length("w")).alias("chars"),
    )
    mean_len = F.col("chars") / F.col("n_words")
    top_frac = F.col("top_w") / F.col("n_words")
    r_wordcount = (F.col("n_words") >= 20) & (F.col("n_words") <= 10000)
    r_meanlen = (mean_len >= 3.0) & (mean_len <= 5.0)
    r_repetition = top_frac <= 0.12
    r_stopwords = F.col("stop_count") >= 2
    as_int = lambda c: c.cast("int")  # noqa: E731
    return agg.select(
        "id",
        "n_words",
        F.round(mean_len, 4).alias("mean_word_len"),
        F.round(top_frac, 6).alias("top_word_frac"),
        "stop_count",
        as_int(r_wordcount).alias("r_wordcount"),
        as_int(r_meanlen).alias("r_meanlen"),
        as_int(r_repetition).alias("r_repetition"),
        as_int(r_stopwords).alias("r_stopwords"),
        as_int(r_wordcount & r_meanlen & r_repetition & r_stopwords).alias("keep"),
    )


def hashed_nb_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: Column,
    dim: int = 64,
) -> DataFrame:
    """fastText/CCNet-style linear quality classifier over hashed word
    features, trained and applied in one integer-exact plan.

    The production pattern (CCNet trains a fastText model on Wikipedia
    vs raw crawl; LLaMA-style pipelines score every page with it):
      fit   — hash each token into ``dim`` buckets, count bucket hits
              per class, derive an add-one-smoothed discriminative
              weight per bucket;
      apply — score every document as the sum of its tokens' bucket
              weights; positive sum => classified into the ``good``
              class.

    Exactness discipline: the usual log-odds weight needs ``ln`` whose
    last-bit rounding differs between engines, so the weight is the
    cross-multiplied NUMERATOR of the smoothed rate difference
        (good_c+1)/(good_total+dim) - (bad_c+1)/(bad_total+dim)
    i.e. ``(good_c+1)*(bad_total+dim) - (bad_c+1)*(good_total+dim)`` —
    a BIGINT, bit-identical on any engine; the shared positive
    denominator cannot change any document's sign or ranking.

    Scale shape: fit is one partial-agg shuffle to ``dim`` rows plus a
    1-row class-total agg (both broadcast back); apply is a broadcast
    join + one partial-agg shuffle per doc. No vocabulary, no Python,
    no floats until the final reported average.

    Returns (id, n_toks, score_num, score, label).
    """
    toks = df.filter(F.length(text_col) > 0).select(
        F.col(id_col).alias("id"),
        label_col.cast("int").alias("good"),
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("word"),
    )
    toks = toks.filter(F.length("word") > 0).withColumn(
        "dim", F.conv(F.substring(F.md5("word"), 1, 4), 16, 10).cast("long") % dim
    )
    dimc = toks.groupBy("dim").agg(
        F.sum("good").cast("long").alias("good_c"),
        F.sum(1 - F.col("good")).cast("long").alias("bad_c"),
    )
    totals = toks.groupBy().agg(
        F.sum("good").cast("long").alias("good_total"),
        F.sum(1 - F.col("good")).cast("long").alias("bad_total"),
    )
    weights = dimc.crossJoin(F.broadcast(totals)).select(
        "dim",
        (
            (F.col("good_c") + 1) * (F.col("bad_total") + dim)
            - (F.col("bad_c") + 1) * (F.col("good_total") + dim)
        ).alias("weight_num"),
    )
    scored = (
        toks.join(F.broadcast(weights), "dim")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_toks"),
            F.sum("weight_num").cast("long").alias("score_num"),
        )
    )
    return scored.select(
        "id",
        "n_toks",
        "score_num",
        F.round(F.col("score_num") / F.col("n_toks"), 4).alias("score"),
        (F.col("score_num") > 0).cast("int").alias("label"),
    )


def c4_rules(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """C4-style document filter as a per-rule decision table (Raffel et
    al. 2020 §2.2, doc-level variant): each rule's boolean outcome is
    its own column for per-rule attrition accounting, mirroring
    gopher_rules.

    Rules (word-count threshold scaled to the synthetic corpus's
    10-100-word documents; C4 filters full pages):
      r_terminal  — document ends in terminal punctuation (. ! ? ")
      r_no_brace  — no '{' (C4 drops pages with code markers)
      r_no_lorem  — no 'lorem ipsum' placeholder text
      r_no_js     — no 'javascript' boilerplate warning
      r_min_words — n_words >= 30
    keep = every rule passes.

    Purely per-row Column expressions — no explode, no shuffle, whole
    plan stays inside one codegen stage (cheaper than gopher_rules's
    two-level agg; the two tables complement each other the way the
    published filters do)."""
    text = F.trim(F.col(text_col))
    n_words = F.size(F.split(text, " ")).cast("long")
    r_terminal = F.substring(text, -1, 1).isin(".", "!", "?", '"')
    r_no_brace = ~text.contains("{")
    r_no_lorem = ~F.lower(text).contains("lorem ipsum")
    r_no_js = ~F.lower(text).contains("javascript")
    r_min_words = n_words >= 30
    as_int = lambda c: c.cast("int")  # noqa: E731
    return df.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"),
        as_int(r_terminal).alias("r_terminal"),
        as_int(r_no_brace).alias("r_no_brace"),
        as_int(r_no_lorem).alias("r_no_lorem"),
        as_int(r_no_js).alias("r_no_js"),
        as_int(r_min_words).alias("r_min_words"),
        as_int(
            r_terminal & r_no_brace & r_no_lorem & r_no_js & r_min_words
        ).alias("keep"),
    )


#: PII patterns kept to char-classes + bounded quantifiers so the Java
#: (Spark) and RE2 (DuckDB) regex engines agree byte-for-byte.
PII_EMAIL_RE = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+[a-zA-Z0-9]"
PII_PHONE_RE = "[+][0-9]{1,2}-[0-9]{3}-[0-9]{4}"
PII_IPV4_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


def pii_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII scrubbing pass (the C4/RefinedWeb-style pre-training
    redaction stage): counts and masks emails, phone numbers, and IPv4
    addresses with fixed placeholder tokens. Redaction order is
    email -> phone -> ip so an address inside an email host can never
    be double-masked; counts are taken on the ORIGINAL text.

    All regexp_extract_all/regexp_replace Column expressions — JVM
    codegen, zero shuffle, no UDF."""
    text = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE,
            "<PHONE>",
        ),
        PII_IPV4_RE,
        "<IP>",
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(text, F.lit(PII_IPV4_RE), 0))
        .cast("long")
        .alias("n_ips"),
        redacted.alias("redacted"),
    )


def phrase_hits(
    df: DataFrame, id_col: str, text_col: str, phrases: list[str]
) -> DataFrame:
    """Multi-phrase occurrence counts: (id, phrase, n_hits) for every
    doc containing a blocklisted word sequence — the C4 §2.2 "bad
    words list" shape generalized to multi-word phrases.

    Scale shape: NEVER a LIKE/contains chain (that is rules x corpus
    regex work with no pushdown). The doc is tokenized once; for each
    phrase LENGTH present in the list (driver-known, tiny) the token
    array is zip-with-shifted into L-grams (linear, the q51 bigram
    trick), and the grams equi-join the broadcast phrase table. Work
    is corpus-linear in tokens x distinct lengths; adding phrases of
    an existing length costs nothing on the corpus side.

    Matching is over whitespace-normalized lowercase word sequences —
    punctuation-adjacent matches are out of scope (same normalization
    as word_vocab/q97, kept deliberately in lockstep).
    """
    spark = df.sparkSession
    norm = [" ".join(p.lower().split()) for p in phrases]
    lengths = sorted({len(p.split()) for p in norm if p})
    ptab = F.broadcast(
        spark.createDataFrame([(p,) for p in norm if p], "phrase string")
    )
    toks = df.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.col(text_col)), r"\s+").alias("w"),
    )
    grams = None
    for L in lengths:
        # docs with fewer than L words emit NO L-grams (a greatest(_, 1)
        # clamp would emit one TRUNCATED gram, which can equal a shorter
        # blocklisted phrase and double-count its n_hits)
        g = toks.filter(F.size("w") >= L).select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - L + 1),
                    lambda i: F.array_join(F.slice("w", i, L), " "),
                )
            ).alias("gram"),
        )
        grams = g if grams is None else grams.unionByName(g)
    if grams is None:
        return spark.createDataFrame([], "id long, phrase string, n_hits long")
    return (
        grams.join(ptab, grams["gram"] == ptab["phrase"])
        .groupBy("id", "phrase")
        .agg(F.count("*").alias("n_hits"))
    )


def drop_blocked_phrases(
    df: DataFrame, id_col: str, text_col: str, phrases: list[str]
) -> DataFrame:
    """Survivors of phrase-blocklist filtering: docs with at least one
    phrase_hits row are dropped (broadcast anti-join on the id)."""
    hits = phrase_hits(df, id_col, text_col, phrases).select("id").distinct()
    return df.join(hits.withColumnRenamed("id", id_col), id_col, "left_anti")


# --- mojibake repair (UTF-8-read-as-windows-1252 double encoding) ----------

# windows-1252 maps bytes 0x80-0x9F to these printable specials; a page
# whose UTF-8 bytes were once decoded as cp1252 shows every UTF-8
# continuation byte in that range as one of them. The five bytes
# cp1252 leaves UNDEFINED (0x81/0x8D/0x8F/0x90/0x9D) surface as C1
# controls under the WHATWG fallback, and Latin-1 already re-encodes
# those correctly, so they need no translation row.
_CP1252_UNDEFINED = (0x81, 0x8D, 0x8F, 0x90, 0x9D)
_CP1252_SPECIALS = "".join(
    bytes([b]).decode("cp1252")
    for b in range(0x80, 0xA0)
    if b not in _CP1252_UNDEFINED
)
_LATIN1_EQUIV = "".join(
    chr(b) for b in range(0x80, 0xA0) if b not in _CP1252_UNDEFINED
)

# detector: the three digram families essentially every Latin-script
# cp1252 misdecode exhibits — 'A-tilde'+continuation-image (2-byte
# sequences U+00C0-U+00FF), 'A-circumflex'+no-break-space-range
# (punctuation U+00A0-U+00BF), and the euro digram opening every
# misdecoded U+20xx punctuation char. A detector, not a proof: the
# roundtrip-validity gate below is what prevents false repairs.
_MOJIBAKE_SIGNATURE = (
    "\u00C3[\u0080-\u00BF\u0152\u0153\u017D\u017E\u0192\u2018-\u2122]"
    "|\u00C2[\u00A0-\u00BF]"
    "|\u00E2\u20AC"
)


def repair_mojibake(text: Column) -> Column:
    """Single-pass ftfy-style repair of UTF-8-decoded-as-cp1252 text,
    entirely JVM-side (translate/encode/is_valid_utf8/cast — no UDF,
    no Python in the hot path).

    The inverse misdecode is re-applied: translate the 27 printable
    cp1252 specials back to the 0x80-0x9F bytes they came from, encode
    as Latin-1 (an exact byte-per-char inverse once every char is
    <= U+00FF), and reinterpret the bytes as UTF-8. Three guards keep
    clean text byte-identical: the signature regex (cheap pre-filter),
    an all-Latin-1-after-translate check (a page with real CJK or
    emoji can never be a cp1252 misdecode image, and Latin-1 encode
    would '?'-substitute it), and ``is_valid_utf8`` on the recovered
    bytes (Spark 4's decode THROWS on malformed input, so validity
    must gate the reinterpretation, and an invalid roundtrip means the
    page was never mojibake). Single-pass by design: doubly-encoded
    pages repair one layer per application, like ftfy's fixers."""
    tr = F.translate(text, _CP1252_SPECIALS, _LATIN1_EQUIV)
    raw = F.encode(tr, "ISO-8859-1")
    looks = text.rlike(_MOJIBAKE_SIGNATURE) & ~tr.rlike("[^\u0000-\u00FF]")
    return F.when(looks & F.is_valid_utf8(raw), raw.cast("string")).otherwise(text)


# --- markdown rendering of the extraction product ---------------------------

def render_markdown(text: Column, spans: Column) -> Column:
    """Serialize an extraction result (extracted_text + kept-block
    spans) as structure-preserving Markdown — the output format most
    LLM-training pipelines persist, since flat text erases the
    heading/list structure the scorer worked to keep. Pure Column
    expression over the already-extracted product (substr + transform
    + array_join, zero Python, zero shuffle): every span slices its
    block out of extracted_text and gains a kind marker — ``## `` for
    title blocks (level is flattened by design: the block model keeps
    kind, not tag depth), ``- `` for list items (each item is its own
    block, a loose list), ``> `` for figure captions; table and plain
    text blocks pass through bare (a flat row-text table re-rendered
    as pipes would fake alignment knowledge the extractor does not
    have). Blocks join with a blank line, the Markdown paragraph
    separator."""
    def one(s):
        prefix = (
            F.when(s["kind"] == "title", F.lit("## "))
            .when(s["kind"] == "list", F.lit("- "))
            .when(s["kind"] == "figure", F.lit("> "))
            .otherwise(F.lit(""))
        )
        body = F.substr(text, (s["start"] + F.lit(1)).cast("int"), (s["end"] - s["start"]).cast("int"))
        return F.concat(prefix, body)

    return F.array_join(F.transform(spans, one), "\n\n")


# --- paragraph-level language segmentation (code-switch splitting) ----------

def lang_segments(
    df: DataFrame, id_col: str, text_col: str, sep: str = "\n\n"
) -> DataFrame:
    """mC4-style code-switch segmentation: split each document into
    paragraphs, language-ID each paragraph with the marker-word
    heuristic, and merge CONSECUTIVE same-language paragraphs into
    segments (the gaps-and-islands shape: a lag-change flag and a
    running sum make the segment index, one window pass). Multilingual
    pages are the rule at crawl scale — a doc-level language label
    mis-routes every minority-language paragraph, so pretraining
    pipelines segment first and route segments. Output: one row per
    (doc, segment) with seg_idx (1-based document order), seg_lang,
    n_paras and seg_text (the paragraphs re-joined with ``sep``).
    All JVM: split/posexplode/window/partial-agg — per-doc state is
    one lag value, shuffles are equi-key on the doc id."""
    import re as _re

    # F.split takes a REGEX but the re-join below uses the literal
    # separator — escape so both sides agree for any sep value
    paras = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias("pidx", "para"),
    ).filter(F.length(F.trim(F.col("para"))) > 0)
    scored = lang_id_scores(paras, "para").select("id", "pidx", "para", "lang_pred")
    win = Window.partitionBy("id").orderBy("pidx")
    chg = F.when(
        F.lag("lang_pred").over(win).isNull()
        | (F.lag("lang_pred").over(win) != F.col("lang_pred")),
        1,
    ).otherwise(0)
    seg = scored.withColumn("seg_idx", F.sum(chg).over(win))
    return (
        seg.groupBy("id", "seg_idx")
        .agg(
            F.min("lang_pred").alias("seg_lang"),  # constant within a segment
            F.count("*").alias("n_paras"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pidx", "para"))),
                    lambda s: s["para"],
                ),
                sep,
            ).alias("seg_text"),
        )
        .select(
            F.col("id"),
            F.col("seg_idx").cast("int").alias("seg_idx"),
            "seg_lang",
            F.col("n_paras").cast("long").alias("n_paras"),
            "seg_text",
        )
    )
