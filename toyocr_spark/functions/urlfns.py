"""URL canonicalization and outlink resolution — JVM-side Column
expressions only (no UDFs), so Catalyst folds them into the scan
projection and they cost one codegen stage at any scale.

Crawl-side operators the reference has no analogue for (it consumes
pre-keyed image ids); in a web corpus they are the first dedup lever:
the same page is crawled under scheme/host case variants, default
ports, tracking parameters and fragments, and canonical-URL dedup
removes that class of duplicates for the price of a projection —
before any content hashing runs.

Portability note (oracle parity): built from substring_index / split /
array_sort / filter — string ops with identical semantics in DuckDB
(split_part / string_split / list_sort / list_filter), no regex.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# query parameters that never identify content (tracking noise)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref_src")
TRACKING_PREFIX = "utm_"

def _BIG() -> Column:  # "to end of string" length for substring; lazy
    return F.lit(1 << 30)  # (F.lit needs an active session at call time)


def _drop_tracking(params: Column) -> Column:
    """Filter an array of 'k=v' strings: drop empties, utm_* and known
    click ids; sort for order-independence."""
    name = lambda p: F.substring_index(p, "=", 1)  # noqa: E731
    return F.array_sort(
        F.filter(
            params,
            lambda p: (p != "")
            & (F.substring(name(p), 1, len(TRACKING_PREFIX)) != TRACKING_PREFIX)
            & ~name(p).isin(*TRACKING_PARAMS),
        )
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, strip default port and
    'www.' prefix, strip fragment, drop tracking params, sort the rest.
    Path case and trailing slashes are preserved (content-significant)."""
    u = F.substring_index(url, "#", 1)  # fragment never reaches the server
    scheme = F.lower(F.substring_index(u, "://", 1))
    rest = F.substring(u, F.length(scheme) + 4, _BIG())
    hostport = F.substring_index(rest, "/", 1)
    path_q = F.substring(rest, F.length(hostport) + 1, _BIG())
    host = F.lower(F.substring_index(hostport, ":", 1))
    host = F.when(F.substring(host, 1, 4) == "www.", F.substring(host, 5, _BIG())).otherwise(host)
    port = F.when(F.instr(hostport, ":") > 0, F.substring_index(hostport, ":", -1)).otherwise(F.lit(""))
    default_port = ((scheme == "https") & (port == "443")) | ((scheme == "http") & (port == "80"))
    port_part = F.when((port == "") | default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port))
    path = F.substring_index(path_q, "?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.when(F.instr(path_q, "?") > 0, F.substring(path_q, F.instr(path_q, "?") + 1, _BIG())).otherwise(
        F.lit("")
    )
    kept = _drop_tracking(F.split(qs, "&"))
    q_part = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_part, path, q_part)


def resolve_link(base_root: Column, base_dir: Column, link: Column) -> Column:
    """Resolve an href against its page: absolute stays, '/path' joins
    the site root, relative joins the page directory; fragment-only
    links resolve to NULL (caller filters)."""
    return (
        F.when(F.substring(link, 1, 1) == "#", F.lit(None).cast("string"))
        .when(F.instr(link, "://") > 0, link)
        .when(F.substring(link, 1, 1) == "/", F.concat(base_root, link))
        .otherwise(F.concat(base_dir, link))
    )


def host_suffixes(host: Column) -> Column:
    """Array of the host's dot-suffix chain: 'a.b.example' ->
    ['a.b.example', 'b.example', 'example']. Bounded by label depth;
    the explode side of registrable-domain blocklist matching."""
    parts = F.split(host, "\\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, i, F.size(parts)), "."),
    )


def surt_key(canonical_url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key of a
    CANONICAL url — the Common-Crawl-index key shape: reversed host
    components joined by commas, a non-default port kept after the
    host, then ')' + path?query. 'https://a.host-1.example/p?x=1' ->
    'example,host-1,a)/p?x=1'. Feed canonicalize_url output; the
    scheme is dropped (http/https collapse to one capture key) and
    host-order reversal makes a plain lexicographic sort cluster every
    host and registrable domain contiguously — the property the CDX
    sort/range-scan layout rides on."""
    rest = F.substring_index(canonical_url, "://", -1)
    hostport = F.substring_index(rest, "/", 1)
    pathq = F.substring(rest, F.length(hostport) + 1, _BIG())
    host = F.substring_index(hostport, ":", 1)
    port_part = F.when(
        F.instr(hostport, ":") > 0,
        F.concat(F.lit(":"), F.substring_index(hostport, ":", -1)),
    ).otherwise(F.lit(""))
    rev = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    return F.concat(rev, port_part, F.lit(")"), pathq)


def drop_blocked_hosts(df, host_col: str, blocklist) -> "DataFrame":  # noqa: F821
    """Survivors of domain-suffix blocklist filtering: rows whose host
    (or any parent domain of it) appears in ``blocklist`` (a DataFrame
    with one ``host`` column) are dropped.

    Matching is case-insensitive (DNS hosts are): both the host's
    suffix chain and the blocklist entries are lowercased before the
    join, so ``Ads.Example.com`` cannot escape a lowercase
    ``ads.example.com`` (or ``example.com``) entry.

    Scale shape: each host explodes its bounded suffix chain and
    equi-joins the BROADCAST blocklist — O(rows x labels), never the
    O(rows x rules) of a LIKE/endswith scan per blocklist entry."""
    sfx = df.select(
        F.col(host_col).alias("_h"),
        F.explode(host_suffixes(F.lower(F.col(host_col)))).alias("_s"),
    )
    blocked_hosts = (
        sfx.join(
            F.broadcast(blocklist.select(F.lower(F.col("host")).alias("_s"))),
            "_s",
            "left_semi",
        )
        .select("_h")
        .distinct()
    )
    return df.join(
        blocked_hosts.select(F.col("_h").alias(host_col)), host_col, "left_anti"
    )


def parse_robots_rules(robots: "DataFrame", host_col: str, txt_col: str) -> "DataFrame":  # noqa: F821
    """(host, robots_txt) -> (host, prefix) Disallow rules.

    Minimal robots.txt subset (the part a crawl admission filter
    enforces): newline-split, one ``Disallow: <path-prefix>`` rule per
    matching line; empty Disallow values (= allow all) are dropped.
    User-agent groups are out of scope — rules are taken as applying to
    ``*``, which is the conservative reading for a generic crawler.
    Pure string ops (split/explode/substring), portable 1:1 to SQL.
    """
    from pyspark.sql import DataFrame  # noqa: F401 (typing only)

    line = F.explode(F.split(F.col(txt_col), "\n")).alias("line")
    rules = robots.select(F.col(host_col).alias("host"), line)
    marker = "Disallow: "
    return (
        rules.filter(F.substring(F.col("line"), 1, len(marker)) == marker)
        .select(
            "host",
            F.trim(F.substring(F.col("line"), len(marker) + 1, _BIG())).alias("prefix"),
        )
        .filter(F.length("prefix") > 0)
    )


def parse_robots_directives(
    robots: "DataFrame", host_col: str, txt_col: str  # noqa: F821
) -> "DataFrame":
    """(host, robots_txt) -> (host, crawl_delay, sitemaps): the two
    non-rule directives a crawler consumes — ``Crawl-delay: N``
    (politeness pacing per host; the q92 frontier's wave spacing
    input; missing/unparseable -> NULL, multiple -> the maximum,
    the conservative reading) and ``Sitemap: <url>`` lines (the q95
    seeding input). Pure Column exprs: regexp_extract_all over the
    raw text, no explode needed — one row in, one row out."""
    txt = F.col(txt_col)
    delays = F.regexp_extract_all(
        txt, F.lit("(?im)^Crawl-delay:\\s*(\\d+)\\s*$"), 1
    )
    delay = F.array_max(F.transform(delays, lambda d: d.cast("long")))
    sitemaps = F.regexp_extract_all(txt, F.lit("(?im)^Sitemap:\\s*(\\S+)\\s*$"), 1)
    return robots.select(
        F.col(host_col).alias("host"),
        delay.alias("crawl_delay"),
        sitemaps.alias("sitemaps"),
    )


def robots_admission(
    urls: "DataFrame", rules: "DataFrame", host_col: str = "host", path_col: str = "path"  # noqa: F821
) -> "DataFrame":
    """Per-URL robots verdict: blocked iff ANY of the host's Disallow
    prefixes is a prefix of the url path (substring compare — no
    LIKE/regex, so the oracle evaluates identically and no pattern
    metacharacter in a rule can change semantics).

    Scale shape: the rule table is tiny (a few rules per host) —
    broadcast left join on host, per-rule prefix test, one partial-agg
    ``max`` per url. The urls table never shuffles on anything but its
    own aggregation key. Hosts with no rules admit everything (left
    join null => no match).

    Returns one row per url: (host, path, blocked int).
    """
    j = urls.select(
        F.col(host_col).alias("host"), F.col(path_col).alias("path")
    ).join(F.broadcast(rules), "host", "left")
    hit = F.when(
        F.col("prefix").isNotNull()
        & (F.substring(F.col("path"), 1, F.length("prefix")) == F.col("prefix")),
        1,
    ).otherwise(0)
    return (
        j.groupBy("host", "path")
        .agg(F.max(hit).cast("int").alias("blocked"))
    )


def parse_robots_patterns(
    robots: "DataFrame", host_col: str, txt_col: str  # noqa: F821
) -> "DataFrame":
    """(host, robots_txt) -> (host, allow, pattern, pat_len, rx):
    the RFC 9309 rule set — BOTH Allow and Disallow lines, with the
    spec's two metacharacters (``*`` matches any character run, a
    TRAILING ``$`` anchors the match at the path's end; a ``$``
    anywhere else is a literal). Each pattern is translated ONCE, on
    the tiny rules side, to an anchored Java/RE2-common regex (all
    regex metacharacters escaped, then ``*`` -> ``.*``, then the
    trailing anchor restored), so the per-URL match below never
    builds a regex from an unescaped rule. pat_len carries the RFC's
    longest-match precedence key (the OCTET length of the raw
    pattern, per spec)."""
    line = F.explode(F.split(F.col(txt_col), "\n")).alias("line")
    rows = robots.select(F.col(host_col).alias("host"), line)
    kind = F.regexp_extract("line", r"^(Allow|Disallow):\s*(\S*)\s*$", 1)
    pat = F.regexp_extract("line", r"^(Allow|Disallow):\s*(\S*)\s*$", 2)
    rules = rows.select(
        "host",
        (kind == "Allow").alias("allow"),
        pat.alias("pattern"),
    ).filter((F.length(kind) > 0) & (F.length("pattern") > 0))
    # escape every regex metacharacter (incl. $ and *), then give the
    # two RFC wildcards their meaning back
    esc = F.regexp_replace(
        F.col("pattern"), r"([.\+\?\(\)\[\]\{\}\^\|\\$*])", r"\\$1"
    )
    body = F.regexp_replace(esc, r"\\\*", ".*")
    anchored = F.endswith(F.col("pattern"), F.lit("$"))
    # a trailing (escaped) \$ becomes the end anchor; elsewhere stays literal
    rx = F.when(
        anchored,
        F.concat(F.lit("^"), F.regexp_replace(body, r"\\\$$", r"\$")),
    ).otherwise(F.concat(F.lit("^"), body))
    return rules.select(
        "host",
        "allow",
        "pattern",
        F.length("pattern").alias("pat_len"),
        rx.alias("rx"),
    )


def robots_admission_rfc9309(
    urls: "DataFrame",  # noqa: F821
    patterns: "DataFrame",  # noqa: F821
    host_col: str = "host",
    path_col: str = "path",
) -> "DataFrame":
    """Per-URL RFC 9309 verdict: among the host's rules whose pattern
    matches the path, the LONGEST pattern wins; on an exact length
    tie, Allow wins; no matching rule means allowed. One broadcast
    join on host (the rule table is tiny by construction), one rlike
    per joined row against the PRE-TRANSLATED regex, one partial-agg
    max of an (pat_len, allow) precedence struct per url — the urls
    table never shuffles on anything but its own aggregation key.

    Returns one row per url: (host, path, blocked int)."""
    j = urls.select(
        F.col(host_col).alias("host"), F.col(path_col).alias("path")
    ).join(F.broadcast(patterns), "host", "left")
    matched = F.col("rx").isNotNull() & F.expr("path rlike rx")
    # precedence key: longer pattern first, Allow beats Disallow on tie
    key = F.when(
        matched,
        F.struct(
            F.col("pat_len").alias("l"),
            F.col("allow").cast("int").alias("a"),
        ),
    )
    best = F.max(key).alias("best")
    out = j.groupBy("host", "path").agg(best)
    return out.select(
        "host",
        "path",
        F.when(
            F.col("best").isNull() | (F.col("best.a") == 1), F.lit(0)
        ).otherwise(F.lit(1)).cast("int").alias("blocked"),
    )


def rendezvous_assign(hosts, n_fetchers: int, host_col: str = "host"):
    """Rendezvous (highest-random-weight) assignment of hosts to
    ``n_fetchers`` workers: every (host, fetcher) pair scores
    md5(host|fetcher) and the max score wins (fetcher-id tie-break).
    The HRW property — removing a worker reassigns ONLY that worker's
    hosts, adding one steals only what it now wins — is what lets a
    10^12-page crawl rebalance fetchers without a global reshuffle;
    pytest-locked in tests/test_urlfns.py. Runs on the host table
    (corpus-cardinality-free): one 16-way explode + one host-keyed
    window."""
    from pyspark.sql import Window

    if n_fetchers < 1:
        raise ValueError("rendezvous_assign needs at least one fetcher")
    cand = hosts.select(
        F.col(host_col).alias("host"),
        F.explode(F.sequence(F.lit(0), F.lit(n_fetchers - 1))).alias("fetcher"),
    )
    score = F.conv(
        F.substring(
            F.md5(F.concat(F.col("host"), F.lit("|"), F.col("fetcher").cast("string"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    win = Window.partitionBy("host").orderBy(F.col("score").desc(), F.col("fetcher"))
    return (
        cand.select("host", "fetcher", score.alias("score"))
        .withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") == 1)
        .select("host", F.col("fetcher").cast("int").alias("fetcher"), "score")
    )
