"""URL canonicalization / outlink resolution: edge semantics + plan
shape (map-only; the dedup groupBy is the only shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from toyocr_spark.functions.urlfns import canonicalize_url, resolve_link


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url: string")
    return [r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]


def test_canonicalize_edges(spark):
    got = _canon(
        spark,
        [
            "HTTPS://WWW.EXAMPLE.COM:443/Path/Sub?utm_source=x&b=2&a=1#frag",
            "http://example.com:80/",
            "http://example.com:8080/x",
            "https://example.com",  # no path at all
            "https://example.com/x?utm_a=1&utm_b=2",  # tracking-only query
            "https://example.com/x?fbclid=abc&z=9&gclid=q",
            "https://example.com/Case/MATTERS/",
            "https://www.example.com/#",
        ],
    )
    assert got == [
        "https://example.com/Path/Sub?a=1&b=2",
        "http://example.com/",
        "http://example.com:8080/x",
        "https://example.com/",
        "https://example.com/x",
        "https://example.com/x?z=9",
        "https://example.com/Case/MATTERS/",
        "https://example.com/",
    ]


def test_canonical_collision_is_dedup_key(spark):
    a, b = _canon(
        spark,
        [
            "HTTPS://WWW.Example.com:443/a?y=2&x=1#top",
            "https://example.com/a?x=1&y=2",
        ],
    )
    assert a == b


def test_resolve_link_semantics(spark):
    df = spark.createDataFrame(
        [("https://h.example", "https://h.example/dir/", link)
         for link in ["https://other.example/z", "/root/p", "rel.html", "#frag"]],
        "base_root: string, base_dir: string, link: string",
    )
    out = [
        r["t"]
        for r in df.select(
            resolve_link(F.col("base_root"), F.col("base_dir"), F.col("link")).alias("t")
        ).collect()
    ]
    assert out == [
        "https://other.example/z",
        "https://h.example/root/p",
        "https://h.example/dir/rel.html",
        None,
    ]


def test_outlinks_plan_is_map_only(spark, sf_dir):
    """q42 must reach the sink without any Exchange: pure projection +
    generate — the shape that scales linearly with input splits."""
    from toyocr_spark.queries import QUERIES

    plan = QUERIES["q42_outlinks"].spark(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_canonical_dedup_plan_single_shuffle(spark, sf_dir):
    """q41 is one hash aggregate on the canonical key: exactly one
    Exchange (partial agg map-side, final after the shuffle)."""
    from toyocr_spark.queries import QUERIES

    plan = QUERIES["q41_url_canonical"].spark(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_drop_blocked_hosts_suffix_and_case(spark):
    """Blocklist semantics: an entry blocks the exact host AND every
    subdomain of it (suffix chain), case-insensitively on both sides —
    Ads.Example.com must not escape an 'example.com' entry, and an
    'ADS.TRACKER.NET' entry must still block ads.tracker.net."""
    from toyocr_spark.functions.urlfns import drop_blocked_hosts

    rows = [
        ("Ads.Example.com",),   # subdomain of example.com, mixed case -> blocked
        ("example.com",),       # exact match -> blocked
        ("notexample.com",),    # suffix match is per-label, not substring -> kept
        ("ads.tracker.net",),   # blocked by the UPPERCASE rule
        ("safe.org",),          # kept
    ]
    df = spark.createDataFrame(rows, "h string")
    bl = spark.createDataFrame([("example.com",), ("ADS.TRACKER.NET",)], "host string")
    kept = sorted(r["h"] for r in drop_blocked_hosts(df, "h", bl).collect())
    assert kept == ["notexample.com", "safe.org"]


def test_surt_key(spark):
    from pyspark.sql import functions as F

    from toyocr_spark.functions.urlfns import canonicalize_url, surt_key

    urls = [
        ("https://a.host-1.example/p?x=1",),
        ("HTTPS://WWW.Host-2.Example:443/Article/9?utm_source=x&b=2#f",),
        ("https://www.host-3.EXAMPLE:8080/Deep/Path",),
        ("http://single/",),
    ]
    df = spark.createDataFrame(urls, "url string")
    got = [
        r[0]
        for r in df.select(surt_key(canonicalize_url(F.col("url")))).collect()
    ]
    assert got == [
        "example,host-1,a)/p?x=1",
        "example,host-2)/Article/9?b=2",
        "example,host-3:8080)/Deep/Path",
        "single)/",
    ]
    # lexicographic SURT order clusters a registrable domain's hosts
    assert sorted(got)[:2] == ["example,host-1,a)/p?x=1", "example,host-2)/Article/9?b=2"]


def test_mine_outlinks_mixed_html_pdf(spark):
    """Unified edge mining: HTML hrefs resolve JVM-side, PDF /URI
    actions surface through the sanctioned Python kernel, fragment
    links drop, and the union carries both formats."""
    from pyspark.sql import functions as F

    from toyocr_spark.fixtures.genpdf import build_pdf, paragraph_ops, text_stream
    from toyocr_spark.functions.linkmine import mine_outlinks

    pdf = build_pdf(
        [text_stream([paragraph_ops(72, 740, 11, 13, ["a pdf page"])])],
        compress=False,
    )
    ann = (
        b"9 0 obj\n<< /Type /Annot /Subtype /Link /A << /S /URI "
        b"/URI (https://cited.example/paper) >> >>\nendobj\n"
    )
    i = pdf.find(b"xref")
    pdf = pdf[:i] + ann + pdf[i:]

    html = (
        '<html><body><a href="https://ext.example/x">e</a>'
        '<a href="/root/y">r</a><a href="z.html">rel</a>'
        '<a href="#top">skip</a></body></html>'
    )
    rows = [
        ("https://site.example/dir/page.html", bytearray(html.encode())),
        ("https://host.example/doc.pdf", bytearray(pdf)),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = sorted(
        (r["src_url"], r["target"]) for r in mine_outlinks(df).collect()
    )
    assert got == [
        ("https://host.example/doc.pdf", "https://cited.example/paper"),
        ("https://site.example/dir/page.html", "https://ext.example/x"),
        ("https://site.example/dir/page.html", "https://site.example/dir/z.html"),
        ("https://site.example/dir/page.html", "https://site.example/root/y"),
    ]
    # structural contract: the Python kernel sits ONLY under the
    # PDF-magic filter — the HTML branch is regexp/resolve Column exprs
    plan = mine_outlinks(df)._jdf.queryExecution().executedPlan().toString()
    arrow_at = plan.find("MapInArrow")
    assert arrow_at != -1
    assert "regexp_extract_all" in plan[:arrow_at] or "regexp_extract_all" in plan


def test_mine_outlinks_docx_leg(spark):
    """OOXML hyperlinks (w:hyperlink/@r:id -> External rels targets)
    surface as edges through the same sanctioned kernel as PDFs —
    document order, duplicates preserved, internal anchors skipped."""
    from toyocr_spark.extractor.docx import docx_links
    from toyocr_spark.fixtures.gendocx import build_docx, paragraph
    from toyocr_spark.functions.linkmine import mine_outlinks

    body = [
        paragraph("see the spec document for details and context", link="rId7"),
        paragraph("plain body paragraph with no links in it at all, kept text"),
        '<w:p><w:hyperlink w:anchor="top"><w:r><w:t>internal</w:t></w:r>'
        "</w:hyperlink></w:p>",
        paragraph("the spec again cited a second time right here", link="rId7"),
        paragraph("and one more distinct external reference link", link="rId8"),
    ]
    blob = build_docx(
        body_xml=body,
        links={
            "rId7": "https://spec.example/std",
            "rId8": "https://other.example/ref",
        },
    )
    assert docx_links(blob) == [
        "https://spec.example/std",
        "https://spec.example/std",
        "https://other.example/ref",
    ]
    html = '<html><body><a href="https://ext.example/x">e</a></body></html>'
    rows = [
        ("https://site.example/p.html", bytearray(html.encode())),
        ("https://host.example/d.docx", bytearray(blob)),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = sorted((r["src_url"], r["target"]) for r in mine_outlinks(df).collect())
    assert got == [
        ("https://host.example/d.docx", "https://other.example/ref"),
        ("https://host.example/d.docx", "https://spec.example/std"),
        ("https://host.example/d.docx", "https://spec.example/std"),
        ("https://site.example/p.html", "https://ext.example/x"),
    ]


def test_mine_outlinks_epub_and_ooxml_legs(spark):
    """EPUB spine documents contribute their ABSOLUTE hrefs (intra-book
    relatives are navigation, not edges); xlsx/pptx contribute their
    External hyperlink relationships via the generic OPC rels harvest;
    zip containers NEVER reach the HTML regexp leg (stored members'
    raw hrefs would surface as spurious edges)."""
    from toyocr_spark.extractor.epub import epub_links
    from toyocr_spark.extractor.opc import opc_hyperlinks
    from toyocr_spark.fixtures.gendocx import build_docx, paragraph
    from toyocr_spark.fixtures.genepub import build_epub, chapter_html
    from toyocr_spark.functions.linkmine import mine_outlinks

    book = build_epub(
        [
            chapter_html(
                "Chapter",
                [
                    'See <a href="https://cited.example/a">source A</a> and '
                    '<a href="other_chapter.xhtml">the appendix</a> for more '
                    "details about the methodology used in this chapter.",
                ],
            )
        ]
    )
    assert epub_links(book) == ["https://cited.example/a"]
    docx = build_docx(
        body_xml=[paragraph("see the standard for details here", link="rId7")],
        links={"rId7": "https://spec.example/std"},
    )
    # the generic rels harvest agrees with the document-ordered walk
    assert opc_hyperlinks(docx) == ["https://spec.example/std"]
    rows = [
        ("https://lib.example/book.epub", bytearray(book)),
        ("https://host.example/d.docx", bytearray(docx)),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = sorted((r["src_url"], r["target"]) for r in mine_outlinks(df).collect())
    assert got == [
        ("https://host.example/d.docx", "https://spec.example/std"),
        ("https://lib.example/book.epub", "https://cited.example/a"),
    ]


def test_mine_outlinks_tar_markdown_and_junk_binary(spark):
    """The tar leg walks members (html hrefs + markdown links, absolute
    only), markdown pages route by the structural pre-gate, and a junk
    binary page (no magic) mines ZERO edges — it stays on the html leg
    whose lenient make_valid_utf8 decode simply matches no href."""
    from toyocr_spark.fixtures.genmd import build_md
    from toyocr_spark.fixtures.gentar import build_tar
    from toyocr_spark.functions.linkmine import mine_outlinks

    member_html = (
        '<html><body><a href="https://ext.example/cited">x</a>'
        '<a href="sibling.html">packaged</a></body></html>'
    ).encode()
    md = build_md(
        "Readme heading long enough",
        ["prose [ref](https://md.example/ref) and [rel](./x.md)"],
        host="nav.example",
    )
    tar = build_tar(
        [
            ("page.html", member_html),
            ("README.md", md),
            ("res/bin.dat", bytes(range(256)) * 4),
        ]
    )
    rows = [
        ("https://b.example/bundle.tar", bytearray(tar)),
        ("https://m.example/README.md", bytearray(md)),
        ("https://j.example/blob.bin", bytearray(b"\x00\x01\x02junk" * 100)),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = sorted((r["src_url"], r["target"]) for r in mine_outlinks(df).collect())
    nav = [
        "https://nav.example/",
        "https://nav.example/about",
        "https://nav.example/contact",
    ]
    assert got == sorted(
        [("https://b.example/bundle.tar", "https://ext.example/cited")]
        + [("https://b.example/bundle.tar", t) for t in nav]
        + [("https://b.example/bundle.tar", "https://md.example/ref")]
        + [("https://m.example/README.md", t) for t in nav]
        + [("https://m.example/README.md", "https://md.example/ref")]
    )


def test_mine_outlinks_total_over_hostile_bytes(spark):
    """Gate false positives must never silently zero a page's edges,
    and the html leg must be total over arbitrary bytes: latin-1
    markup (invalid UTF-8, no NUL) mines its ASCII hrefs via the
    lenient decode; binary-corrupt HTML (stray NUL) stays on the html
    leg; prose with 'ustar' at offset 257 fails the kernel's checksum
    gate but still mines its absolute hrefs via the kernel fallback."""
    from toyocr_spark.functions.linkmine import mine_outlinks

    latin1 = (
        b"<html><body>caf\xe9 cr\xe8me"
        b'<a href="https://l1.example/x">x</a></body></html>'
    )
    nul_html = (
        b"<html><body>\x00 corrupt"
        b'<a href="https://nul.example/y">y</a></body></html>'
    )
    pad = b"A" * 200 + b"\n"
    ustar_text = (pad + b'line <a href="https://u.example/z">z</a> ')
    ustar_text = (
        ustar_text + b" " * (257 - len(ustar_text)) + b"ustar trailing prose"
    )
    assert ustar_text[257:262] == b"ustar"
    rows = [
        ("https://a.example/latin1.html", bytearray(latin1)),
        ("https://b.example/nul.html", bytearray(nul_html)),
        ("https://c.example/ustar.txt", bytearray(ustar_text)),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = sorted((r["src_url"], r["target"]) for r in mine_outlinks(df).collect())
    assert got == [
        ("https://a.example/latin1.html", "https://l1.example/x"),
        ("https://b.example/nul.html", "https://nul.example/y"),
        ("https://c.example/ustar.txt", "https://u.example/z"),
    ]


def test_mine_outlinks_generic_zip_walks_members_absolute_only(spark):
    """A generic (non-container) zip routes kernel-side by the bare
    PK\\x03\\x04 magic and mines its MEMBERS per format (the q170
    zipleg walk): absolute member hrefs are real edges, but a
    RELATIVE member href must never fabricate one — resolved against
    the archive url it would poison the frontier (the pre-q170
    zero-edge rule survives exactly for the relative case)."""
    import io as _io
    import zipfile

    from toyocr_spark.functions.linkmine import mine_outlinks

    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as z:
        z.writestr(
            "index.html",
            '<a href="about.html">a</a><a href="https://ext.example/x">e</a>',
        )
    df = spark.createDataFrame(
        [("https://h.example/export.zip", bytearray(buf.getvalue()))],
        "url string, html binary",
    )
    got = [(r["src_url"], r["target"]) for r in mine_outlinks(df).collect()]
    assert got == [("https://h.example/export.zip", "https://ext.example/x")]


def test_parse_robots_directives(spark):
    from toyocr_spark.functions.urlfns import parse_robots_directives

    rows = [
        ("a.example", "User-agent: *\nCrawl-delay: 5\nDisallow: /x\n"
                      "Sitemap: https://a.example/sm1.xml\n"
                      "Sitemap: https://a.example/sm2.xml"),
        ("b.example", "Disallow: /\ncrawl-delay: 2\nCrawl-Delay: 7"),  # case-insensitive, max wins
        ("c.example", "User-agent: *\nDisallow:"),                     # nothing
        ("d.example", "Crawl-delay: notanumber"),                      # unparseable -> NULL
    ]
    df = spark.createDataFrame(rows, "host string, txt string")
    got = {
        r["host"]: (r["crawl_delay"], list(r["sitemaps"]))
        for r in parse_robots_directives(df, "host", "txt").collect()
    }
    assert got == {
        "a.example": (5, ["https://a.example/sm1.xml", "https://a.example/sm2.xml"]),
        "b.example": (7, []),
        "c.example": (None, []),
        "d.example": (None, []),
    }


def test_mine_outlinks_rtf_and_pptx_legs(spark):
    """The RTF field harvest and the pptx rels harvest ride the same
    kernel dispatch: an RTF page must never reach the HTML regexp leg
    (its field instructions carry no href= but must still mine), and a
    pptx hyperlink rel surfaces through opc_hyperlinks."""
    from toyocr_spark.extractor.rtf import rtf_links
    from toyocr_spark.fixtures.genpptx import build_pptx, shape
    from toyocr_spark.fixtures.genrtf import build_rtf, paragraph
    from toyocr_spark.functions.linkmine import mine_outlinks

    rtf = build_rtf(
        body=[
            paragraph("body text for the page goes here"),
            paragraph("nav", link="https://nav.example/home"),
        ]
    )
    assert rtf_links(rtf) == ["https://nav.example/home"]
    deck = build_pptx(
        slides=[[shape(["Deck Title"], title=True), shape(["deck body"])]],
        links={"rIdH1": "https://deck.example/cited"},
    )
    rows = [
        ("https://host.example/old.rtf", bytearray(rtf)),
        ("https://host.example/deck.pptx", bytearray(deck)),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = sorted((r["src_url"], r["target"]) for r in mine_outlinks(df).collect())
    assert got == [
        ("https://host.example/deck.pptx", "https://deck.example/cited"),
        ("https://host.example/old.rtf", "https://nav.example/home"),
    ]


def test_robots_rfc9309_wildcards(spark):
    """RFC 9309 semantics pinned: '*' spans any run (including '/'),
    a TRAILING '$' anchors at path end, longest raw pattern wins,
    Allow beats Disallow on exact length tie, no-match allows, and a
    rule full of regex metacharacters matches LITERALLY (the
    escape-then-translate order means no rule byte can inject regex
    semantics)."""
    from toyocr_spark.functions.urlfns import (
        parse_robots_patterns,
        robots_admission_rfc9309,
    )

    txt = (
        "User-agent: *\nDisallow: /private*\nAllow: /private/ok$\n"
        "Disallow: /tmp/*.pdf$\nAllow: /\n"
        "Disallow: /a.b(c)+\n"
    )
    robots = spark.createDataFrame([("h.example", txt)], "host string, txt string")
    pats = parse_robots_patterns(robots, "host", "txt")
    rows = {r["pattern"]: r for r in pats.collect()}
    assert rows["/private*"]["rx"] == "^/private.*"
    assert rows["/private/ok$"]["rx"] == "^/private/ok$"
    assert rows["/tmp/*.pdf$"]["rx"] == "^/tmp/.*\\.pdf$"
    assert rows["/a.b(c)+"]["rx"] == "^/a\\.b\\(c\\)\\+"

    cases = {
        "/public/1": 0,       # only 'Allow: /' matches
        "/private/1": 1,      # Disallow /private* (9) beats Allow / (1)
        "/private/ok": 0,     # Allow /private/ok$ (12) beats /private* (9)
        "/private/okay": 1,   # the $ anchor rejects the Allow
        "/tmp/a.pdf": 1,      # mid-pattern wildcard
        "/tmp/a.pdfx": 0,     # $ rejects the Disallow
        "/tmp/deep/b.pdf": 1, # '*' crosses '/'
        "/aXb(c)+": 0,        # '.' in the rule is NOT a regex dot
        "/a.b(c)+": 1,        # ...but the literal path matches
    }
    urls = spark.createDataFrame(
        [("h.example", p) for p in cases] + [("norules.example", "/x")],
        "host string, path string",
    )
    got = {
        (r["host"], r["path"]): r["blocked"]
        for r in robots_admission_rfc9309(urls, pats).collect()
    }
    for p, want in cases.items():
        assert got[("h.example", p)] == want, p
    assert got[("norules.example", "/x")] == 0

    # equal-length Allow and Disallow patterns: Allow wins the tie
    tie_txt = "Disallow: /t$\nAllow: /t$\n"
    tie = spark.createDataFrame([("t.example", tie_txt)], "host string, txt string")
    tie_pats = parse_robots_patterns(tie, "host", "txt")
    tie_urls = spark.createDataFrame([("t.example", "/t")], "host string, path string")
    (r,) = robots_admission_rfc9309(tie_urls, tie_pats).collect()
    assert r["blocked"] == 0  # Allow wins the exact-length tie


def test_rendezvous_minimal_disruption(spark):
    """The HRW property that justifies rendezvous over mod-N sharding:
    going from 16 to 15 fetchers must reassign ONLY the hosts that
    fetcher 15 owned — every other host keeps its fetcher. (Mod-N
    resharding would move ~15/16 of all hosts.) Also pins determinism:
    the same host set assigns identically across calls."""
    from toyocr_spark.functions.urlfns import rendezvous_assign

    hosts = spark.createDataFrame(
        [(f"h{i}.example",) for i in range(200)], "host string"
    )
    a16 = {r.host: r.fetcher for r in rendezvous_assign(hosts, 16).collect()}
    a15 = {r.host: r.fetcher for r in rendezvous_assign(hosts, 15).collect()}
    assert set(a16) == set(a15)
    moved = {h for h in a16 if a16[h] != a15[h]}
    # exactly the dropped worker's hosts moved
    assert moved == {h for h, f in a16.items() if f == 15}
    # and they landed somewhere valid
    assert all(0 <= a15[h] <= 14 for h in moved)
    # load is roughly balanced (md5 uniformity): no fetcher starves
    # or hoards at 200 hosts / 16 workers (exp 12.5 per worker)
    from collections import Counter

    loads = Counter(a16.values())
    assert max(loads.values()) <= 30 and len(loads) >= 12
    # determinism
    b16 = {r.host: r.fetcher for r in rendezvous_assign(hosts, 16).collect()}
    assert b16 == a16
