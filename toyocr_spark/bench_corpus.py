"""Distributed bench-corpus synthesizer.

Builds a pages table (BASELINE.json ``input_hint`` schema) at benchmark
scale from the driver-provided ``documents`` parquet, entirely JVM-side
(concat/regexp/encode — no Python UDF, no driver loop), so corpus
construction itself scales and never pollutes the extraction timing.
The HTML wraps each document in the same boilerplate grammar the golden
fixtures use (nav + link-dense sidebar + article + footer + script +
comment — FIXTURES.md §1), so the kernel does representative work:
boilerplate stripping, block scoring, island merging.

Replication (`replicas` copies per document, distinct urls) scales the
corpus without external data; hosts are Zipf-skewed (host-0 owns ~20 %
of urls) so the salted-repartition path is exercised at bench time, the
graft of the reference's skew-aware sampler
(/root/reference/data/build.py:283-287).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NAV = (
    '<nav><ul><li><a href="/home">home page</a></li>'
    '<li><a href="/crawl">crawl index</a></li>'
    '<li><a href="/about">about this host</a></li>'
    '<li><a href="/contact">contact and legal</a></li></ul></nav>'
)
_SIDEBAR = (
    '<div class="sidebar"><ul>'
    + "".join(
        f'<li><a href="/rel/{i}">related link number {i} with words</a></li>'
        for i in range(8)
    )
    + "</ul></div>"
)
_FOOTER = (
    "<footer><p>corpus host footer © 2024 "
    "<a href='/tos'>terms</a> <a href='/privacy'>privacy</a></p></footer>"
)

# the office-corpus format cycle, hoisted so bench.py can key its
# corpus cache on len(OFFICE_FORMATS): a corpus materialized under an
# older, NARROWER cycle must never serve the office timing leg (the
# frozen-'office20'-key staleness trap)
OFFICE_FORMATS = (
    "docx", "xlsx", "pptx", "epub", "rtf", "doc", "xls",
    "ppt", "mht", "odt", "ods", "odp", "md", "tar", "csv",
    "tex", "ipynb", "sub", "wiki", "eml", "mbox", "ics",
    "zip", "ps", "fb2", "mobi", "jsonl", "rst", "man",
    "adoc", "org", "texi", "db", "mdoc", "gmi", "po", "ttml", "bib",
    "ms",
)


def synth_pages(
    spark: SparkSession, sf_dir: str, replicas: int = 4, sections: int = 12
) -> DataFrame:
    """documents(doc_id, text, lang) × replicas → pages(url, warc_ts,
    html, text, lang). Each page carries ``sections`` article sections
    (each the doc text paragraph-split, plus an interleaved ad insert),
    sizing pages at a realistic ~8 KB instead of the raw ~300-char doc.
    ``text`` is left NULL (the oracle column is only meaningful for the
    golden fixtures; bench measures throughput)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text", "lang")
    d = d.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))))
    # Zipf-ish skew: ~20% of urls land on host-0, rest uniform over 39 hosts
    h = F.pmod(F.xxhash64("doc_id", "rep"), F.lit(50))
    host = F.when(h < 10, F.lit(0)).otherwise(F.pmod(h, F.lit(39)) + 1)
    # split the doc into <p> paragraphs at sentence boundaries (JVM-side)
    para = F.concat(
        F.lit("<p>"),
        F.regexp_replace(F.col("text"), r"\. ", ".</p><p>"),
        F.lit("</p>"),
    )
    section = F.concat(
        F.lit("<h2>Synthesized Bench Section Title</h2>"),
        para,
        F.lit('<div class="ad"><a href="http://ads.example/1">ad words here</a></div>'),
        para,
    )
    body = F.concat_ws(
        "", F.transform(F.sequence(F.lit(1), F.lit(sections)), lambda _i: section)
    )
    html = F.concat(
        F.lit("<html><head><style>p{margin:0}</style></head><body><header><h1>bench host</h1>"),
        F.lit(_NAV),
        F.lit("</header>"),
        F.lit(_SIDEBAR),
        F.lit("<article>"),
        body,
        F.lit("</article>"),
        F.lit(_FOOTER),
        F.lit("<script>var x = 1;</script><!-- synth -->"),
        F.lit("</body></html>"),
    )
    return d.select(
        F.concat(
            F.lit("https://host-"),
            host.cast("string"),
            F.lit(".example/doc/"),
            F.col("doc_id").cast("string"),
            F.lit("/"),
            F.col("rep").cast("string"),
        ).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )


def synth_pdf_pages(spark: SparkSession, sf_dir: str, replicas: int = 4, sections: int = 6) -> DataFrame:
    """PDF twin of synth_pages: every page is a structurally valid
    single-stream PDF (uncompressed, /Length exact) with a title banner
    and ``sections`` positioned paragraph blocks, built entirely
    JVM-side. Sized so the PDF content-stream machine does
    representative per-block work (text ops, line tracking, box
    assembly, XY-cut)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text", "lang")
    d = d.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))))
    title = "BT /F1 18 Tf 50 760 Td (Synthesized Bench Document Title) Tj ET"
    para = lambda i: F.concat(  # noqa: E731
        F.lit(f"BT /F1 11 Tf 13 TL 50 {700 - 90 * i} Td ("),
        F.col("text"),
        F.lit(") Tj ET"),
    )
    content = F.concat_ws("\n", F.lit(title), *[para(i) for i in range(sections)])
    pdf = F.concat(
        F.lit(
            "%PDF-1.4\n"
            "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            "/Contents 4 0 R >>\nendobj\n"
            "4 0 obj\n<< /Length "
        ),
        F.length(content).cast("string"),  # corpus is ASCII: chars == bytes
        F.lit(" >>\nstream\n"),
        content,
        F.lit("\nendstream\nendobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF\n"),
    )
    h = F.pmod(F.xxhash64("doc_id", "rep"), F.lit(50))
    host = F.when(h < 10, F.lit(0)).otherwise(F.pmod(h, F.lit(39)) + 1)
    return d.select(
        F.concat(
            F.lit("https://host-"),
            host.cast("string"),
            F.lit(".example/pdf/"),
            F.col("doc_id").cast("string"),
            F.lit("/"),
            F.col("rep").cast("string"),
        ).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(pdf, "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )


def materialize_pdf_corpus(
    spark: SparkSession, sf_dir: str, out_path: str, replicas: int = 4, sections: int = 6
) -> None:
    synth_pdf_pages(spark, sf_dir, replicas, sections).repartition(64).write.mode(
        "overwrite"
    ).parquet(out_path)


def materialize_corpus(
    spark: SparkSession, sf_dir: str, out_path: str, replicas: int = 4, sections: int = 12
) -> None:
    """Write the synthesized corpus once (deterministic content) so the
    two scaling runs read byte-identical input and synthesis cost never
    enters the timed window."""
    # many files, not one: a single-file corpus makes the scan stage a
    # single task (serial parquet decode ahead of the shuffle), which
    # caps scaling exactly like an unsplittable input would on a cluster
    synth_pages(spark, sf_dir, replicas, sections).repartition(128).write.mode(
        "overwrite"
    ).parquet(out_path)


def synth_office_pages(
    spark: SparkSession, sf_dir: str, replicas: int = 4, paragraphs: int = 4
) -> DataFrame:
    """Office twin of synth_pdf_pages: every page is a REAL container
    document cycling the thirty-nine non-HTML/PDF dispatch legs
    (docx, xlsx, pptx, epub, rtf, legacy .doc, .xls, .ppt, .mht,
    .odt, .ods, .odp, md, tar, csv, tex, ipynb, sub, wiki, eml,
    mbox, ics, zip, ps, fb2, mobi, jsonl, rst, man, adoc, org,
    texi, db, mdoc, gmi, po, ttml, bib, ms) with a heading,
    ``paragraphs`` body paragraphs, and each format's native chrome.
    Container assembly cannot be a Column expression, so synthesis
    runs in one Arrow kernel — the materialized-corpus cache keeps it
    out of every timed window, matching the HTML/PDF benches."""
    import pyarrow as pa

    from pyspark.sql import types as T

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    d = d.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))))
    d = d.repartition(spark.sparkContext.defaultParallelism)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )

    def batches(it):
        from datetime import datetime, timezone

        from toyocr_spark.fixtures import (
            genbib,
            gencsv,
            gendoc,
            gendocbook,
            gendocx,
            genical,
            genipynb,
            genmail,
            genlatex,
            genmd,
            genmdoc,
            gentar,
            genttml,
            genodp,
            genods,
            genorg,
            genpo,
            genppt,
            genps,
            gentexinfo,
            genxls,
            genepub,
            genfb2,
            gengemtext,
            genmobi,
            genms,
            genmht,
            genodt,
            genpptx,
            genadoc,
            genman,
            genrst,
            genrtf,
            gensub,
            genwiki,
            genxlsx,
            genzip,
        )

        ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
        for b in it:
            urls, blobs, langs = [], [], []
            for did, text, lang, rep in zip(
                b.column(0).to_pylist(),
                b.column(1).to_pylist(),
                b.column(2).to_pylist(),
                b.column(3).to_pylist(),
            ):
                fmt = OFFICE_FORMATS[(did + rep) % len(OFFICE_FORMATS)]
                title = f"Synthesized bench document {did} part {rep}"
                paras = [text] * paragraphs
                if fmt == "docx":
                    body = [gendocx.paragraph(title, style="Heading1")]
                    body += [gendocx.paragraph(p) for p in paras]
                    blob = gendocx.build_docx(
                        body_xml=body,
                        header_text="bench header chrome",
                        footer_text="bench footer chrome",
                    )
                elif fmt == "xlsx":
                    blob = genxlsx.build_xlsx(
                        {"report": [[title], *[[p] for p in paras]]}
                    )
                elif fmt == "pptx":
                    blob = genpptx.build_pptx(
                        slides=[
                            [
                                genpptx.shape([title], title=True),
                                genpptx.shape(paras),
                            ]
                        ],
                        notes=["bench note chrome"],
                    )
                elif fmt == "epub":
                    blob = genepub.build_epub([genepub.chapter_html(title, paras)])
                elif fmt == "rtf":
                    blob = genrtf.build_rtf(
                        body=[
                            genrtf.paragraph(title, fs=32),
                            *[genrtf.paragraph(p) for p in paras],
                        ],
                        header_text="bench header chrome",
                        footer_text="bench footer chrome",
                    )
                elif fmt == "xls":
                    blob = genxls.build_xls(
                        {"report": [[title], *[[p] for p in paras]]},
                        continue_split=bool(rep % 2),
                    )
                elif fmt == "ppt":
                    blob = genppt.build_ppt(
                        slides=[{"title": title, "body": paras}],
                        notes=["bench notes chrome"],
                    )
                elif fmt == "doc":
                    blob = gendoc.build_doc(
                        [gendoc.para(title, style="Heading1")]
                        + [gendoc.para(p) for p in paras],
                        header_text="bench header chrome",
                        footer_text="bench footer chrome",
                    )
                elif fmt == "mht":
                    markup = (
                        f"<html><body><h1>{title}</h1>"
                        + "".join(f"<p>{p}</p>" for p in paras)
                        + "</body></html>"
                    )
                    blob = genmht.build_mht(
                        markup,
                        encoding="quoted-printable" if rep % 2 == 0 else "base64",
                        location=f"https://host-{did % 40}.example/live/{did}.html",
                    )
                elif fmt == "ods":
                    blob = genods.build_ods(
                        {"report": [[title], *[[p] for p in paras]]},
                        header_rows=rep % 2,
                    )
                elif fmt == "odp":
                    blob = genodp.build_odp(
                        slides=[
                            {"title": title, "body": paras, "notes": "bench notes chrome"}
                        ],
                    )
                elif fmt == "md":
                    blob = genmd.build_md(
                        title,
                        paras,
                        front_matter="title: bench front-matter chrome",
                    )
                elif fmt == "csv":
                    blob = gencsv.build_csv(
                        [title, ""], [*[[p, ""] for p in paras], ["7", ""]]
                    )
                elif fmt == "tex":
                    blob = genlatex.build_latex(
                        title, paras, comment="bench comment chrome"
                    )
                elif fmt == "ipynb":
                    blob = genipynb.build_ipynb(
                        title,
                        paras,
                        code=f"total = {did} + {rep}",
                        output="bench stream output text",
                    )
                elif fmt == "sub":
                    cues = [title, *paras]
                    blob = (
                        gensub.build_vtt(cues, note="bench note chrome")
                        if rep % 2 == 0
                        else gensub.build_srt(cues)
                    )
                elif fmt == "wiki":
                    blob = genwiki.build_wikitext(
                        title,
                        paras,
                        infobox_field="bench infobox chrome",
                        citation="bench citation chrome",
                    )
                elif fmt == "ps":
                    ops = [genps.paragraph_ps(50, 740, 18, 20, [title])]
                    y = 700
                    for p in paras:
                        w = p.split(" ")
                        lines = [
                            " ".join(w[i : i + 5]) for i in range(0, len(w), 5)
                        ]
                        ops.append(genps.paragraph_ps(50, y, 11, 13, lines))
                        y -= 13 * len(lines) + 27
                    blob = genps.build_ps(ops)
                elif fmt == "zip":
                    page = (
                        f"<html><body><h1>{title}</h1>"
                        + "".join(f"<p>{p}</p>" for p in paras)
                        + "</body></html>"
                    ).encode()
                    blob = genzip.build_zip(
                        [
                            ("page.html", page),
                            (
                                "res/r.png",
                                b"\x89PNG\r\n\x1a\n" + bytes(range(200, 256)),
                            ),
                        ],
                        with_dir=True,
                    )
                elif fmt == "ms":
                    blob = genms.build_ms(
                        title,
                        paras,
                        author="bench author chrome",
                        comment="bench comment chrome",
                        footnote="bench footnote chrome",
                        display=(
                            ["bench display content kept as one block"]
                            if rep % 2
                            else None
                        ),
                    )
                elif fmt == "bib":
                    blob = genbib.build_bib(
                        [(title, "\n\n".join(paras))],
                        author="Chrome, Bench Author",
                        comment="bench comment chrome",
                        concat_index=0 if rep % 2 else None,
                    )
                elif fmt == "ttml":
                    blob = genttml.build_ttml(
                        [title, *paras],
                        legacy_ns=bool(rep % 2),
                        title="bench head title chrome",
                        with_br=bool(rep % 2),
                    )
                elif fmt == "po":
                    blob = genpo.build_po(
                        [
                            (f"bench source {j} chrome", x)
                            for j, x in enumerate([title, *paras])
                        ],
                        project="bench project chrome",
                        comment="bench comment chrome",
                        multiline_index=1 if rep % 2 else None,
                    )
                elif fmt == "gmi":
                    blob = gengemtext.build_gemtext(
                        title,
                        paras,
                        items=(
                            ["bench list item long enough to keep around"]
                            if rep % 2
                            else None
                        ),
                    )
                elif fmt == "mdoc":
                    blob = genmdoc.build_mdoc(
                        title,
                        paras,
                        comment="bench comment chrome",
                        os_name="bench os chrome",
                        items=(
                            [("x", "bench option description long enough to keep")]
                            if rep % 2
                            else None
                        ),
                    )
                elif fmt == "db":
                    blob = gendocbook.build_docbook(
                        title,
                        paras,
                        version=4 if rep % 2 == 0 else 5,
                        author="bench author chrome",
                        note="bench note chrome",
                        listing=(
                            ["bench listing content kept as one block"]
                            if rep % 2
                            else None
                        ),
                    )
                elif fmt == "texi":
                    blob = gentexinfo.build_texinfo(
                        title,
                        paras,
                        copying="bench copying chrome",
                        comment="bench comment chrome",
                        example=(
                            ["bench example content line kept as one block"]
                            if rep % 2
                            else None
                        ),
                    )
                elif fmt == "org":
                    blob = genorg.build_org(
                        title,
                        paras,
                        author="bench author chrome",
                        comment="bench comment chrome",
                        src=(
                            ["bench src content line kept as one block"]
                            if rep % 2
                            else None
                        ),
                    )
                elif fmt == "man":
                    blob = genman.build_man(
                        title,
                        paras,
                        comment="bench comment chrome",
                        source="bench source chrome",
                        options=(
                            [("-x", "bench option description long enough to keep")]
                            if rep % 2
                            else None
                        ),
                    )
                elif fmt == "adoc":
                    blob = genadoc.build_adoc(
                        title,
                        paras,
                        author="bench author chrome",
                        admonition="bench admonition chrome",
                        listing=(
                            ["bench listing content line kept as one block"]
                            if rep % 2
                            else None
                        ),
                    )
                elif fmt == "rst":
                    blob = genrst.build_rst(
                        title,
                        paras,
                        author="bench author chrome",
                        comment="bench comment chrome",
                        items=(
                            ["bench list item long enough to keep around"]
                            if rep % 2
                            else None
                        ),
                    )
                elif fmt == "jsonl":
                    import json as _json

                    recs = [
                        {"title": title, "text": p, "url": "https://chrome.example"}
                        for p in paras
                    ]
                    blob = (
                        "\n".join(_json.dumps(r) for r in recs).encode()
                        + b'\n{"text": "truncat'
                    )
                elif fmt == "mobi":
                    page = (
                        f"<html><body><h1>{title}</h1>"
                        + "".join(f"<p>{p}</p>" for p in paras)
                        + "</body></html>"
                    ).encode()
                    blob = genmobi.build_mobi(
                        page, compression=2 if did % 2 == 0 else 1
                    )
                elif fmt == "fb2":
                    blob = genfb2.build_fb2(
                        f"Meta {title}",
                        title,
                        paras,
                        stanza_lines=[
                            f"verse line one of stanza {did}",
                            "verse line two keeps it going",
                        ],
                    )
                elif fmt == "ics":
                    blob = genical.build_ics(
                        [(title, p) for p in paras],
                        multiline_description=bool(rep % 2),
                    )
                elif fmt == "mbox":
                    blob = genmail.build_mbox(
                        [
                            genmail.build_eml(
                                title,
                                paras,
                                quoted="bench quoted chrome",
                                signature="bench signature chrome",
                            ),
                            genmail.build_eml(
                                f"{title} follow-up",
                                paras[:1],
                                html_alternative=True,
                            ),
                        ],
                        escape_plant=bool(rep % 2),
                    )
                elif fmt == "eml":
                    blob = genmail.build_eml(
                        title,
                        paras,
                        quoted="bench quoted chrome",
                        signature="bench signature chrome",
                        encoding=("7bit", "base64", "quoted-printable")[rep % 3],
                        html_alternative=bool(did % 2),
                    )
                elif fmt == "tar":
                    page = (
                        f"<html><body><h1>{title}</h1>"
                        + "".join(f"<p>{p}</p>" for p in paras)
                        + "</body></html>"
                    ).encode()
                    blob = gentar.build_tar(
                        [
                            ("page.html", page),
                            ("res/r.png", b"\x89PNG\r\n\x1a\n" + bytes(range(200, 256))),
                        ],
                        with_dir=True,
                    )
                else:  # odt
                    blob = genodt.build_odt(
                        body_xml=[genodt.paragraph(title, heading=1)]
                        + [genodt.paragraph(p) for p in paras],
                        header_text="bench header chrome",
                        footer_text="bench footer chrome",
                    )
                urls.append(f"https://host-{did % 40}.example/{fmt}/{did}/{rep}")
                blobs.append(blob)
                langs.append(lang)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    pa.array([ts] * len(urls), pa.timestamp("us", tz="UTC")),
                    pa.array(blobs, pa.binary()),
                    pa.array([None] * len(urls), pa.string()),
                    pa.array(langs, pa.string()),
                ],
                names=["url", "warc_ts", "html", "text", "lang"],
            )

    return d.mapInArrow(batches, schema)


def materialize_office_corpus(
    spark: SparkSession, sf_dir: str, out_path: str, replicas: int = 4, paragraphs: int = 4
) -> None:
    synth_office_pages(spark, sf_dir, replicas, paragraphs).repartition(64).write.mode(
        "overwrite"
    ).parquet(out_path)
