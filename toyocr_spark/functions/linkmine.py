"""Unified outlink mining over a mixed HTML/PDF/docx crawl — the
edge-list feed for the link graph (q44 PageRank), anchor aggregation
(q91), and frontier seeding (q92).

Split by magic bytes, each format on its fastest path:
  * HTML rows stay ENTIRELY JVM-side: href extraction is
    regexp_extract_all, resolution is urlfns.resolve_link Column
    exprs — no Python touches the dominant format;
  * PDF and OOXML rows (a small fraction of any crawl) go through one
    mapInArrow batch dispatching per row to extractor.pdf.pdf_links /
    extractor.docx.docx_links — the same sanctioned-kernel shape as
    extraction itself;
  * the union is by name, one edge row per (src_url, target).

At 100 TB the html leg is map-only scan work and the kernel leg is
bounded by the PDF+docx fraction; neither shuffles until the consumer
aggregates.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

from toyocr_spark.extractor.tarleg import _MAGIC_OFFSET
from toyocr_spark.extractor.tokenizer import ABS_HREF_RE, utf8_textish

_HREF_RE = '(?i)href="([^"]+)"'


def mine_outlinks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, target) edges from every page. `html_col` may be
    binary (raw capture bytes) or string markup. Fragment-only links
    drop; relative links resolve against the page (urlfns semantics);
    PDF /URI actions are absolute by nature and pass through."""
    from toyocr_spark.functions.urlfns import resolve_link

    col = F.col(html_col)
    is_bin = dict(pages.dtypes)[html_col] == "binary"
    if is_bin:
        # binary captures: PDFs and every zip-container format (the
        # OOXML trio + EPUB) mine inside the sanctioned kernel — a zip
        # must never reach the HTML regexp leg, where stored members'
        # raw hrefs would surface as spurious wrongly-resolved edges
        is_zip = col.substr(1, 4) == F.lit(b"PK\x03\x04")
        # MHTML: transfer-encoded markup — the raw regexp leg would
        # mine QP-mangled hrefs, so archives route to the kernel. The
        # JVM-side gate mirrors is_mhtml: both MIME markers near the
        # head and not markup-shaped (no header line starts with '<')
        head = F.substring(col, 1, 4096)
        is_mht = (
            F.contains(head, F.lit(b"MIME-Version:"))
            & F.contains(head, F.lit(b"multipart/related"))
            & (col.substr(1, 1) != F.lit(b"<"))
        )
        # markdown: no magic bytes and no href= attributes, so md pages
        # mined by the HTML regexp leg would yield ZERO edges. A cheap
        # JVM pre-gate (non-'<' start + a heading-ish line + a ](-link)
        # routes CANDIDATES to the kernel, where the real structural
        # sniff (extractor.markdown.is_markdown) decides; a candidate
        # that fails it mines [] there — exactly what the href regexp
        # would have found on tag-less text anyway. Pure binary
        # `contains` ops: F.decode throws MALFORMED_CHARACTER_CODING on
        # the binary formats' heads, so no string cast may run before
        # the magic split prunes them.
        is_md_like = (
            (col.substr(1, 1) != F.lit(b"<"))
            & F.contains(head, F.lit(b"]("))
            & (
                (col.substr(1, 2) == F.lit(b"# "))
                | F.contains(head, F.lit(b"\n# "))
                | F.contains(head, F.lit(b"\n## "))
                | F.contains(head, F.lit(b"\n### "))
            )
        )
        # email: transfer-encoded bodies (QP/base64) and bare plain-text
        # URLs never match the href regexp; candidates (header-shaped
        # From:+Subject: in the head) route to the kernel, where the
        # real gate (extractor.eml.is_eml) decides
        is_eml_like = (
            (col.substr(1, 1) != F.lit(b"<"))
            & (F.contains(head, F.lit(b"From:")) | (col.substr(1, 5) == F.lit(b"From:")))
            & F.contains(head, F.lit(b"Subject:"))
        )
        # wikitext: no magic and its [url label] external links never
        # match the href regexp, so candidates ([[-links plus a ==
        # heading or a template opener) route to the kernel, where the
        # real gate (extractor.wikitext.is_wikitext) decides; a failed
        # candidate mines raw absolute hrefs there (the md fallback
        # contract)
        is_wiki_like = (
            (col.substr(1, 1) != F.lit(b"<"))
            & F.contains(head, F.lit(b"[["))
            & (
                F.contains(head, F.lit(b"\n=="))
                | (col.substr(1, 2) == F.lit(b"=="))
                | (col.substr(1, 2) == F.lit(b"{{"))
            )
        )
        # notebooks: '{'-led JSON whose markdown cells hold ](-links
        # the regexp leg can never see (hrefs inside JSON strings are
        # escaped). Route CANDIDATES ('{' start + the "cells" key in
        # the head — nbformat writes it first) to the kernel, where
        # the real gate (extractor.ipynb.is_ipynb) decides; a failed
        # candidate mines raw absolute hrefs there, which on escaped
        # JSON is exactly the regexp leg's zero.
        is_nb_like = (col.substr(1, 1) == F.lit(b"{")) & F.contains(
            head, F.lit(b'"cells"')
        )
        # iCalendar: URL: property values and bare DESCRIPTION urls
        # never match the href regexp; BEGIN:VCALENDAR is a de-facto
        # magic, so the JVM gate is exact (no kernel re-check needed
        # beyond the shared is_ics)
        is_ics_b = col.substr(1, 15) == F.lit(b"BEGIN:VCALENDAR")
        # tar bundles route to the kernel (tar_links walks the members)
        is_tar_b = F.substring(col, _MAGIC_OFFSET + 1, 5) == F.lit(b"ustar")
        magic = (
            (col.substr(1, 5) == F.lit(b"%PDF-"))
            | (col.substr(1, 4) == F.lit(b"%!PS"))
            | is_tar_b
            | is_md_like
            | is_nb_like
            | is_wiki_like
            | is_eml_like
            | is_ics_b
            | (col.substr(1, 5) == F.lit(b"{\\rtf"))
            | (col.substr(1, 8) == F.lit(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"))
            | is_mht
            # EVERY zip routes kernel-side, container or not: a
            # generic zip (site export, jar) reaching the regexp leg
            # would surface stored members' raw hrefs as spurious
            # wrongly-resolved edges; in the kernel the known
            # containers mine their rels and generic bundles walk
            # their members (zipleg.zip_links, the tar rule)
            | is_zip
        )
    else:
        magic = (
            col.startswith("%PDF-")
            | col.startswith("{\\rtf")
            | (
                (F.substring(col, 1, 1) != F.lit("<"))
                & F.substring(col, 1, 4096).rlike("(?m)^#{1,6} ")
                & F.contains(F.substring(col, 1, 4096), F.lit("]("))
            )
            | (
                col.startswith("{")
                & F.contains(F.substring(col, 1, 4096), F.lit('"cells"'))
            )
        )
    # lenient replacement decode: crawls carry latin-1/broken-UTF-8
    # markup whose ASCII hrefs are still real edges — F.decode throws
    # MALFORMED_CHARACTER_CODING on them, make_valid_utf8 never does,
    # so the html leg is total over arbitrary bytes (junk binaries
    # simply match no href)
    markup = F.make_valid_utf8(col) if is_bin else col

    base_root = F.concat(
        F.substring_index(F.col(url_col), "://", 1),
        F.lit("://"),
        F.substring_index(F.substring_index(F.col(url_col), "://", -1), "/", 1),
    )
    base_dir = F.regexp_replace(F.col(url_col), "[^/]*$", "")
    html_edges = (
        pages.filter(~magic)
        .select(
            F.col(url_col).alias("src_url"),
            base_root.alias("_root"),
            base_dir.alias("_dir"),
            F.explode(
                F.regexp_extract_all(markup.alias("m"), F.lit(_HREF_RE), 1)
            ).alias("link"),
        )
        .select(
            "src_url",
            resolve_link(F.col("_root"), F.col("_dir"), F.col("link")).alias("target"),
        )
        .filter(F.col("target").isNotNull())
    )

    def doc_batches(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:  # noqa: F821
        import pyarrow as pa

        from toyocr_spark.extractor.doc import doc_links, is_doc
        from toyocr_spark.extractor.docx import docx_links, is_docx
        from toyocr_spark.extractor.eml import eml_links, is_eml
        from toyocr_spark.extractor.epub import epub_links, is_epub
        from toyocr_spark.extractor.mbox import is_mbox, mbox_links
        from toyocr_spark.extractor.icsleg import ics_links, is_ics
        from toyocr_spark.extractor.ipynb import ipynb_links, is_ipynb
        from toyocr_spark.extractor.markdown import is_markdown, markdown_links
        from toyocr_spark.extractor.mhtml import is_mhtml, mhtml_links
        from toyocr_spark.extractor.odp import is_odp
        from toyocr_spark.extractor.ods import is_ods
        from toyocr_spark.extractor.odt import is_odt, odt_links
        from toyocr_spark.extractor.opc import opc_hyperlinks
        from toyocr_spark.extractor.pdf import is_pdf, pdf_links
        from toyocr_spark.extractor.pptx import is_pptx
        from toyocr_spark.extractor.psleg import is_ps, ps_links
        from toyocr_spark.extractor.rtf import is_rtf, rtf_links
        from toyocr_spark.extractor.tarleg import is_tar, tar_links
        from toyocr_spark.extractor.wikitext import is_wikitext, wikitext_links
        from toyocr_spark.extractor.xlsx import is_xlsx
        from toyocr_spark.extractor.zipleg import is_zip_bundle, zip_links

        for b in it:
            srcs: list[str] = []
            targets: list[str] = []
            urls = b.column(0).to_pylist()
            bodies = b.column(1).to_pylist()
            for u, body in zip(urls, bodies):
                data = bytes(
                    body
                    if isinstance(body, (bytes, bytearray))
                    else str(body).encode("utf-8", "replace")
                )
                if is_docx(data):
                    links = docx_links(data)  # document-occurrence order
                elif is_epub(data):
                    links = epub_links(data)  # spine order, absolute only
                elif is_odt(data) or is_ods(data) or is_odp(data):
                    # every ODF subtype stores text:a hyperlinks in
                    # content.xml — one harvester serves the trio
                    links = odt_links(data)  # document order, absolute only
                elif is_xlsx(data) or is_pptx(data):
                    links = opc_hyperlinks(data)  # rels-order harvest
                elif is_zip_bundle(data):
                    links = zip_links(data)  # generic bundle: member walk
                elif is_rtf(data):
                    links = rtf_links(data)  # field order, absolute only
                elif is_doc(data):
                    links = doc_links(data)  # CP order, absolute only
                elif is_mhtml(data):
                    links = mhtml_links(data)  # decoded parts, absolute only
                elif is_mbox(data):
                    links = mbox_links(data)  # archive walk, per-message eml rule
                elif is_eml(data):
                    links = eml_links(data)  # rendered parts, quotes/sig excluded
                elif is_tar(data):
                    links = tar_links(data)  # member walk, absolute only
                elif is_ics(data):
                    links = ics_links(data)  # URL props + description urls
                elif is_ipynb(data):
                    links = ipynb_links(data)  # markdown cells only
                elif is_wikitext(data):
                    links = wikitext_links(data)  # external links only
                elif is_markdown(data):
                    links = markdown_links(data)  # absolute only, fences excluded
                elif is_pdf(data):
                    links = pdf_links(data)
                elif is_ps(data):
                    links = ps_links(data)  # pdfmark /URI annotations
                elif utf8_textish(data):
                    # kernel-gate false positive on a TEXT page
                    # (md-like prose, text with 'ustar' at offset
                    # 257): mine absolute hrefs so loose routing
                    # never silently zeroes a text page's edges
                    # (relative resolution stays a JVM-leg feature)
                    text = data.decode("utf-8", errors="replace")
                    links = [m.group(1) for m in ABS_HREF_RE.finditer(text)]
                else:
                    # opaque binary (generic zip, junk): stored
                    # members' raw bytes must never be href-mined
                    links = []
                for t in links:
                    srcs.append(u)
                    targets.append(t)
            yield pa.RecordBatch.from_arrays(
                [pa.array(srcs, pa.string()), pa.array(targets, pa.string())],
                names=["src_url", "target"],
            )

    doc_edges = pages.filter(magic).select(
        F.col(url_col).alias("src_url"), col.alias("body")
    ).mapInArrow(doc_batches, "src_url string, target string")

    return html_edges.unionByName(doc_edges)
