"""Deterministic DocBook fixture builder — technical-article-shaped
XML with the structural boilerplate a crawl-scale extractor must
drop: an <info> block (author/date/abstract/legalnotice metadata,
never read), a <note> admonition, a <footnote>, <indexterm> entries,
an XML comment, and a ulink-dominated navigation para (dies by the
shared density rule). Pure string assembly (raw XML text, not an
ElementTree serializer), so extractor/docbookleg.py is tested against
an independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations

from xml.sax.saxutils import escape


def nav_para(host: str) -> str:
    """A link-dominated navigation para: three ulinks joined by
    separators — link text dominates, the scorer must drop it."""
    return (
        f'<para><ulink url="https://{host}/">Home</ulink> | '
        f'<ulink url="https://{host}/about">About</ulink> | '
        f'<ulink url="https://{host}/contact">Contact</ulink></para>'
    )


def build_docbook(
    title: str,
    paras: list[str],
    *,
    version: int = 4,
    host: str = "nav.example",
    author: str = "Planted Author Chrome",
    abstract: str = "planted abstract chrome",
    note: str = "planted note chrome",
    footnote: str = "planted footnote chrome",
    section: str | None = None,
    items: list[str] | None = None,
    listing: list[str] | None = None,
    table_rows: list[list[str]] | None = None,
    links: list[tuple[str, str]] | None = None,
) -> bytes:
    """Assemble a DocBook article: DB4 (articleinfo + DOCTYPE, title
    as direct child) or DB5 (namespace, title inside <info>) per
    ``version``; an XML comment, the info metadata battery, a nav
    plant, body paras (the FIRST carries an <emphasis> span and a
    <footnote> that must strip), a <note> admonition, then optional
    sect1 / itemizedlist / programlisting / CALS-table content.
    ``links`` embeds ulinks at the end of the LAST para."""
    t = escape(title)
    meta = (
        f"<author><surname>{author}</surname></author>"
        f"<pubdate>2024-01-01</pubdate>"
        f"<abstract><para>{abstract}</para></abstract>"
        f"<legalnotice><para>{abstract} legal</para></legalnotice>"
    )
    if version >= 5:
        head = (
            '<article xmlns="http://docbook.org/ns/docbook" '
            'xmlns:xlink="http://www.w3.org/1999/xlink" version="5.0">'
            f"<info><title>{t}</title>{meta}</info>"
        )
    else:
        head = (
            '<!DOCTYPE article PUBLIC "-//OASIS//DTD DocBook XML V4.5//EN" '
            '"http://www.oasis-open.org/docbook/xml/4.5/docbookx.dtd">'
            f"<article><title>{t}</title><articleinfo>{meta}</articleinfo>"
        )
    out: list[str] = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        "<!-- planted comment chrome -->",
        head,
        "<indexterm><primary>planted index chrome</primary></indexterm>",
        # nav after the title (XML roots lead with their title): the
        # link-dominated para is dropped AND not absorbable, and the
        # title stays adjacent to the body below it in block order
        # only if nav sits between title and... so nav goes AFTER the
        # body instead (the adoc footer-nav ordering)
    ]
    body = list(paras)
    esc = [escape(p) for p in body]
    if esc:
        words = esc[0].split(" ", 1)
        first = f"<emphasis>{words[0]}</emphasis>"
        if len(words) > 1:
            first += f" {words[1]}"
        esc[0] = f"{first}<footnote><para>{footnote}</para></footnote>"
    if links and esc:
        tail = " ".join(
            f'<ulink url="{u}">{escape(x)}</ulink>' for x, u in links
        )
        esc[-1] = f"{esc[-1]} {tail}"
    for p in esc:
        out.append(f"<para>{p}</para>")
    out.append(f"<note><para>{note}</para></note>")
    if section:
        out.append(f"<sect1><title>{escape(section)}</title>")
        out.append("<para>section body paragraph long enough to keep here</para>")
        out.append("</sect1>")
    if items:
        out.append("<itemizedlist>")
        out += [f"<listitem><para>{escape(it)}</para></listitem>" for it in items]
        out.append("</itemizedlist>")
    if listing:
        out.append(
            "<programlisting>" + escape("\n".join(listing)) + "</programlisting>"
        )
    if table_rows:
        out.append('<informaltable><tgroup cols="2"><tbody>')
        for r in table_rows:
            out.append(
                "<row>" + "".join(f"<entry>{escape(c)}</entry>" for c in r) + "</row>"
            )
        out.append("</tbody></tgroup></informaltable>")
    out.append(nav_para(host))
    out.append("</article>")
    return "\n".join(out).encode("utf-8")
