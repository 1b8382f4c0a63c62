"""FictionBook 2 fixture writer — an INDEPENDENT serializer (raw XML
text, never ElementTree) so the builder cannot share a traversal bug
with the leg's parser (the gendocx/genpdf discipline). Emits the
namespaced form real FB2 writers produce, including the metadata
description block and a notes body, both of which the tokenizer must
exclude."""

from __future__ import annotations

from xml.sax.saxutils import escape

_NS = "http://www.gramota.ru/slovari/fb2/"
_XLINK = "http://www.w3.org/1999/xlink"


def build_fb2(
    book_title: str,
    chapter_title: str,
    paragraphs: list[str],
    stanza_lines: list[str] | None = None,
    note_text: str = "popup footnote text that must never surface",
) -> bytes:
    """One-chapter FB2 file: description metadata (chrome), a main
    body with a titled section of prose paragraphs (one carrying an
    inline note link), optionally a poem stanza, and a named notes
    body (structural exclusion)."""
    ps = "\n".join(f"      <p>{escape(p)}</p>" for p in paragraphs)
    poem = ""
    if stanza_lines:
        vs = "\n".join(f"          <v>{escape(v)}</v>" for v in stanza_lines)
        poem = f"      <poem>\n        <stanza>\n{vs}\n        </stanza>\n      </poem>\n"
    # trailing catalog nav: link-dominated paragraph the link-density
    # rule must drop (placed after the prose so the kept island stays
    # contiguous — the gendocx plant position)
    nav = (
        '      <p><a l:href="https://lib.example/catalog">catalog link</a> '
        '<a l:href="https://lib.example/series">series link</a></p>\n'
    )
    xml = f"""<?xml version="1.0" encoding="utf-8"?>
<FictionBook xmlns="{_NS}" xmlns:l="{_XLINK}">
  <description>
    <title-info>
      <genre>prose</genre>
      <book-title>{escape(book_title)}</book-title>
      <author><first-name>Metadata</first-name><last-name>Chrome</last-name></author>
    </title-info>
  </description>
  <body>
    <section>
      <title><p>{escape(chapter_title)}</p></title>
{ps}
{poem}{nav}    </section>
  </body>
  <body name="notes">
    <section id="n1">
      <p>{escape(note_text)}</p>
    </section>
  </body>
</FictionBook>
"""
    return xml.encode("utf-8")
