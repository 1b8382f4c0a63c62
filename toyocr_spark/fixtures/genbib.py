"""Deterministic BibTeX fixture builder — bibliography-shaped files
with the machinery a crawl-scale extractor must drop: @string macro
definitions, an @comment entry, an @preamble, and the full
bibliographic-metadata field battery (authors, journal macro refs,
year/volume/pages/doi/publisher). Pure string assembly, so
extractor/bibleg.py is tested against an independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations


def build_bib(
    entries: list[tuple[str, str | None]],
    *,
    author: str = "Planted, Author Chrome and Decoy, Second Chrome",
    journal_macro: str = "Planted Journal Chrome",
    comment: str = "planted comment chrome",
    preamble: str = "planted preamble chrome",
    quoted_index: int | None = None,
    concat_index: int | None = None,
) -> bytes:
    """Assemble a database: @string/@preamble/@comment machinery,
    then one @article per (title, abstract) pair with the metadata
    battery; ``quoted_index`` uses \"…\" value delimiters for that
    entry's title, ``concat_index`` splits that entry's title across
    a ``#`` concatenation."""
    out: list[str] = [
        f'@string{{jrnl = "{journal_macro}"}}',
        f"@preamble{{ \"{preamble}\" }}",
        f"@comment{{ {comment} }}",
        "",
    ]
    for j, (title, abstract) in enumerate(entries):
        if j == quoted_index:
            tfield = f'title = "{title}"'
        elif j == concat_index:
            half = len(title) // 2
            cut = title.rfind(" ", 0, half)
            cut = cut if cut > 0 else half
            tfield = (
                f'title = {{{title[:cut]}}} # {{ }} # {{{title[cut + 1 :]}}}'
            )
        else:
            tfield = f"title = {{{title}}}"
        out += [
            f"@article{{planted{j},",
            f"  author = {{{author}}},",
            f"  {tfield},",
            "  journal = jrnl,",
            f"  year = {1990 + j},",
            "  volume = {12},",
            "  pages = {100--110},",
            f"  doi = {{10.0000/planted.{j}}},",
        ]
        if abstract is not None:
            out.append(f"  abstract = {{{abstract}}},")
        out += ["  publisher = {Planted Publisher Chrome},", "}", ""]
    return "\n".join(out).encode("utf-8")
