"""Deterministic PostScript (.ps) fixture builder — two-column
academic-paper-shaped page programs with the chrome a crawl-scale
extractor must drop: DSC comments, a prologue of procedure
DEFINITIONS whose bodies contain show operators that must never
execute, and pdfmark link annotations. Pure string assembly with
hand-rolled string escaping, so extractor/psleg.py is tested against
an independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations


def _esc(text: str) -> str:
    return text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")


def paragraph_ps(x: int, y: int, size: int, leading: int, lines: list[str]) -> str:
    """One paragraph: set the font, then per line `x y moveto (..)
    show` with y stepping down by `leading`."""
    ops = [f"/Helvetica findfont {size} scalefont setfont"]
    for i, line in enumerate(lines):
        ops.append(f"{x} {y - i * leading} moveto ({_esc(line)}) show")
    return "\n".join(ops)


def build_ps(
    ops: list[str],
    *,
    pages: list[list[str]] | None = None,
    with_prologue_trap: bool = True,
    uri: str | None = None,
) -> bytes:
    """Assemble a DSC-conformant program: header comments, an optional
    prologue procedure whose BODY holds a decoy show (the
    definitions-never-execute trap), the given operator paragraphs,
    then optional extra pages (each after a showpage)."""
    out: list[str] = [
        "%!PS-Adobe-3.0",
        "%%BoundingBox: 0 0 612 792",
        "%%Title: dsc title comment chrome",
        "%%Creator: fixture generator chrome",
        "%%Pages: " + str(1 + len(pages or [])),
        "%%EndComments",
    ]
    if with_prologue_trap:
        out += [
            "/decoy {",
            "  100 100 moveto (prologue decoy text never shown) show",
            "} def",
        ]
    if uri is not None:
        out.append(
            f"[ /Rect [50 50 200 60] /Action << /Subtype /URI /URI ({_esc(uri)}) >>"
            " /Subtype /Link /ANN pdfmark"
        )
    out.extend(ops)
    for extra in pages or []:
        out.append("showpage")
        out.extend(extra)
    out += ["showpage", "%%EOF", ""]
    return "\n".join(out).encode("latin-1", errors="replace")
