"""Deterministic TTML fixture builder — caption-track-shaped XML with
the machinery a crawl-scale extractor must drop: a <head> subtree
(title/copyright metadata, styling, layout regions), cue timing and
style/region attributes, and a cue-level <metadata> element. Raw-XML
string assembly (not an ElementTree serializer), so
extractor/ttmlleg.py is tested against an independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations

from xml.sax.saxutils import escape


def build_ttml(
    cues: list[str],
    *,
    legacy_ns: bool = False,
    title: str = "Planted title chrome",
    copyright_text: str = "planted copyright chrome",
    with_spans: bool = False,
    with_br: bool = False,
) -> bytes:
    """Assemble a caption document: <head> metadata/styling/layout
    chrome, then one timed <p> cue per entry in a <div>; ``with_br``
    splits each cue across a <br/>; ``with_spans`` wraps the first
    word of each cue in a styled <span>."""
    ns = (
        "http://www.w3.org/2006/10/ttaf1"
        if legacy_ns
        else "http://www.w3.org/ns/ttml"
    )
    body_cues: list[str] = []
    for j, c in enumerate(cues):
        t = escape(c)
        if with_br:
            # split BEFORE span wrapping: a cut inside a start tag
            # would emit malformed XML, not a fixture
            half = len(t) // 2
            cut = t.rfind(" ", 0, half)
            if cut > 0:
                t = t[:cut] + "<br/>" + t[cut + 1 :]
        if with_spans:
            w = t.split(" ", 1)
            if not w[0].startswith("<"):
                t = f'<span tts:fontStyle="italic">{w[0]}</span>'
                if len(w) > 1:
                    t += f" {w[1]}"
        body_cues.append(
            f'<p begin="{j}.000s" end="{j + 3}.500s" region="r1" '
            f'style="s1">{t}</p>'
        )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<tt xmlns="{ns}" xmlns:tts="{ns}#styling" xml:lang="en">\n'
        "<head>\n"
        f"<metadata><title>{escape(title)}</title>"
        f"<copyright>{escape(copyright_text)}</copyright></metadata>\n"
        '<styling><style xml:id="s1" tts:color="white" '
        'tts:fontFamily="planted chrome font"/></styling>\n'
        '<layout><region xml:id="r1" tts:origin="10% 80%" '
        'tts:extent="80% 20%"/></layout>\n'
        "</head>\n"
        "<body><div>\n" + "\n".join(body_cues) + "\n</div></body>\n</tt>\n"
    ).encode("utf-8")
