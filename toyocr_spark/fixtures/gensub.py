"""Deterministic subtitle fixture builder (WebVTT + SRT) — caption
tracks with the structural chrome a crawl-scale extractor must drop:
VTT header metadata and NOTE comment blocks (never read), cue
identifiers/counters, timing lines with cue settings, and inline cue
markup (<v Speaker>, <i>) that must resolve to plain text. Pure
string assembly, so extractor/subtitles.py is tested against an
independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations


def _stamp(i: int, sep: str) -> tuple[str, str]:
    """Deterministic 4-second cue window for cue index i."""
    a, b = 4 * i, 4 * i + 4
    return (
        f"00:{a // 60:02d}:{a % 60:02d}{sep}000",
        f"00:{b // 60:02d}:{b % 60:02d}{sep}000",
    )


def build_vtt(
    cues: list[str],
    *,
    note: str = "planted comment chrome never extracts",
    kind: str = "captions",
    with_settings: bool = True,
    with_idents: bool = True,
) -> bytes:
    """Assemble a WebVTT file: header + metadata lines, a NOTE block,
    then one cue block per entry (identifier, timing with optional
    settings, the cue text — which may carry inline markup)."""
    out: list[str] = ["WEBVTT - planted header chrome", f"Kind: {kind}", "Language: en", ""]
    out += [f"NOTE {note}", ""]
    for i, cue in enumerate(cues):
        if with_idents:
            out.append(str(i + 1))
        start, end = _stamp(i, ".")
        settings = " position:10% align:start" if with_settings and i == 0 else ""
        out.append(f"{start} --> {end}{settings}")
        out.append(cue)
        out.append("")
    return "\n".join(out).encode("utf-8")


def build_srt(cues: list[str]) -> bytes:
    """Assemble an SRT file: counter, comma-millisecond timing, cue
    text, blank separator — the two-line opener the structural gate
    demands."""
    out: list[str] = []
    for i, cue in enumerate(cues):
        start, end = _stamp(i, ",")
        out += [str(i + 1), f"{start} --> {end}", cue, ""]
    return "\n".join(out).encode("utf-8")
