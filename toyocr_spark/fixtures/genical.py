"""Deterministic iCalendar (.ics) fixture builder — calendar feeds
with the chrome a crawl-scale extractor must drop: calendar headers,
a VTIMEZONE component, per-event structured metadata (UID/DTSTART/
ORGANIZER/ATTENDEE/RRULE/LOCATION), and a VALARM sub-component whose
DESCRIPTION is reminder chrome. Pure string assembly with hand-rolled
RFC 5545 TEXT escaping and §3.1 75-octet line folding, so
extractor/icsleg.py is tested against an independent writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations

FOLD_AT = 75


def _escape(value: str) -> str:
    return (
        value.replace("\\", "\\\\")
        .replace(";", "\\;")
        .replace(",", "\\,")
        .replace("\n", "\\n")
    )


def _fold(line: str) -> list[str]:
    """RFC 5545 §3.1: lines longer than 75 octets fold with a
    CRLF + single space; continuation lines carry the leading space
    (fixtures are ASCII, so octets == chars)."""
    if len(line) <= FOLD_AT:
        return [line]
    out = [line[:FOLD_AT]]
    rest = line[FOLD_AT:]
    while rest:
        out.append(" " + rest[: FOLD_AT - 1])
        rest = rest[FOLD_AT - 1 :]
    return out


def build_ics(
    events: list[tuple[str, str]],
    *,
    with_alarm: bool = True,
    location: str = "location chrome hall",
    multiline_description: bool = False,
) -> bytes:
    """Assemble a calendar: headers, a VTIMEZONE block, then one
    VEVENT per (summary, description) with the full metadata battery.
    `multiline_description` appends an escaped-\\n second paragraph
    `'next paragraph of ' + description` to each event."""
    lines: list[str] = [
        "BEGIN:VCALENDAR",
        "VERSION:2.0",
        "PRODID:-//fixture calendar chrome//EN",
        "CALSCALE:GREGORIAN",
        "METHOD:PUBLISH",
        "BEGIN:VTIMEZONE",
        "TZID:Etc/UTC",
        "BEGIN:STANDARD",
        "DTSTART:19700101T000000",
        "TZOFFSETFROM:+0000",
        "TZOFFSETTO:+0000",
        "TZNAME:timezone chrome label",
        "END:STANDARD",
        "END:VTIMEZONE",
    ]
    for i, (summary, description) in enumerate(events):
        desc = description
        if multiline_description:
            desc = f"{description}\nnext paragraph of {description}"
        lines += [
            "BEGIN:VEVENT",
            f"UID:fixture-{i}@cal.example",
            "DTSTAMP:20240101T000000Z",
            "DTSTART;TZID=Etc/UTC:20240101T090000",
            "DTEND;TZID=Etc/UTC:20240101T100000",
            f"SUMMARY;LANGUAGE=en:{_escape(summary)}",
        ]
        lines += _fold(f"DESCRIPTION:{_escape(desc)}")
        lines += [
            f"LOCATION:{_escape(location)}",
            "ORGANIZER;CN=Organizer Chrome:mailto:org@cal.example",
            "ATTENDEE;CN=Attendee Chrome:mailto:att@cal.example",
            "RRULE:FREQ=WEEKLY;COUNT=4",
            "STATUS:CONFIRMED",
            f"URL:https://cal.example/event/{i}",
        ]
        if with_alarm:
            lines += [
                "BEGIN:VALARM",
                "ACTION:DISPLAY",
                "DESCRIPTION:alarm reminder chrome text",
                "TRIGGER:-PT15M",
                "END:VALARM",
            ]
        lines += ["END:VEVENT"]
    lines += ["END:VCALENDAR", ""]
    return "\r\n".join(lines).encode("utf-8")
