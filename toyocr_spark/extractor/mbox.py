"""Unix mbox tokenizer (.mbox, mboxo/mboxrd) — the twenty-third leg of
the format dispatch and the mail family's CONTAINER: a whole mailing
list archive in one file ("From "-separated RFC 5322 messages), the
shape pipermail/marc/lkml monthly dumps actually ship in. The tar
discipline applied to mail: the container walk only resolves WHICH
byte ranges are messages; each message then re-enters the single-mail
tokenizer (extractor/eml.py), so the MIME walk, alternative pick-one,
quote/signature stripping and transfer decode stay ONE rule set.

Reference analogue: the byte -> array decode seam shared by every
container leg (/root/reference/data/dataset_mapper.py:151-155).

SNIFF DISCIPLINE: the gate demands the postmark line prose cannot
fake — a FIRST line `From <addr> <asctime>` (no colon after "From",
which is why a real single mail, whose first line is header-shaped
`Name: value`, can never claim this gate and vice versa) whose tail
is an asctime-shaped date ending in a 4-digit year, followed by a
header block with line-anchored From:/Subject: evidence (the eml
rule). Dispatch order: before is_eml (family container outranks the
single message; the eml gate is structurally disjoint anyway).

mboxo ESCAPING: archivers prefix body lines that start with "From "
with '>' (">From hello" in the file means "From hello" in the mail).
The walk unescapes `^>+From ` by stripping ONE '>' before the message
re-enters the eml tokenizer — without this, an escaped body line
would wrongly die as a '>'-quote.

Boundedness: at most MAX_MESSAGES messages walk (the container cap
every bundle leg carries); message boundaries only split on a
postmark line at start-of-file or after a BLANK line (the mbox
convention), so an unescaped "From " mid-paragraph in a malformed
archive cannot explode the message count. Determinism: malformed
archives tokenize to whatever the bounded walk yields — same bytes,
same blocks, never an exception."""

from __future__ import annotations

import re

from toyocr_spark.extractor.tokenizer import Block

MAX_MESSAGES = 64

# postmark: "From " + envelope sender + asctime date (ends in a
# 4-digit year). No colon after From — disjoint from header lines.
_POSTMARK = re.compile(rb"^From [^\s:]+ .*\b\d{4}\r?$")
# message starts: start-of-data, or a postmark line after a blank line
_SPLIT = re.compile(rb"(?:\A|(?<=\n\n)|(?<=\n\r\n))From [^\s:]+ [^\n]*\b\d{4}\r?\n")
_UNESCAPE = re.compile(rb"(?m)^>(>*From )")
_EV_FROM = re.compile(rb"(?mi)^from:[ \t]")
_EV_SUBJECT = re.compile(rb"(?mi)^subject:[ \t]")


def is_mbox(data: bytes | str | None) -> bool:
    """Structural gate (see module docstring): asctime-shaped postmark
    FIRST line plus line-anchored From:/Subject: headers in the head."""
    if not isinstance(data, (bytes, bytearray)):
        return False
    head = bytes(data[:4096])
    first = head.split(b"\n", 1)[0]
    if not _POSTMARK.match(first):
        return False
    return bool(_EV_FROM.search(head) and _EV_SUBJECT.search(head))


def _messages(data: bytes):
    """Yield each message's bytes (postmark stripped, mboxo-unescaped)
    in archive order, bounded — the shared walk under tokenize_mbox
    and mbox_links."""
    raw = bytes(data)
    starts = [m for m in _SPLIT.finditer(raw)]
    if not starts:
        return
    for i, m in enumerate(starts[:MAX_MESSAGES]):
        end = starts[i + 1].start() if i + 1 < len(starts) else len(raw)
        body = raw[m.end() : end]
        yield _UNESCAPE.sub(rb"\1", body)


def tokenize_mbox(data: bytes) -> list[Block]:
    """Walk the archive: each message re-enters the single-mail
    tokenizer (subject title + rendered parts, quotes/signatures
    dropped), ordinals renumbered across messages (the tar/MHTML
    container discipline). Malformed archives tokenize to []."""
    from toyocr_spark.extractor.eml import tokenize_eml

    blocks: list[Block] = []
    for msg in _messages(data):
        try:
            blocks.extend(tokenize_eml(msg))
        except Exception:  # noqa: BLE001 — message-local quiet skip
            continue
    for i, b in enumerate(blocks):
        b.ordinal = i
    return blocks


def mbox_links(data: bytes) -> list[str]:
    """Outbound ABSOLUTE links in archive order, duplicates preserved
    — the mbox leg of outlink mining: each message contributes its
    eml_links (rendered parts only, quotes/signatures excluded with
    their construct). Malformed archives -> []."""
    from toyocr_spark.extractor.eml import eml_links

    out: list[str] = []
    for msg in _messages(data):
        try:
            out.extend(eml_links(msg))
        except Exception:  # noqa: BLE001 — message-local quiet skip
            continue
    return out
