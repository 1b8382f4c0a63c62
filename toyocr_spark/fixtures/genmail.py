"""Deterministic email (.eml) fixture builder — mailing-list-shaped
messages with the chrome a crawl-scale extractor must drop: routing
headers (Received/List-Id, never read), '>'-quoted previous-message
lines, a '-- ' signature block, and an opaque attachment part. Pure
string assembly with hand-rolled MIME boundaries and transfer
encodings, so extractor/eml.py is tested against an independent
writer.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations

import base64
import quopri


def _encode(body: str, encoding: str) -> tuple[str, str]:
    if encoding == "base64":
        return base64.b64encode(body.encode("utf-8")).decode("ascii"), "base64"
    if encoding == "quoted-printable":
        return (
            quopri.encodestring(body.encode("utf-8")).decode("ascii"),
            "quoted-printable",
        )
    return body, "7bit"


def build_eml(
    subject: str,
    paras: list[str],
    *,
    sender: str = "Poster Name <poster@list.example>",
    quoted: str = "quoted previous message chrome",
    signature: str = "signature chrome line",
    encoding: str = "7bit",
    html_alternative: bool = False,
    with_attachment: bool = True,
    list_id: str = "dev.list.example",
) -> bytes:
    """Assemble a list post: routing headers, then a multipart/mixed
    body whose first part is the text (or a multipart/alternative
    pair when `html_alternative`), a '>'-quoted reply plant, a '-- '
    signature plant, and an opaque attachment part. `encoding` sets
    the text part's Content-Transfer-Encoding."""
    body_lines: list[str] = []
    for i, p in enumerate(paras):
        if i == 1 or (i == 0 and len(paras) == 1):
            body_lines += [f"> {quoted}", f"> more {quoted}", ""]
        body_lines += [p, ""]
    body_lines += ["-- ", signature, f"second {signature}"]
    body = "\n".join(body_lines)
    enc_body, cte = _encode(body, encoding)

    bnd = "====eml-fixture-boundary===="
    out: list[str] = [
        "Return-Path: <poster@list.example>",
        "Received: from relay.example (relay.example [192.0.2.1])",
        "\tby archive.example with SMTP; Mon, 1 Jan 2024 00:00:00 +0000",
        f"From: {sender}",
        "To: dev@list.example",
        f"Subject: {subject}",
        "Date: Mon, 1 Jan 2024 00:00:00 +0000",
        "Message-ID: <fixture@list.example>",
        f"List-Id: routing header chrome <{list_id}>",
        "MIME-Version: 1.0",
        f'Content-Type: multipart/mixed; boundary="{bnd}"',
        "",
        "preamble chrome never rendered",
        f"--{bnd}",
    ]
    if html_alternative:
        alt = "====eml-alt-boundary===="
        html = (
            "<html><body>"
            + "".join(f"<p>html twin {p}</p>" for p in paras)
            + "</body></html>"
        )
        enc_html, hcte = _encode(html, encoding)
        out += [
            f'Content-Type: multipart/alternative; boundary="{alt}"',
            "",
            f"--{alt}",
            'Content-Type: text/plain; charset="utf-8"',
            f"Content-Transfer-Encoding: {cte}",
            "",
            enc_body,
            f"--{alt}",
            'Content-Type: text/html; charset="utf-8"',
            f"Content-Transfer-Encoding: {hcte}",
            "",
            enc_html,
            f"--{alt}--",
        ]
    else:
        out += [
            'Content-Type: text/plain; charset="utf-8"',
            f"Content-Transfer-Encoding: {cte}",
            "",
            enc_body,
        ]
    if with_attachment:
        out += [
            f"--{bnd}",
            "Content-Type: application/octet-stream",
            'Content-Disposition: attachment; filename="patch.bin"',
            "Content-Transfer-Encoding: base64",
            "",
            base64.b64encode(b"attachment chrome payload").decode("ascii"),
        ]
    out += [f"--{bnd}--", ""]
    return "\n".join(out).encode("utf-8")


def build_mbox(
    messages: list[bytes],
    *,
    sender: str = "poster@list.example",
    escape_plant: bool = False,
) -> bytes:
    """Assemble a Unix mbox archive from single-message fixtures:
    each message gets an asctime postmark line and a trailing blank
    line (the mbox convention — boundaries only count after a blank
    line). `escape_plant` appends a message whose body carries an
    mboxo-escaped ">From " line that must UNescape to a "From "
    content line, plus a decoy unescaped "From " mid-paragraph that
    must NOT split the archive."""
    postmark = f"From {sender} Mon Jan  1 00:00:00 2024\n".encode("ascii")
    out = bytearray()
    for msg in messages:
        out += postmark
        body = bytes(msg)
        # mboxo discipline: escape any body line that would otherwise
        # forge a postmark after a blank line
        body = body.replace(b"\n\nFrom ", b"\n\n>From ")
        out += body
        if not body.endswith(b"\n"):
            out += b"\n"
        out += b"\n"
    if escape_plant:
        out += postmark
        out += (
            b"From: Escape Plant <plant@list.example>\n"
            b"To: dev@list.example\n"
            b"Subject: escape plant subject\n"
            b"Date: Mon, 1 Jan 2024 00:00:00 +0000\n"
            b"Message-ID: <plant@list.example>\n"
            b"\n"
            b"first plant paragraph\n"
            b"\n"
            b">From the archive this line is content\n"
            b"From mid-paragraph this never splits 2024\n"
            b"\n"
        )
    return bytes(out)
