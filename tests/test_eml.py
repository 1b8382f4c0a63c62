"""Email (.eml) extraction: the header-block structural gate and its
traps, subject-as-title with RFC 2047 decode, transfer-encoding
decode, the multipart/alternative pick-one rule, quote/signature/
attachment chrome, HTML-part re-entry, link mining, fuzz determinism,
dispatch precedence — the same contract battery every format carries
(reference analogue: the byte -> array decode seam at
/root/reference/data/dataset_mapper.py:151-155)."""

import random

from toyocr_spark.extractor.core import extract
from toyocr_spark.extractor.eml import eml_links, is_eml, tokenize_eml
from toyocr_spark.extractor.mhtml import is_mhtml
from toyocr_spark.fixtures.genmail import build_eml

_PARAS = [
    "first paragraph of the post body long enough to keep here",
    "second paragraph replying inline with more content to keep",
]


def _doc(**kw) -> bytes:
    return build_eml("Post Subject Line Here", _PARAS, **kw)


# --- gate -----------------------------------------------------------------


def test_gate_accepts_mail_and_rejects_lookalikes():
    assert is_eml(_doc())
    assert not is_mhtml(_doc())
    # prose mentioning headers mid-text: first line not header-shaped
    assert not is_eml(b"the mail had From: and Subject: fields inside prose")
    # header-shaped first line but no mail headers (generic key: value)
    assert not is_eml(b"Key: value\nOther: thing\nbody text here\n")
    assert not is_eml(b"<html><body>From: x Subject: y</body></html>")
    assert not is_eml(None)


def test_mhtml_outranks_eml():
    """A saved web page carries From:/Subject:-looking headers too —
    multipart/related must stay on the MHTML leg."""
    mht = (
        b"From: <Saved by Fixture>\n"
        b"Subject: saved page\n"
        b"Date: Mon, 1 Jan 2024 00:00:00 +0000\n"
        b"MIME-Version: 1.0\n"
        b'Content-Type: multipart/related; boundary="b"\n'
        b"\n--b\n"
        b"Content-Type: text/html\n"
        b"\n<html><body><p>saved page body text long enough</p></body></html>\n"
        b"--b--\n"
    )
    assert is_mhtml(mht) and is_eml(mht)
    r = extract(mht)
    # the MHTML leg renders only the html part: no subject title block
    assert "saved page body text long enough" in r.text
    assert "saved page\n" not in r.text + "\n"


# --- structure / chrome -------------------------------------------------------


def test_subject_title_body_order_and_chrome_dies():
    r = extract(_doc())
    lines = r.text.split("\n")
    assert lines[0] == "Post Subject Line Here"
    assert lines[1:3] == _PARAS
    assert r.spans[0][2] == "title"
    assert "quoted previous message" not in r.text  # > quotes
    assert "signature chrome" not in r.text  # -- sig block
    assert "attachment chrome" not in r.text  # attachment part
    assert "routing header chrome" not in r.text  # List-Id
    assert "relay.example" not in r.text  # Received
    assert "preamble chrome" not in r.text  # MIME preamble


def test_transfer_encodings_decode():
    for enc in ("base64", "quoted-printable"):
        r = extract(_doc(encoding=enc))
        assert r.text.split("\n")[1:3] == _PARAS, enc


def test_alternative_renders_exactly_once_plain_preferred():
    r = extract(_doc(html_alternative=True))
    assert r.text.split("\n")[1:3] == _PARAS
    assert "html twin" not in r.text  # the alternative did not double


def test_rfc2047_subject_decodes():
    m = build_eml("=?utf-8?q?Caf=C3=A9_subject_line_here?=", _PARAS)
    r = extract(m)
    assert r.text.split("\n")[0] == "Café subject line here"


def test_html_only_mail_reenters_html_tokenizer():
    raw = (
        b"From: poster@list.example\n"
        b"Subject: html only post subject\n"
        b"Date: Mon, 1 Jan 2024 00:00:00 +0000\n"
        b"MIME-Version: 1.0\n"
        b'Content-Type: text/html; charset="utf-8"\n'
        b"\n<html><body><nav><a href='/x'>nav one</a> <a href='/y'>nav two</a></nav>"
        b"<p>html body paragraph long enough to keep around</p></body></html>\n"
    )
    assert is_eml(raw)
    r = extract(raw)
    assert "html body paragraph long enough to keep around" in r.text
    assert "nav one" not in r.text  # link density still applies


# --- link mining ---------------------------------------------------------------


def test_links_bare_urls_kept_quotes_and_sig_excluded():
    m = build_eml(
        "T",
        ["see https://x.example/ref for details", "> quoted https://never.example/q"],
        signature="sig with https://sig.example/never inside",
        with_attachment=False,
    )
    links = eml_links(m)
    assert links == ["https://x.example/ref"]
    assert eml_links(b"\x00junk") == []


def test_nesting_bomb_trims_deterministically():
    """Crafted deeply nested multiparts must trim (MAX_NESTING), and a
    pathological 2000-deep bomb must quiet-skip — never an exception
    inside the kernel."""
    def nest(depth: int) -> bytes:
        inner = "Content-Type: text/plain\n\ndeep payload text long enough to keep\n"
        for i in range(depth):
            b = f"b{i}"
            inner = (
                f'Content-Type: multipart/mixed; boundary="{b}"\n\n--{b}\n'
                + inner
                + f"\n--{b}--\n"
            )
        return (
            "From: a@x\nSubject: deep nesting subject here\n"
            "Date: Mon, 1 Jan 2024 00:00:00 +0000\nMIME-Version: 1.0\n" + inner
        ).encode()

    # depth 20 parses fine; the walk trims at MAX_NESTING: subject only
    blocks = tokenize_eml(nest(20))
    assert [b.text for b in blocks] == ["deep nesting subject here"]
    # depth 4 is within the bound: payload renders
    blocks = tokenize_eml(nest(4))
    assert blocks[-1].text == "deep payload text long enough to keep"
    # the 2000-deep bomb: deterministic result, no exception
    assert tokenize_eml(nest(2000)) == tokenize_eml(nest(2000))


# --- fuzz / determinism -------------------------------------------------------


def test_fuzz_determinism_truncation_and_bitflips():
    base = _doc(encoding="base64")
    rng = random.Random(17)
    for _ in range(60):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        cut = bytes(buf[: rng.randrange(1, len(buf))])
        assert extract(cut) == extract(cut)
