"""NDJSON leg (extractor/ndjsonleg.py): structural-gate precision
against the '{'-led family and prose, record-walk semantics (title
blocks, first-text-key-wins, paragraph splitting, metadata chrome,
truncated-line skip), bounds, and dispatch precedence vs ipynb."""

from __future__ import annotations

import json

from toyocr_spark.extractor.core import dispatch_blocks, extract
from toyocr_spark.extractor.ndjsonleg import is_ndjson, tokenize_ndjson


def _shard(recs) -> bytes:
    return "\n".join(json.dumps(r) for r in recs).encode()


def test_gate_precision():
    assert is_ndjson(_shard([{"text": "real prose here"}]))
    assert is_ndjson(_shard([{"content": "content-keyed record"}]))
    # a JSON object without a text-ish string field: not a dataset shard
    assert not is_ndjson(_shard([{"id": 1, "n": 2}]))
    assert not is_ndjson(b'{"text": ""}')  # empty text is no evidence
    assert not is_ndjson(b"plain prose line\nanother line")
    assert not is_ndjson(b"<html><body>x</body></html>")
    assert not is_ndjson(b"# markdown heading\n\nbody [l](u)")
    assert not is_ndjson(b'{"broken json')
    assert not is_ndjson(None)
    # a JSON ARRAY head is not NDJSON
    assert not is_ndjson(b'[{"text": "x"}]')


def test_record_walk_semantics():
    recs = [
        {"title": "T One", "text": "para one body\n\npara two body", "url": "u"},
        {"content": "content field record", "text_ignored": "x"},
        {"body": "body field record", "meta": {"k": "chrome"}},
        {"id": 9},
        {"text": "  "},
    ]
    blob = _shard(recs) + b'\n{"text": "cut-off li'
    blocks = tokenize_ndjson(blob)
    got = [(b.kind, b.text) for b in blocks]
    assert got == [
        ("title", "T One"),
        ("text", "para one body"),
        ("text", "para two body"),
        ("text", "content field record"),
        ("text", "body field record"),
    ]
    # json escapes decode through the real parser
    esc = tokenize_ndjson(b'{"text": "quote \\" and newline\\nhere"}')
    assert esc[0].text == 'quote " and newline here'


def test_first_text_key_wins():
    # a record with both text and content emits only the text field
    blocks = tokenize_ndjson(_shard([{"text": "primary", "content": "secondary"}]))
    assert [b.text for b in blocks] == ["primary"]


def test_dispatch_precedence_and_extract():
    # a notebook with a stray text field still routes to ipynb
    nb = json.dumps(
        {"cells": [], "nbformat": 4, "nbformat_minor": 5, "text": "x"}
    ).encode()
    nb_blocks = dispatch_blocks(nb)
    assert all(b.tag_path[0] != "ndjson" for b in nb_blocks)
    # end-to-end: chrome keys never surface
    recs = [
        {
            "title": "Walkthrough nine",
            "text": "long prose paragraph with plenty of words to clear every keep threshold",
            "url": "https://secret-chrome.example/x",
        }
    ]
    r = extract(_shard(recs))
    assert "Walkthrough nine" in r.text
    assert "secret-chrome" not in r.text
