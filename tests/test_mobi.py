"""MOBI/PalmDOC leg (extractor/mobileg.py): decompressor known-answer
pins from HAND-BUILT compressed literals (independent of the fixture
compressor, so a token-layout bug shared by the pair cannot fake a
roundtrip), container-walk edges, EXTH exclusion, charset surfacing,
and the quiet-skip fuzz contract."""

from __future__ import annotations

from toyocr_spark.extractor.core import dispatch_blocks, extract
from toyocr_spark.extractor.mobileg import (
    is_mobi,
    mobi_html,
    palmdoc_decompress,
    tokenize_mobi,
)
from toyocr_spark.fixtures.genmobi import build_mobi, palmdoc_compress


def test_palmdoc_decompress_known_answers():
    # literal bytes pass through
    assert palmdoc_decompress(b"plain text") == b"plain text"
    # 0xC0-0xFF = space + (byte ^ 0x80): 0xE1 -> ' a'
    assert palmdoc_decompress(b"x\xe1") == b"x a"
    # 0x01-0x08 = copy next n bytes verbatim (carries non-ASCII)
    assert palmdoc_decompress(b"\x02\xc3\xa9") == b"\xc3\xa9"
    # back-reference: 'abc' then dist=3 len=3 -> 'abcabc'
    # pair = 0x8000 | (3 << 3) | 0 = 0x8018
    assert palmdoc_decompress(b"abc\x80\x18") == b"abcabc"
    # overlapping copy (dist 1, len 5): 'a' -> 'aaaaaa'
    # pair = 0x8000 | (1 << 3) | 2 = 0x800a
    assert palmdoc_decompress(b"a\x80\x0a") == b"aaaaaa"
    # malformed back-reference (dist beyond start) stops cleanly
    assert palmdoc_decompress(b"a\x80\xff") == b"a"
    # truncated two-byte token at end stops cleanly
    assert palmdoc_decompress(b"ab\x81") == b"ab"


def test_compress_roundtrip_and_all_token_classes():
    text = (b"the cat sat on the mat, the cat sat on the mat "
            b"Again And Again \xc3\xa9\xc3\xbc done")
    c = palmdoc_compress(text)
    assert palmdoc_decompress(c) == text
    assert len(c) < len(text)  # back-references actually fired
    # space+char packs present (bytes >= 0xC0)
    assert any(b >= 0xC0 for b in c)
    # literal-run tokens present (for the UTF-8 bytes)
    assert any(1 <= b <= 8 for b in c)


def test_container_walk_and_exth_exclusion():
    html = (
        b"<html><body><h1>Walk Title Heading</h1><p>prose with plenty of "
        b"words to clear every keep threshold in the scorer rules.</p>"
        b"</body></html>"
    )
    for comp in (1, 2):
        blob = build_mobi(html, compression=comp, author_exth="SECRET-AUTHOR")
        assert is_mobi(blob)
        assert mobi_html(blob) == html
        r = extract(blob)
        assert "Walk Title Heading" in r.text
        assert "SECRET-AUTHOR" not in r.text
    # multi-record text (over 4096 bytes) reassembles exactly
    big = b"<html><body><p>" + b"word " * 2000 + b"</p></body></html>"
    assert mobi_html(build_mobi(big, compression=2)) == big


def test_cp1252_declared_encoding_surfaces_via_meta():
    html = "<html><body><p>café prose with plenty of words to keep the scorer content.</p></body></html>".encode("cp1252")
    blob = build_mobi(html, compression=1, encoding=1252)
    r = extract(blob)
    assert "café" in r.text


def test_quiet_skip_and_dispatch():
    assert not is_mobi(b"short")
    assert not is_mobi(b"<html>BOOKMOBI</html>")
    assert tokenize_mobi(b"x" * 60 + b"BOOKMOBI" + b"\x00" * 40) == []
    blob = build_mobi(b"<html><body><p>dispatch prose body here with words.</p></body></html>")
    # truncations anywhere: [] blocks, never an exception
    for cut in (70, 100, len(blob) // 2):
        assert isinstance(tokenize_mobi(blob[:cut]), list)
    blocks = dispatch_blocks(blob)
    assert blocks and "dispatch prose" in " ".join(b.text for b in blocks)
