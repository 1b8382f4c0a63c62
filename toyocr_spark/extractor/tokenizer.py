"""Deterministic HTML tokenizer: bytes -> list[Block].

Hand-rolled scanner state machine (no lxml/bs4 — version-stable by
construction, SURVEY.md S7 "What's hard"). Plays the role of the
reference's image decode + DatasetMapper per-record map
(/root/reference/data/dataset_mapper.py:140-303): raw bytes in, a
normalized per-record structure out, fully deterministic.

A Block is one run of text between block-level tag boundaries, with the
signals the scorer needs: char count, anchor-text char count, inline tag
count, the tag path at the block start, an optional absolute-position
box (for the XY-cut layout pass), and a coarse layout class
(``kind`` in {text,title,list,table,figure} — the reference's 5 layout
classes, /root/reference/data/dataset/layout_analysis.py:10).
"""

from __future__ import annotations

import html as _htmlmod
import re
from dataclasses import dataclass, field


# --- precompiled patterns (module-level: compiled once per executor) ---

# strip comments / script / style wholesale before tag walking
_STRIP_RE = re.compile(
    r"<!--.*?-->|<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>",
    re.S | re.I,
)
_TAG_NAME_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)")
_WS_RE = re.compile(r"\s+")
_TAG_TOKEN_RE = re.compile(r"<[^>]*>")
# absolute href target — the ONE definition shared by every
# absolute-only mining leg (tar members, markdown inline HTML, the
# kernel-gate fallback in linkmine); keeping a single compiled object
# means a scheme/quoting fix can never diverge the legs
ABS_HREF_RE = re.compile(r'(?i)href="(https?://[^"]+)"')


def utf8_textish(data: bytes, probe_bytes: int = 4096) -> bool:
    """True iff the head is strict-UTF-8 text with no NUL — the shared
    'may this blob be treated as text' gate (tar member dispatch,
    kernel-fallback href mining). Trims a trailing partial sequence
    before the strict decode."""
    probe = bytes(data[:probe_bytes])
    if b"\x00" in probe:
        return False
    for cut in range(4):
        try:
            probe[: len(probe) - cut].decode("utf-8")
            return True
        except UnicodeDecodeError:
            continue
    return False
_TAG_SPLIT_RE = re.compile(r"(<[^>]*>)")
# style="position:absolute;left:10px;top:20px;width:100px;height:30px"
_POS_RE = re.compile(
    r"position\s*:\s*absolute[^\"']*?left\s*:\s*(-?\d+)px\s*;\s*top\s*:\s*(-?\d+)px"
    r"(?:\s*;\s*width\s*:\s*(\d+)px)?(?:\s*;\s*height\s*:\s*(\d+)px)?",
    re.I,
)

# tags that end/begin a block of text
BLOCK_TAGS = frozenset(
    """html body main article section div p h1 h2 h3 h4 h5 h6 ul ol li dl dt dd
       table thead tbody tfoot tr td th blockquote pre figure figcaption
       header footer nav aside form fieldset title br hr option select
       textarea caption""".split()
)
# container tags that stay on the path stack (self-closing-ish tags don't)
_VOID_TAGS = frozenset("br hr img input meta link area base col embed source track wbr".split())
# inline tags counted as "markup weight" inside a block
_INLINE_TAGS = frozenset("a span b i em strong u small sup sub code abbr mark q s".split())

_HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6 title".split())
_LIST_TAGS = frozenset("li dt dd".split())
_TABLE_TAGS = frozenset("td th caption".split())
_FIGURE_TAGS = frozenset("figure figcaption".split())
# boilerplate containers (Boilerpipe-style tag-path prior)
BOILER_TAGS = frozenset("nav header footer aside form select option".split())


@dataclass(slots=True)
class Block:
    """One text block plus its scoring signals (the graft of the
    reference's per-instance row: box+class+score -> path+density)."""

    text: str = ""
    tag_path: tuple[str, ...] = ()
    n_chars: int = 0
    link_chars: int = 0
    n_inline: int = 0  # inline tag count inside the block
    kind: str = "text"
    box: tuple[int, int, int, int] | None = None  # (x, y, w, h) if positioned
    ordinal: int = 0  # position among non-empty blocks, set by tokenize
    _parts: list[str] = field(default_factory=list)

    @property
    def in_boiler(self) -> bool:
        p = self.tag_path
        v = _BOILER_CACHE.get(p)
        if v is None:
            v = any(t in BOILER_TAGS for t in p)
            if len(_BOILER_CACHE) < _PATH_CACHE_CAP:
                _BOILER_CACHE[p] = v
        return v


# tag paths repeat heavily within and across pages of a crawl; memoizing
# the pure path->label maps removes the per-block path walk from the hot
# loop. Capped so adversarial pages with unbounded distinct paths cannot
# grow worker memory (same spill-control stance as MAX_HTML_BYTES).
_PATH_CACHE_CAP = 1 << 14
_BOILER_CACHE: dict[tuple[str, ...], bool] = {}
_CLASSIFY_CACHE: dict[tuple[str, ...], str] = {}
# tag-token -> (name, closing, box|None, cat) | None-for-malformed; 0 is
# the miss sentinel (a valid entry is never 0). The box is parsed here,
# at token-cache-fill time, so the "position" pre-check can afford a
# case-fold: _POS_RE is re.I, and a case-sensitive fast-path guard would
# silently drop boxes on <DIV STYLE="POSITION:ABSOLUTE;..."> (legal
# HTML) — lost boxes change XY-cut reading order, a byte-identity break.
# ``cat`` pre-resolves the scanner's set-membership chain ONCE per
# distinct token instead of on every occurrence:
#   0 = ignored tag, 1 = block (stack-tracked), 2 = anchor,
#   3 = other inline, 4 = void block (br/hr — flush but never stack)
_TAG_CACHE: dict[
    str, tuple[str, bool, tuple[int, int, int, int] | None, int] | None
] = {}


def _parse_tag(
    tok: str,
) -> tuple[str, bool, tuple[int, int, int, int] | None, int] | None:
    nm = _TAG_NAME_RE.match(tok)
    if nm is None:
        return None  # malformed tag: drop (deterministic)
    name = nm.group(1)
    if not name.islower():
        name = name.lower()
    closing = tok[1] == "/"
    box = None
    if not closing and ("position" in tok or "position" in tok.lower()):
        pm = _POS_RE.search(tok)
        if pm is not None:
            x, y = int(pm.group(1)), int(pm.group(2))
            w = int(pm.group(3)) if pm.group(3) else 100
            h = int(pm.group(4)) if pm.group(4) else 20
            box = (x, y, w, h)
    if name in BLOCK_TAGS:
        cat = 4 if name in _VOID_TAGS else 1
    elif name == "a":
        cat = 2
    elif name in _INLINE_TAGS:
        cat = 3
    else:
        cat = 0
    return (name, closing, box, cat)


# <meta charset=...> / <meta http-equiv content="...charset=..."> and
# XML-prologue encoding sniffers, run over the first KiB of raw bytes
# (the WHATWG prescan region). ASCII-superset encodings only: a meta
# tag readable as ASCII cannot be declaring UTF-16/32.
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,256}?charset\s*=\s*[\"']?\s*([A-Za-z0-9][A-Za-z0-9._\-]{0,30})",
    re.I,
)
_XML_ENC_RE = re.compile(
    rb"^\s*<\?xml[^>]{0,128}?encoding\s*=\s*[\"']([A-Za-z0-9._\-]{1,31})[\"']", re.I
)
_SNIFF_BYTES = 1024


def _sniffed_codec(head: bytes) -> str | None:
    m = _META_CHARSET_RE.search(head) or _XML_ENC_RE.match(head)
    if m is None:
        return None
    import codecs

    try:
        name = codecs.lookup(m.group(1).decode("ascii")).name
    except (LookupError, UnicodeDecodeError):
        return None  # unknown label: fall through to utf-8
    if name == "utf-8" or name.startswith(("utf-16", "utf-32")):
        # utf-8 is the default anyway; a utf-16/32 label inside
        # ASCII-readable markup is self-contradictory (WHATWG says
        # treat it as utf-8)
        return None
    return name


def _decode(html: bytes | str) -> str:
    """Charset-sniffing byte decode, deterministic and lossy-safe — the
    format-trap normalization analogue of
    /root/reference/utils/img_utils.py:9-31 (EXIF/PNG surprises).

    Priority (WHATWG encoding-sniffing order): BOM > <meta charset> /
    XML prologue (first KiB, ASCII-superset encodings only) > lossy
    UTF-8. A real crawl is several percent non-UTF-8; without this every
    such page extracts mojibake."""
    if isinstance(html, str):
        return html
    if html[:3] == b"\xef\xbb\xbf":
        return html[3:].decode("utf-8", "replace")
    if html[:4] == b"\xff\xfe\x00\x00":
        return html[4:].decode("utf-32-le", "replace")
    if html[:4] == b"\x00\x00\xfe\xff":
        return html[4:].decode("utf-32-be", "replace")
    if html[:2] == b"\xff\xfe":
        return html[2:].decode("utf-16-le", "replace")
    if html[:2] == b"\xfe\xff":
        return html[2:].decode("utf-16-be", "replace")
    codec = _sniffed_codec(html[:_SNIFF_BYTES])
    if codec is not None:
        try:
            return html.decode(codec, "replace")
        except Exception:  # non-text codec smuggled through a label
            pass
    return html.decode("utf-8", "replace")


def _classify(tag_path: tuple[str, ...]) -> str:
    k = _CLASSIFY_CACHE.get(tag_path)
    if k is None:
        k = _classify_walk(tag_path)
        if len(_CLASSIFY_CACHE) < _PATH_CACHE_CAP:
            _CLASSIFY_CACHE[tag_path] = k
    return k


def _classify_walk(tag_path: tuple[str, ...]) -> str:
    # innermost classification wins: walk the path from the leaf
    for t in reversed(tag_path):
        if t in _HEADING_TAGS:
            return "title"
        if t in _LIST_TAGS:
            return "list"
        if t in _TABLE_TAGS:
            return "table"
        if t in _FIGURE_TAGS:
            return "figure"
    return "text"


def tokenize(html: bytes | str) -> list[Block]:
    """Parse HTML into a list of non-empty text blocks, in document order.

    Pure function of the bytes: stable across processes, partitions and
    batch boundaries (the byte-identity requirement of BASELINE.json).
    """
    src = _decode(html)
    if not src:
        return []
    src = _STRIP_RE.sub(" ", src)

    blocks: list[Block] = []
    stack: list[str] = []
    path: tuple[str, ...] = ()  # always == tuple(stack); cached to avoid
    #                             re-tupling on every flush (hot loop)
    link_depth = 0
    # open-block state lives in LOCALS (not attributes of a reusable
    # Block): local loads/stores are several times cheaper than slots
    # attribute access in this loop, and a Block object is allocated
    # only when a block is actually emitted — the flush/reset semantics
    # (incl. the path recorded at the last block-tag event and the
    # box/counter resets) are identical to the previous closure form,
    # gauntleted field-by-field over the corpus + fixtures + soup fuzz.
    parts: list[str] = []
    block_path: tuple[str, ...] = ()
    link_chars = 0
    n_inline = 0
    cur_box: tuple[int, int, int, int] | None = None

    # scanner over _TAG_SPLIT_RE (r"(<[^>]*>)").split: ONE C pass yields
    # [text, tag, text, ..., tag, text] directly — no match objects, no
    # per-token start/end/group calls, no Python-level find/slice pair.
    # A tag runs from '<' to the FIRST '>' (embedded '<' included —
    # [^>]* cannot cross one). Every text element except the final one
    # is '<'-free by construction (a '<' either starts a tag match or
    # has no '>' anywhere after it, which forces it into the LAST
    # element — handled by the '<'-split branch). Byte-equivalence with
    # the original char-walk is gauntleted over every fixture class + an
    # HTML-soup fuzz corpus.
    tag_cache_get = _TAG_CACHE.get  # hoisted: one lookup per tag token
    parts_append = parts.append  # parts is cleared in place, never rebound
    blocks_append = blocks.append
    unescape = _htmlmod.unescape
    segs = _TAG_SPLIT_RE.split(src)
    seg_iter = iter(segs)
    head = next(seg_iter)
    if head:
        # a '<' inside a text element means it has no '>' anywhere after
        # (possible only in the final element): the original char-walk
        # skipped each such '<' and appended the fragments between them
        # as SEPARATE pieces — replicate by splitting on '<'
        for frag in head.split("<") if "<" in head else (head,):
            if frag:
                piece = unescape(frag) if "&" in frag else frag
                parts_append(piece)
                if link_depth > 0:
                    # count anchor-text chars after whitespace collapse
                    # parity: collapse here too so link_chars <= n_chars
                    link_chars += len(" ".join(piece.split()))
    for tok, text in zip(seg_iter, seg_iter):
        # tag tokens repeat enormously in a crawl (</p>, <div>, ...);
        # memoize the parse (incl. the category chain): None = malformed
        hit = tag_cache_get(tok, 0)
        if hit == 0:
            hit = _parse_tag(tok)
            if len(_TAG_CACHE) < _PATH_CACHE_CAP:
                _TAG_CACHE[tok] = hit
        if hit is not None:
            name, closing, box, cat = hit
            if cat == 1 or cat == 4:  # block / void-block: close the run
                if parts:
                    # " ".join(s.split()) == _WS_RE.sub(" ", s).strip()
                    # for every codepoint (verified exhaustively); the
                    # split form is ~3x faster (pure C). Most blocks
                    # hold exactly one run — skip the concat for those.
                    t = " ".join(
                        (parts[0] if len(parts) == 1 else "".join(parts)).split()
                    )
                    if t:
                        blocks_append(
                            Block(
                                text=t,
                                tag_path=block_path,
                                n_chars=len(t),
                                link_chars=link_chars,
                                n_inline=n_inline,
                                kind=_classify(block_path),
                                box=cur_box,
                            )
                        )
                    parts.clear()
                    link_chars = 0
                    n_inline = 0
                elif link_chars or n_inline:
                    link_chars = 0
                    n_inline = 0
                cur_box = None
                if cat == 1:
                    if closing:
                        # pop to the matching open tag if present
                        # (tolerant of broken nesting — pathological
                        # fixture pages)
                        if name in stack:
                            while stack:
                                if stack.pop() == name:
                                    break
                            path = tuple(stack)
                    else:
                        stack.append(name)
                        path = tuple(stack)
                        if box is not None:
                            cur_box = box
                    block_path = path
            elif cat == 2:  # anchor
                if closing:
                    link_depth = max(0, link_depth - 1)
                else:
                    link_depth += 1
                    n_inline += 1
            elif cat == 3:  # other inline
                if not closing:
                    n_inline += 1
            # cat == 0: ignored entirely
        if text:
            if "<" in text:  # only possible in the final element
                for frag in text.split("<"):
                    if frag:
                        piece = unescape(frag) if "&" in frag else frag
                        parts_append(piece)
                        if link_depth > 0:
                            link_chars += len(" ".join(piece.split()))
            else:  # hot path
                piece = unescape(text) if "&" in text else text
                parts_append(piece)
                if link_depth > 0:
                    link_chars += len(" ".join(piece.split()))
    if parts:  # final flush
        t = " ".join((parts[0] if len(parts) == 1 else "".join(parts)).split())
        if t:
            blocks_append(
                Block(
                    text=t,
                    tag_path=block_path,
                    n_chars=len(t),
                    link_chars=link_chars,
                    n_inline=n_inline,
                    kind=_classify(block_path),
                    box=cur_box,
                )
            )

    for i, b in enumerate(blocks):
        b.ordinal = i
    return blocks
