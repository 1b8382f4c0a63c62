"""Block scoring: the graft of the reference's detection/segmentation
heads (/root/reference/modeling/heads/toydet_head.py:85-88 — raw signal
-> per-unit score field) as Readability/Boilerpipe-style text-density and
link-density rules over the tag path.

All thresholds are integer cross-multiplications — never float ratios —
so equality can't straddle a rounding boundary across platforms
(SURVEY.md S7 "byte-identity under parallelism").
"""

from __future__ import annotations

from toyocr_spark.extractor.tokenizer import Block

# integer rule constants (the graft of cfg thresholds like
# /root/reference/modeling/decoders/toydet_decode.py:14 thresh/box_thresh)
MIN_CHARS = 10  # blocks shorter than this never stand alone
LONG_BLOCK = 150  # boilerplate-path blocks must exceed this to survive
SCORE_THRESHOLD = 100  # kept iff score(block) >= this


def block_score(b: Block) -> int:
    """Integer score: 10*chars - 25*link_chars - 5*inline_tags.

    The linear form mirrors the head's class-score map: text mass is
    positive evidence, anchor text and markup weight are negative
    (link-dense nav/sidebar blocks go negative fast).
    """
    return 10 * b.n_chars - 25 * b.link_chars - 5 * b.n_inline


def keep_block(b: Block) -> bool:
    """The binarize step (/root/reference/modeling/decoders/
    toydet_decode.py:57-58 ``pred > thresh``) as decision rules."""
    if b.n_chars == 0:
        return False
    # tag-path prior: nav/header/footer/aside/form content is boilerplate
    # unless it is a long low-link paragraph (rare but real)
    if b.in_boiler:
        return b.n_chars > LONG_BLOCK and 4 * b.link_chars < b.n_chars
    # link density > 1/2 -> navigation/sidebar
    if 2 * b.link_chars > b.n_chars:
        return False
    # short fragments with any link weight -> menu crumbs
    if b.n_chars < MIN_CHARS:
        return False
    return block_score(b) >= SCORE_THRESHOLD


def absorbable(b: Block) -> bool:
    """May a rejected block be absorbed into an island between two kept
    neighbours? (the ``unclip`` outward-offset analogue,
    /root/reference/modeling/decoders/toydet_decode.py:181-187).

    Yes iff it is not boilerplate-pathed and not link-dominated: short
    connective fragments (a one-line heading, an inline note) belong to
    the surrounding content region.
    """
    if b.in_boiler:
        return False
    return 3 * b.link_chars <= b.n_chars
