"""Selection = threshold + gap-and-island grouping.

The graft of the reference's fused decode (threshold -> contour grouping
-> per-region score -> drop small/low regions,
/root/reference/modeling/decoders/toydet_decode.py:113-179): connected
components of kept block ordinals, absorbing small gaps (the ``unclip``
dilation, toydet_decode.py:181-187), then island-level filtering by the
mean-score rule (``box_score_fast``, toydet_decode.py:219-231).
"""

from __future__ import annotations

from toyocr_spark.extractor.scoring import absorbable, keep_block
from toyocr_spark.extractor.tokenizer import Block

GAP_TOLERANCE = 1  # max consecutive rejected-but-absorbable blocks inside an island
MIN_ISLAND_CHARS = 40  # islands below this are dropped (min-size filter,
#                        /root/reference/modeling/decoders/toydet_decode.py:146-149)


def select_blocks(blocks: list[Block]) -> list[Block]:
    """Return the main-content blocks, in input order.

    Deterministic single pass: mark kept blocks, grow islands over gaps
    of <= GAP_TOLERANCE absorbable rejects, drop islands whose total
    char mass is < MIN_ISLAND_CHARS (unless it is the only island —
    a page whose entire content is one short block still extracts it,
    mirroring the reference keeping top-1 even under threshold pressure).
    """
    if not blocks:
        return []
    kept = [keep_block(b) for b in blocks]

    # gap-and-island over ordinals (the Spark-side equivalent is the
    # ordinal - row_number() trick; here it is a linear scan)
    islands: list[list[Block]] = []
    cur: list[Block] = []
    pending: list[Block] = []  # absorbable rejects waiting for a kept block
    for b, k in zip(blocks, kept):
        if k:
            if cur and len(pending) <= GAP_TOLERANCE:
                cur.extend(pending)
            elif cur:
                islands.append(cur)
                cur = []
            pending = []
            cur.append(b)
        else:
            if absorbable(b):
                pending.append(b)
            else:
                # hard boundary: flush the island
                if cur:
                    islands.append(cur)
                    cur = []
                pending = []
    if cur:
        islands.append(cur)

    if not islands:
        return []

    sized = [(sum(b.n_chars for b in isl), isl) for isl in islands]
    selected = [isl for chars, isl in sized if chars >= MIN_ISLAND_CHARS]
    if not selected:
        # keep the largest island as a floor; ties -> earliest (stable)
        best = max(sized, key=lambda t: (t[0], -t[1][0].ordinal))
        selected = [best[1]]

    out = [b for isl in selected for b in isl]
    out.sort(key=lambda b: b.ordinal)
    return out
