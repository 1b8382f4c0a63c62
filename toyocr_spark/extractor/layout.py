"""XY-cut reading order for absolutely-positioned ("PDF-like") pages.

The graft of the reference's layout-analysis stage and its
region-aware crop logic: RandomCropTransform builds per-axis occupancy
arrays from polygons and cuts only through whitespace valleys
(/root/reference/data/transforms/transform_cropresize.py:143-193); here
the same 1-D occupancy projection recursively segments the page into
regions and yields reading order (top-to-bottom, then left-to-right).
"""

from __future__ import annotations

from toyocr_spark.extractor.tokenizer import Block

MIN_GAP = 8  # px of empty projection required to cut (valley width)


def _project_gaps(ivals: list[tuple[int, int]]) -> list[int]:
    """Merge 1-D intervals and return cut positions inside gaps >= MIN_GAP.

    The occupancy projection of transform_cropresize.py:143-160, on
    sorted intervals instead of a rasterized array (O(n log n), no
    canvas bound — survives arbitrary coordinate ranges).
    """
    if not ivals:
        return []
    ivals = sorted(ivals)
    cuts: list[int] = []
    hi = ivals[0][1]
    for s, e in ivals[1:]:
        if s - hi >= MIN_GAP:
            cuts.append((hi + s) // 2)
        hi = max(hi, e)
    return cuts


def _xycut(idx: list[int], boxes: list[tuple[int, int, int, int]], axis: int, depth: int) -> list[int]:
    if len(idx) <= 1 or depth > 12:
        return idx
    # axis 0: cut on y (horizontal valleys) ; axis 1: cut on x
    if axis == 0:
        ivals = [(boxes[i][1], boxes[i][1] + boxes[i][3]) for i in idx]
    else:
        ivals = [(boxes[i][0], boxes[i][0] + boxes[i][2]) for i in idx]
    cuts = _project_gaps(sorted(set(ivals)))
    if not cuts:
        if axis == 0:
            return _xycut(idx, boxes, 1, depth + 1)
        # no cut on either axis: stable reading order (y, then x, then ordinal)
        return sorted(idx, key=lambda i: (boxes[i][1], boxes[i][0], i))
    groups: list[list[int]] = [[] for _ in range(len(cuts) + 1)]
    for i in idx:
        lo = boxes[i][1] if axis == 0 else boxes[i][0]
        g = sum(1 for c in cuts if c <= lo)
        groups[g].append(i)
    out: list[int] = []
    for g in groups:
        if g:
            out.extend(_xycut(g, boxes, 1 - axis, depth + 1))
    return out


def reading_order(blocks: list[Block]) -> list[Block]:
    """Reorder blocks by XY-cut if the page looks box-positioned.

    A page is "layout mode" when >= 3 blocks carry absolute-position
    boxes (the analogue of routing to the layout-analysis arch by
    dataset metadata, /root/reference/data/dataset/builting.py:45-47).
    Unboxed blocks on a layout page keep their document order *after*
    all boxed blocks (footnote convention).
    """
    boxed = [b for b in blocks if b.box is not None]
    if len(boxed) < 3:
        return blocks
    boxes = [b.box for b in boxed]  # type: ignore[misc]
    order = _xycut(list(range(len(boxed))), boxes, 0, 0)
    rest = [b for b in blocks if b.box is None]
    return [boxed[i] for i in order] + rest
