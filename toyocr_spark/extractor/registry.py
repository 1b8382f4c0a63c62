"""Pluggable extractor strategies — the registry extension point.

The graft of the reference's META_ARCH/BACKBONE registries
(/root/reference/modeling/detectors/centernet.py:22,
/root/reference/modeling/backbone/build.py:4-23): kernels are selected
by config *name*, so a job spec can switch strategy without code
changes, and new strategies register themselves at import time.

Every strategy is a pure function blocks -> kept-blocks (document
order), sharing the tokenizer and span assembly; the frozen default
("density") is exactly core.extract's selector and remains the
byte-identity oracle. Alternates are deterministic but NOT oracle-tied
(the reference likewise ships CenterNet/ToyDet/MaskRCNN side by side
with different outputs).
"""

from __future__ import annotations

from collections.abc import Callable

from toyocr_spark.extractor.select import select_blocks
from toyocr_spark.extractor.tokenizer import Block

Selector = Callable[[list[Block]], list[Block]]

EXTRACTOR_REGISTRY: dict[str, Selector] = {}


def register_extractor(name: str) -> Callable[[Selector], Selector]:
    def deco(fn: Selector) -> Selector:
        if name in EXTRACTOR_REGISTRY:
            raise ValueError(f"duplicate extractor strategy: {name}")
        EXTRACTOR_REGISTRY[name] = fn
        return fn

    return deco


def get_extractor(name: str) -> Selector:
    try:
        return EXTRACTOR_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown extractor strategy {name!r}; registered: "
            f"{sorted(EXTRACTOR_REGISTRY)}"
        ) from None


# the frozen default — identical object to the oracle's selector
EXTRACTOR_REGISTRY["density"] = select_blocks


@register_extractor("all-text")
def _all_text(blocks: list[Block]) -> list[Block]:
    """Recall-max variant: every non-boilerplate block with any text
    (the 'low threshold' end of F5's spectrum, evaluation/text_eval.py:78
    score>0.1 vs demo.py:61 score>=0.35)."""
    return [b for b in blocks if b.n_chars > 0 and not b.in_boiler]


@register_extractor("title-only")
def _title_only(blocks: list[Block]) -> list[Block]:
    """Precision-max variant: headings only — the 'single class of
    interest' shape of the text-detection config (CLASS_NAMES=('text',),
    coco_text.py:9), here the title class."""
    return [b for b in blocks if b.kind == "title" and not b.in_boiler]
