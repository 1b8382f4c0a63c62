"""The frozen extraction kernel: pure, deterministic, no Spark imports.

This package is the graft of ToyOCR's per-record model pipeline
(preprocess -> backbone/head score fields -> decode, see SURVEY.md
S2.3-2.6) into web-text land:

    tokenizer.py  HTML bytes -> Block list   (the DatasetMapper analogue,
                  /root/reference/data/dataset_mapper.py:140-303)
    scoring.py    per-block text/link-density scores (the head analogue,
                  /root/reference/modeling/heads/toydet_head.py:85-88)
    select.py     threshold + gap-and-island merge  (the decoder analogue,
                  /root/reference/modeling/decoders/toydet_decode.py:113-179)
    layout.py     XY-cut reading order for box-positioned pages
                  (/root/reference/data/transforms/transform_cropresize.py:17-193)
    core.py       extract(html) -> (text, spans) — THE frozen oracle
    registry.py   named strategy registry (META_ARCH_REGISTRY graft);
                  extract_with(html, strategy) dispatches by name

Everything here must stay byte-deterministic: no RNG, no dict-order
dependence, integer-math thresholds only (SURVEY.md S7 hazards).
"""

from toyocr_spark.extractor.core import ExtractResult, extract, extract_with
from toyocr_spark.extractor.registry import EXTRACTOR_REGISTRY

__all__ = ["ExtractResult", "extract", "extract_with", "EXTRACTOR_REGISTRY"]
