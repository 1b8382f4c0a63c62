"""Deterministic CSV/TSV fixture builder — delimiter-separated tables
with proper stdlib-csv quoting, pinned line terminator, and the
bare-numeral chrome rows the shared scorer must drop. Independent
writer for extractor/csvleg.py (reference analogue: fixture generation
feeding the decode seam,
/root/reference/data/dataset_mapper.py:151-155)."""

from __future__ import annotations

import csv
import io


def build_csv(
    header: list[str], rows: list[list[str]], delim: str = "\t"
) -> bytes:
    buf = io.StringIO()
    w = csv.writer(buf, delimiter=delim, lineterminator="\n")
    w.writerow(header)
    for r in rows:
        w.writerow(r)
    return buf.getvalue().encode("utf-8")
