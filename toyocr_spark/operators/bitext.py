"""Bitext alignment operators — the step AFTER q114's page-level
candidate pairing in a parallel-corpus pipeline: align the two sides'
sentences by the Gale-Church (1993) length-based dynamic program.

Spark shape: each candidate pair is one row carrying both sides'
sentence-length arrays; the DP is inherently sequential per pair but
embarrassingly parallel ACROSS pairs, so it runs row-at-a-time inside
one mapInArrow batch kernel (the same sanctioning as the extraction
kernel and q37's greedy matcher — reference analogue: the per-image
assignment loops the survey replaces with per-key kernels). Nothing
shuffles: alignment is map-only over the pair table; the output beads
explode to scalar rows.

Gale & Church, "A Program for Aligning Sentences in Bilingual
Corpora", Computational Linguistics 19(1) — public-knowledge
algorithm; constants below are the published ones.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# published Gale-Church constants: mean characters in L2 per L1
# character, per-character variance, and -100*log(prior) penalties
# per bead shape
_C = 1.0
_S2 = 6.8
_PENALTY = {
    (1, 1): 0,
    (1, 0): 450,
    (0, 1): 450,
    (2, 1): 230,
    (1, 2): 230,
    (2, 2): 440,
}
_BIG = 1 << 30


def _match_cost(l1: int, l2: int) -> float:
    """-100 * log P(match | length delta), Gale-Church eq. section 3."""
    if l1 == 0 and l2 == 0:
        return 0.0
    mean = (l1 + l2 / _C) / 2.0
    delta = (l2 - l1 * _C) / math.sqrt(mean * _S2)
    # two-tailed prob of |delta| under N(0,1) via erfc
    p = max(math.erfc(abs(delta) / math.sqrt(2.0)), 1e-12)
    return -100.0 * math.log(p)


def align_lengths(a: list[int], b: list[int]) -> list[tuple[int, int, int, int, int]]:
    """Gale-Church DP over two sentence-length sequences ->
    [(a_start, a_len, b_start, b_len, cost_centi)] beads covering both
    sides in order (bead shapes: 1-1, 1-0, 0-1, 2-1, 1-2, 2-2).
    Pure function — the engine-portable reference the Spark kernel
    wraps and the tests cross-check."""
    n, m = len(a), len(b)
    # DP over (i, j) = sentences consumed on each side
    dist = [[_BIG] * (m + 1) for _ in range(n + 1)]
    back: list[list[tuple[int, int] | None]] = [[None] * (m + 1) for _ in range(n + 1)]
    dist[0][0] = 0.0
    for i in range(n + 1):
        for j in range(m + 1):
            d = dist[i][j]
            if d >= _BIG:
                continue
            for (da, db), pen in _PENALTY.items():
                ni, nj = i + da, j + db
                if ni > n or nj > m:
                    continue
                la = sum(a[i:ni])
                lb = sum(b[j:nj])
                nd = d + pen + _match_cost(la, lb)
                if nd < dist[ni][nj]:
                    dist[ni][nj] = nd
                    back[ni][nj] = (da, db)
    beads: list[tuple[int, int, int, int, int]] = []
    i, j = n, m
    while (i, j) != (0, 0):
        step = back[i][j]
        if step is None:  # unreachable inputs (e.g. one side empty+empty)
            break
        da, db = step
        i, j = i - da, j - db
        la = sum(a[i : i + da])
        lb = sum(b[j : j + db])
        cost = _PENALTY[(da, db)] + _match_cost(la, lb)
        beads.append((i, da, j, db, int(round(cost * 100))))
    beads.reverse()
    return beads


BEADS_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType(), False),
        T.StructField("id_b", T.LongType(), False),
        T.StructField("a_start", T.IntegerType(), False),
        T.StructField("a_len", T.IntegerType(), False),
        T.StructField("b_start", T.IntegerType(), False),
        T.StructField("b_len", T.IntegerType(), False),
        T.StructField("cost_centi", T.LongType(), False),
    ]
)


def gale_church_beads(pairs: DataFrame) -> DataFrame:
    """pairs(id_a, id_b, lens_a array<int>, lens_b array<int>) ->
    alignment beads, one scalar row per bead. Row-independent DP in a
    mapInArrow kernel: sequential within a pair (the algorithm's
    nature), parallel across pairs, zero shuffle."""
    import pyarrow as pa

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            ida = batch.column(0).to_pylist()
            idb = batch.column(1).to_pylist()
            la = batch.column(2).to_pylist()
            lb = batch.column(3).to_pylist()
            rows: list[tuple] = []
            for pid_a, pid_b, aa, bb in zip(ida, idb, la, lb):
                for s in align_lengths(list(aa or []), list(bb or [])):
                    rows.append((pid_a, pid_b, *s))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([r[0] for r in rows], pa.int64()),
                    pa.array([r[1] for r in rows], pa.int64()),
                    pa.array([r[2] for r in rows], pa.int32()),
                    pa.array([r[3] for r in rows], pa.int32()),
                    pa.array([r[4] for r in rows], pa.int32()),
                    pa.array([r[5] for r in rows], pa.int32()),
                    pa.array([r[6] for r in rows], pa.int64()),
                ],
                names=[f.name for f in BEADS_SCHEMA.fields],
            )

    return pairs.select("id_a", "id_b", "lens_a", "lens_b").mapInArrow(
        batches, BEADS_SCHEMA
    )
