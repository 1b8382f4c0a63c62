"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched UDFs.

The real codec libraries (PIL/opencv/ffmpeg) are not in this container,
so the *codec* step is stubbed two ways (clearly marked):
  * real formats (PNG/JPEG/...) -> NotImplementedError with the exact
    UDF signature documented, so dropping a real decoder in is a
    one-function change;
  * a deterministic synthetic container format ("FMED") generated
    JVM-side from the documents table, so the Spark-side plumbing —
    binary schema, batch shape, header parsing, struct output,
    partitioning — is real and oracle-checked end-to-end.

FMED layout (big-endian):
    magic  4 bytes  b"FMED"
    kind   1 byte   0=image 1=audio 2=video
    width  4 bytes  uint32   (image/video; sample-rate for audio)
    height 4 bytes  uint32   (0 for audio)
    chans  1 byte   uint8
    body   N bytes  raw payload

This is the graft of the reference's image-file read + format
normalization (/root/reference/data/dataset_mapper.py:151-155,
/root/reference/utils/img_utils.py:9-31): byte -> array decode at the
start of the per-record map, here over Arrow record batches.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"FMED"
_KINDS = {0: "image", 1: "audio", 2: "video"}

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("body_len", T.LongType(), False),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("frame_len", T.LongType(), False),
        T.StructField("last_frame_len", T.LongType(), False),
    ]
)


# ------------------------------------------------------- synth (JVM-side)


def _be32(col: Column) -> Column:
    """uint32 big-endian bytes of an int column, built JVM-side."""
    return F.unhex(F.lpad(F.hex(col.cast("long")), 8, "0"))


def _be8(col: Column) -> Column:
    return F.unhex(F.lpad(F.hex(col.cast("long")), 2, "0"))


def synth_media(documents: DataFrame, kind_code: Column | None = None) -> DataFrame:
    """documents(doc_id, text) -> media(media_id, payload binary).

    Deterministic FMED payloads, entirely with built-in functions (no
    UDF): width = 64 + doc_id % 512, height = 32 + doc_id % 256,
    channels = 1 + doc_id % 4, kind = doc_id % 3, body = utf-8 text."""
    d = documents
    kind = kind_code if kind_code is not None else F.pmod(F.col("doc_id"), F.lit(3))
    payload = F.concat(
        F.lit(MAGIC),
        _be8(kind),
        _be32(F.lit(64) + F.pmod(F.col("doc_id"), F.lit(512))),
        _be32(F.lit(32) + F.pmod(F.col("doc_id"), F.lit(256))),
        _be8(F.lit(1) + F.pmod(F.col("doc_id"), F.lit(4))),
        F.encode(F.col("text"), "UTF-8"),
    )
    return d.select(F.col("doc_id").alias("media_id"), payload.alias("payload"))


# -------------------------------------------------------- decode (Python)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type -> sample channels (spec §11.2.2); palette images carry
# 1 index channel per pixel in the raw scanline stream
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_png(payload: bytes) -> tuple[str, int, int, int, bytes]:
    """Real-codec leg of the decode seam: pure-stdlib PNG parse
    (struct + zlib, no PIL). IHDR gives dimensions/channels; the body
    is the zlib-inflated concatenation of IDAT chunks — the filtered
    scanline stream, i.e. genuinely decoded bytes, deterministic for a
    given file. CRCs are not validated (decode, don't verify)."""
    if len(payload) < 33 or payload[12:16] != b"IHDR":
        raise ValueError("PNG without leading IHDR chunk")
    width, height = struct.unpack(">II", payload[16:24])
    color_type = payload[25]
    chans = _PNG_CHANNELS.get(color_type)
    if chans is None:
        raise ValueError(f"PNG with invalid color type {color_type}")
    pos, idat = 8, []
    n = len(payload)
    while pos + 8 <= n:
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        if typ == b"IDAT":
            idat.append(payload[pos + 8 : pos + 8 + ln])
        if typ == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    body = zlib.decompress(b"".join(idat))
    return "image", width, height, chans, body


def parse_header(payload: bytes) -> tuple[str, int, int, int, bytes]:
    """Magic-dispatched decode: FMED (synthetic container) and PNG
    (pure-stdlib real codec) are live; JPEG/WAV/MP4 raise
    NotImplementedError — the documented seam where PIL/ffmpeg would
    slot in."""
    if payload[:8] == _PNG_MAGIC:
        return _parse_png(payload)
    if payload[:4] != MAGIC:
        # remaining real formats (JPEG/WAV/MP4) land here
        raise NotImplementedError(
            "codec decode for JPEG/WAV/MP4 requires PIL/ffmpeg, not "
            "present in this environment; implement decode(payload) "
            "-> (kind, width, height, channels, body) and the rest of "
            "the pipeline is unchanged (PNG and FMED are live above)"
        )
    kind_code, width, height, chans = struct.unpack(">BIIB", payload[4:14])
    return _KINDS[kind_code], width, height, chans, payload[14:]


def decode_media(media: DataFrame) -> DataFrame:
    """(media_id, payload) -> DECODE_SCHEMA via mapInArrow: the
    byte->metadata decode stage, batch-vectorized, binary in/struct out."""
    import pyarrow as pa

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in it:
            ids = b.column(0)
            payloads = b.column(1).to_pylist()
            parsed = [parse_header(p) for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array([p[0] for p in parsed], pa.string()),
                    pa.array([p[1] for p in parsed], pa.int32()),
                    pa.array([p[2] for p in parsed], pa.int32()),
                    pa.array([p[3] for p in parsed], pa.int32()),
                    pa.array([len(p[4]) for p in parsed], pa.int64()),
                ],
                names=[f.name for f in DECODE_SCHEMA.fields],
            )

    return media.select("media_id", "payload").mapInArrow(batches, DECODE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video payloads: split the body into
    n equal frames (last frame takes the remainder). With a real codec
    this is the keyframe extraction step; the batch shape, schema and
    partitioning are identical."""
    import pyarrow as pa

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in it:
            ids = b.column(0)
            payloads = b.column(1).to_pylist()
            rows = []
            for p in payloads:
                _, _, _, _, body = parse_header(p)
                n = len(body)
                frame = n // n_frames
                frames = [body[i * frame : (i + 1) * frame] for i in range(n_frames - 1)]
                frames.append(body[(n_frames - 1) * frame :])
                rows.append((n_frames, len(frames[0]), len(frames[-1])))
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array([r[0] for r in rows], pa.int32()),
                    pa.array([r[1] for r in rows], pa.int64()),
                    pa.array([r[2] for r in rows], pa.int64()),
                ],
                names=[f.name for f in FRAMES_SCHEMA.fields],
            )

    return media.select("media_id", "payload").mapInArrow(batches, FRAMES_SCHEMA)


def media_fingerprint(media: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic feature-extract stub: a dim-float signature from
    byte statistics (stands in for an embedding model; same schema and
    batch shape as a real encoder would produce)."""
    import pyarrow as pa

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("sig", T.ArrayType(T.FloatType(), False), False),
        ]
    )

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in it:
            ids = b.column(0)
            sigs = []
            for p in b.column(1).to_pylist():
                _, _, _, _, body = parse_header(p)
                sig = [0.0] * dim
                for i, by in enumerate(body):
                    sig[i % dim] += by
                total = sum(sig) or 1.0
                sigs.append([round(s / total, 6) for s in sig])
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(sigs, pa.list_(pa.float32()))],
                names=["media_id", "sig"],
            )

    return media.select("media_id", "payload").mapInArrow(batches, schema)
