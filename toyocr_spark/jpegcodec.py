"""Pure-stdlib JPEG codec: a real Huffman+IDCT pixel decoder (and a
minimal encoder used by the fixtures/tests — no PIL/libjpeg in this
container).

Decoder scope (``decode_baseline``): baseline sequential DCT (SOF0/
SOF1) AND progressive DCT (SOF2 — spectral selection, successive
approximation, EOB-run coding, per spec Annex G) AND sequential
LOSSLESS (SOF3, Annex H — predictive with all 7 selectors, 2-16 bit
precision, byte-identical reconstruction), Huffman entropy coding,
8-bit DCT precision, grayscale / 3-component YCbCr / 4-component
Adobe CMYK+YCCK (APP14 transform flag) with arbitrary h/v sampling
factors (4:4:4, 4:2:2, 4:2:0, ...), restart intervals, 16-bit DQT
entries, 0xFF00 byte stuffing. Raises ``ValueError`` on
arithmetic-coded / hierarchical files — callers fall back to
header-only parsing for those.

Everything is deterministic: Huffman decode and dequantization are
exact integers; the IDCT uses IEEE-double cosine tables evaluated in a
fixed operation order; chroma upsampling is nearest-neighbour; the
YCbCr->RGB step is the libjpeg fixed-point integer formula. The same
payload decodes to the same raster bytes on any worker.

This closes the decode seam the round-2 review called out
(multimodal.parse_header previously returned the raw entropy-coded
scan for JPEG): ``kind/width/height/channels/body`` for a baseline
JPEG now come from genuinely decoded pixels, the same contract as the
PNG leg. Reference analogue: the image bytes -> array decode at the
start of the per-record map (/root/reference/data/dataset_mapper.py:
151-155).
"""

from __future__ import annotations

import math
import struct

# zig-zag index -> natural (row-major) index, spec Figure A.6
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

# separable DCT basis: _COS[u][x] = C(u)/2 * cos((2x+1) u pi / 16),
# evaluated once at import in a fixed order (deterministic doubles)
_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0) / 2.0 * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]

_SOF_BASELINE = {0xC0, 0xC1}
_SOF_PROGRESSIVE = {0xC2}
_SOF_LOSSLESS = {0xC3}  # sequential lossless (predictive, Huffman)
_SOF_UNSUPPORTED = {0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


_HUFF_FAST_BITS = 8  # LUT width: covers virtually every symbol of real tables


class _Huff:
    """Canonical Huffman table as a (length, code) -> symbol dict plus
    an 8-bit prefix LUT: ``fast[next8bits] = (symbol, codelen)`` for
    codes of <= 8 bits (None marks a longer-or-invalid prefix, resolved
    by the spec's sequential per-bit walk). Prefix-freeness makes the
    LUT exact: every 8-bit extension of a short code maps to it."""

    __slots__ = ("lookup", "maxlen", "fast")

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        maxlen = 0
        fb = _HUFF_FAST_BITS
        fast: list[tuple[int, int] | None] = [None] * (1 << fb)
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                sym = symbols[k]
                self.lookup[(length, code)] = sym
                if length <= fb:
                    lo = code << (fb - length)
                    entry = (sym, length)
                    for idx in range(lo, lo + (1 << (fb - length))):
                        fast[idx] = entry
                code += 1
                k += 1
                maxlen = length
            code <<= 1
        self.maxlen = maxlen
        self.fast = fast


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    stuffing; stops (returns None) at any real marker."""

    __slots__ = ("d", "i", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.i = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d, i = self.d, self.i
        if i >= len(d):
            return False
        b = d[i]
        if b == 0xFF:
            nxt = d[i + 1] if i + 1 < len(d) else 0xD9
            if nxt != 0x00:
                return False  # a real marker terminates the segment
            self.i = i + 2
        else:
            self.i = i + 1
        # mask consumed high bits so acc stays a machine int over long
        # scans (an unmasked acc grows by 8 bits per fill and turns
        # every shift into an O(scan-length) bignum copy)
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8
        return True

    def bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int | None:
        # bulk form of n sequential bit() calls: identical fill
        # schedule (one fill per 8 missing bits), identical value
        # (MSB-first), identical reader state on truncation (all
        # buffered bits consumed, position at the marker)
        nbits = self.nbits
        while nbits < n:
            if not self._fill():
                self.nbits = 0
                return None
            nbits = self.nbits
        nbits -= n
        self.nbits = nbits
        return (self.acc >> nbits) & ((1 << n) - 1)

    def align_to_marker(self) -> None:
        """Drop partial bits; self.i then points at the next marker."""
        self.acc = 0
        self.nbits = 0

    def decode(self, table: _Huff) -> int | None:
        # fast path: resolve codes of <= 8 bits with one LUT probe.
        # Never fills a byte the per-bit walk would not have filled:
        # with 0 < nbits < 8 buffered the probe pads with zeros and
        # only accepts an entry whose code fits the buffered bits
        # (prefix-freeness makes that unambiguous); otherwise it falls
        # through to the exact spec walk, which fills on demand.
        nbits = self.nbits
        if nbits >= 8:
            e = table.fast[(self.acc >> (nbits - 8)) & 0xFF]
            if e is not None:
                self.nbits = nbits - e[1]
                return e[0]
        elif nbits:
            e = table.fast[(self.acc & ((1 << nbits) - 1)) << (8 - nbits)]
            if e is not None and e[1] <= nbits:
                self.nbits = nbits - e[1]
                return e[0]
        else:
            if not self._fill():
                return None  # first bit unavailable, as in the walk
            e = table.fast[(self.acc >> (self.nbits - 8)) & 0xFF]
            if e is not None:
                self.nbits -= e[1]
                return e[0]
        code = 0
        lookup = table.lookup
        for length in range(1, table.maxlen + 1):
            b = self.bit()
            if b is None:
                return None
            code = (code << 1) | b
            sym = lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """Spec EXTEND: map s low bits to the signed coefficient value."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _idct_block(coef: list[int], out: bytearray, ow: int, ox: int, oy: int) -> None:
    """8x8 inverse DCT of dequantized coefficients (natural order) into
    ``out`` (a component plane of row stride ``ox``, ``oy``), with
    level shift and clamping.

    Loop order inverted vs the textbook form: nonzero coefficients
    drive unrolled accumulation, so zero coefficients (the common case
    after quantization) cost one truth test instead of eight
    multiplies. Per tmp/output element the float additions still
    happen in ascending u/v order — the summation chain, and therefore
    every rounded pixel, is bit-identical to the previous per-x inner
    loop."""
    cos = _COS
    tmp = [0.0] * 64
    for y in range(8):
        base = y * 8
        for u in range(8):
            c = coef[base + u]
            if c:
                cu = cos[u]
                tmp[base] += c * cu[0]
                tmp[base + 1] += c * cu[1]
                tmp[base + 2] += c * cu[2]
                tmp[base + 3] += c * cu[3]
                tmp[base + 4] += c * cu[4]
                tmp[base + 5] += c * cu[5]
                tmp[base + 6] += c * cu[6]
                tmp[base + 7] += c * cu[7]
    orow = (oy * ow) + ox
    for x in range(8):
        s0 = s1 = s2 = s3 = s4 = s5 = s6 = s7 = 0.0
        for v in range(8):
            cv = tmp[v * 8 + x]
            if cv:
                cw = cos[v]
                s0 += cv * cw[0]
                s1 += cv * cw[1]
                s2 += cv * cw[2]
                s3 += cv * cw[3]
                s4 += cv * cw[4]
                s5 += cv * cw[5]
                s6 += cv * cw[6]
                s7 += cv * cw[7]
        o = orow + x
        for s in (s0, s1, s2, s3, s4, s5, s6, s7):
            val = int(s + 128.5) if s >= -128.5 else 0  # round + level shift
            if val < 0:
                val = 0
            elif val > 255:
                val = 255
            out[o] = val
            o += ow


def decode_baseline(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline-sequential OR progressive JPEG to (width,
    height, channels, raster). raster = row-major, interleaved uint8
    (RGB for 3 components, gray for 1). Progressive (SOF2) files are
    decoded scan-by-scan into a coefficient store (spectral selection,
    successive approximation, EOB runs) and rendered once at EOI —
    identical quantized coefficients give a raster byte-identical to
    the sequential encoding of the same image. Raises ValueError for
    arithmetic/lossless/hierarchical, malformed, or truncated files —
    never struct.error/KeyError/IndexError (hostile bytes must reject
    cleanly, not kill a worker task)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    try:
        return _decode_markers(payload)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed JPEG: {type(e).__name__}") from e


def _decode_markers(payload: bytes) -> tuple[int, int, int, bytes]:
    n = len(payload)
    pos = 2
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    adobe_transform = None  # APP14 color-transform flag (CMYK vs YCCK)
    frame = None  # (w, h, comps) with comps = [(cid, hs, vs, tq)]
    progressive = False
    lossless = False
    precision = 8
    coefs = None  # progressive: per-component zigzag coefficient blocks
    scans_seen = 0
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in _SOF_UNSUPPORTED or marker in (0xC8, 0xCC):
            raise ValueError("non-baseline JPEG (arithmetic/hierarchical)")
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 15
                s += 1
                tab = [0] * 64
                if pq:  # 16-bit entries
                    for k in range(64):
                        tab[ZIGZAG[k]] = (seg[s] << 8) | seg[s + 1]
                        s += 2
                else:
                    for k in range(64):
                        tab[ZIGZAG[k]] = seg[s]
                        s += 1
                qt[tq] = tab
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 15
                counts = list(seg[s + 1 : s + 17])
                total = sum(counts)
                syms = seg[s + 17 : s + 17 + total]
                (huff_ac if tc else huff_dc)[th] = _Huff(counts, syms)
                s += 17 + total
        elif marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            adobe_transform = seg[11]  # 0=CMYK/raw, 2=YCCK for 4-comp
        elif (
            marker in _SOF_BASELINE
            or marker in _SOF_PROGRESSIVE
            or marker in _SOF_LOSSLESS
        ):
            lossless = marker in _SOF_LOSSLESS
            precision = seg[0]
            if lossless:
                if not (2 <= precision <= 16):
                    raise ValueError("lossless JPEG precision out of range")
            elif precision != 8:
                raise ValueError("JPEG precision != 8 unsupported")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if nc not in (1, 3, 4):
                raise ValueError(f"JPEG with {nc} components unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 15
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError("JPEG sampling factor out of range")
                comps.append((cid, hs, vs, tq))
            frame = (w, h, comps)
            progressive = marker in _SOF_PROGRESSIVE
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG scan before frame header")
            ns = seg[0]
            scan_comps = []  # (component index, dc table, ac table)
            cids = [c[0] for c in frame[2]]
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                if cs not in cids:
                    raise ValueError("JPEG scan names unknown component")
                scan_comps.append((cids.index(cs), tdta >> 4, tdta & 15))
            if lossless:
                ss = seg[1 + 2 * ns]  # predictor selection (1-7)
                al = seg[3 + 2 * ns] & 15  # point transform Pt
                if restart_interval:
                    raise ValueError("lossless JPEG with restarts unsupported")
                return _decode_lossless_scan(
                    payload, pos + 2 + seg_len, frame, precision,
                    huff_dc, scan_comps, ss, al,
                )
            if not progressive:
                scan_tabs = {
                    cids[ci]: (dt, at) for ci, dt, at in scan_comps
                }
                return _decode_scan(
                    payload, pos + 2 + seg_len, frame, qt, huff_dc,
                    huff_ac, scan_tabs, restart_interval, adobe_transform,
                )
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            if coefs is None:
                coefs = _alloc_coefs(frame)
            pos = _decode_prog_scan(
                payload, pos + 2 + seg_len, frame, huff_dc, huff_ac,
                scan_comps, (ss, se, a >> 4, a & 15), restart_interval,
                coefs,
            )
            scans_seen += 1
            continue
        pos += 2 + seg_len
    if progressive and scans_seen:
        return _finish_progressive(frame, qt, coefs, adobe_transform)
    raise ValueError("JPEG without SOS marker")


def _decode_scan(
    payload, pos, frame, qt, huff_dc, huff_ac, scan_tabs, ri, adobe_transform=None
):
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for cid, hs, vs, tq in comps:
        pw, ph = mcus_x * hs * 8, mcus_y * vs * 8
        planes.append(bytearray(pw * ph))
    reader = _BitReader(payload, pos)
    preds = [0] * len(comps)
    coef = [0] * 64
    mcu_count = 0
    rst_next = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and mcu_count and mcu_count % ri == 0:
                # byte-align and consume the RSTn marker, reset DC preds
                reader.align_to_marker()
                i = reader.i
                d = reader.d
                while i + 1 < len(d) and d[i] == 0xFF and d[i + 1] == 0xFF:
                    i += 1  # fill bytes before a marker are legal
                if i + 1 < len(d) and d[i] == 0xFF and d[i + 1] == 0xD0 + rst_next:
                    reader.i = i + 2
                    rst_next = (rst_next + 1) & 7
                    preds = [0] * len(comps)
                else:
                    raise ValueError("JPEG missing expected restart marker")
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                dc_t, ac_t = scan_tabs[cid]
                dtab, atab = huff_dc[dc_t], huff_ac[ac_t]
                qtab = qt[tq]
                pw = mcus_x * hs * 8
                for by in range(vs):
                    for bx in range(hs):
                        for k in range(64):
                            coef[k] = 0
                        t = reader.decode(dtab)
                        if t is None:
                            raise ValueError("JPEG entropy data truncated")
                        if t:
                            diff_bits = reader.bits(t)
                            if diff_bits is None:
                                raise ValueError("JPEG entropy data truncated")
                            preds[ci] += _extend(diff_bits, t)
                        coef[0] = preds[ci] * qtab[0]
                        k = 1
                        while k < 64:
                            rs = reader.decode(atab)
                            if rs is None:
                                raise ValueError("JPEG entropy data truncated")
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            vbits = reader.bits(s)
                            if vbits is None:
                                raise ValueError("JPEG entropy data truncated")
                            zz = ZIGZAG[k]
                            coef[zz] = _extend(vbits, s) * qtab[zz]
                            k += 1
                        _idct_block(
                            coef, planes[ci], pw,
                            (mx * hs + bx) * 8, (my * vs + by) * 8,
                        )
            mcu_count += 1
    return _assemble_raster(w, h, comps, planes, mcus_x, hmax, vmax, adobe_transform)


def _decode_lossless_scan(
    payload, data_pos, frame, precision, huff_dc, scan_comps, pred_sel, pt
):
    """Sequential lossless JPEG (SOF3, T.81 Annex H): per-sample
    prediction from causal neighbours (selector 1-7), differences
    Huffman-coded with DC-style SSSS categories (16 => diff = 32768,
    no extra bits), arithmetic modulo 2^16. Supported shape: all
    sampling factors 1 (the layout DNG/medical writers emit; lossless
    was never subsampled in practice) and a single interleaved scan.
    Output is scaled to the 8-bit raster contract (>> (P-8) for
    deeper-than-8-bit samples); components are emitted AS STORED —
    lossless JPEG mandates no colour transform."""
    w, h, comps = frame
    if not (1 <= pred_sel <= 7):
        raise ValueError("lossless JPEG predictor selector out of range")
    if any(hs != 1 or vs != 1 for _cid, hs, vs, _tq in comps):
        raise ValueError("subsampled lossless JPEG unsupported")
    if len(scan_comps) != len(comps):
        raise ValueError("partial lossless scans unsupported")
    nc = len(comps)
    tabs = []
    for ci, dt, _at in scan_comps:
        if dt not in huff_dc:
            raise ValueError("lossless JPEG scan references missing table")
        tabs.append((ci, huff_dc[dt]))
    # T.81 H.2: the entropy stream interleaves each sample group in SOS
    # component order, which need not equal frame order — decode in SOS
    # order and scatter each sample by its FRAME index (a sort here
    # mis-assigned channels for conformant files with reordered scans)
    reader = _BitReader(payload, data_pos)
    default = 1 << (precision - pt - 1)
    prev_row = [[0] * w for _ in range(nc)]
    cur_row = [[0] * w for _ in range(nc)]
    out = bytearray(w * h * nc)
    shift = precision - 8
    for y in range(h):
        for x in range(w):
            for ci, tab in tabs:
                s = reader.decode(tab)
                if s is None:
                    raise ValueError("lossless JPEG entropy data truncated")
                if s == 16:
                    diff = 32768
                elif s:
                    vbits = reader.bits(s)
                    if vbits is None:
                        raise ValueError("lossless JPEG entropy data truncated")
                    diff = _extend(vbits, s)
                else:
                    diff = 0
                if y == 0:
                    pred = cur_row[ci][x - 1] if x else default
                elif x == 0:
                    pred = prev_row[ci][0]
                else:
                    ra = cur_row[ci][x - 1]
                    rb = prev_row[ci][x]
                    rc = prev_row[ci][x - 1]
                    if pred_sel == 1:
                        pred = ra
                    elif pred_sel == 2:
                        pred = rb
                    elif pred_sel == 3:
                        pred = rc
                    elif pred_sel == 4:
                        pred = ra + rb - rc
                    elif pred_sel == 5:
                        pred = ra + ((rb - rc) >> 1)
                    elif pred_sel == 6:
                        pred = rb + ((ra - rc) >> 1)
                    else:
                        pred = (ra + rb) >> 1
                val = (pred + diff) & 0xFFFF
                cur_row[ci][x] = val
                sample = val << pt
                out[(y * w + x) * nc + ci] = (
                    (sample >> shift) if shift >= 0 else (sample << -shift)
                ) & 0xFF
        prev_row, cur_row = cur_row, prev_row
    return w, h, nc, bytes(out)


def _assemble_raster(w, h, comps, planes, mcus_x, hmax, vmax, transform=None):
    """Component planes -> interleaved raster: nearest-neighbour chroma
    upsample + libjpeg fixed-point YCbCr->RGB (shared by the baseline
    and progressive paths — identical coefficients give identical
    bytes either way)."""
    nc = len(comps)
    if nc == 1:
        pw = mcus_x * comps[0][1] * 8
        out = bytearray(w * h)
        plane = planes[0]
        for y in range(h):
            row = y * pw
            out[y * w : (y + 1) * w] = plane[row : row + w]
        return w, h, 1, bytes(out)
    if nc == 4:
        # Adobe 4-component: YCCK (transform 2) converts through the
        # same fixed-point YCbCr->RGB then inverts to CMY with K
        # passing through; transform 0/absent is raw CMYK planes.
        pws4 = [mcus_x * c[1] * 8 for c in comps]
        out4 = bytearray(w * h * 4)
        for y in range(h):
            rows = [
                (y * comps[ci][2] // vmax) * pws4[ci] for ci in range(4)
            ]
            o = y * w * 4
            for x in range(w):
                s = [
                    planes[ci][rows[ci] + (x * comps[ci][1] // hmax)]
                    for ci in range(4)
                ]
                if transform == 2:
                    Y, cb, cr, k = s[0], s[1] - 128, s[2] - 128, s[3]
                    r = Y + ((91881 * cr + 32768) >> 16)
                    g = Y - ((22554 * cb + 46802 * cr + 32768) >> 16)
                    b = Y + ((116130 * cb + 32768) >> 16)
                    r = 0 if r < 0 else 255 if r > 255 else r
                    g = 0 if g < 0 else 255 if g > 255 else g
                    b = 0 if b < 0 else 255 if b > 255 else b
                    s = [255 - r, 255 - g, 255 - b, k]
                out4[o : o + 4] = bytes(s)
                o += 4
        return w, h, 4, bytes(out4)
    out = bytearray(w * h * 3)
    pws = [mcus_x * c[1] * 8 for c in comps]
    yp, cbp, crp = planes
    ph_, pwY = None, pws[0]
    hsY, vsY = comps[0][1], comps[0][2]
    hsB, vsB = comps[1][1], comps[1][2]
    hsR, vsR = comps[2][1], comps[2][2]
    for y in range(h):
        yY = y * vsY // vmax
        yB = y * vsB // vmax
        yR = y * vsR // vmax
        rowY = yY * pws[0]
        rowB = yB * pws[1]
        rowR = yR * pws[2]
        o = y * w * 3
        for x in range(w):
            Y = yp[rowY + (x * hsY // hmax)]
            cb = cbp[rowB + (x * hsB // hmax)] - 128
            cr = crp[rowR + (x * hsR // hmax)] - 128
            # libjpeg fixed-point YCbCr -> RGB (exact integer math)
            r = Y + ((91881 * cr + 32768) >> 16)
            g = Y - ((22554 * cb + 46802 * cr + 32768) >> 16)
            b = Y + ((116130 * cb + 32768) >> 16)
            out[o] = 0 if r < 0 else 255 if r > 255 else r
            out[o + 1] = 0 if g < 0 else 255 if g > 255 else g
            out[o + 2] = 0 if b < 0 else 255 if b > 255 else b
            o += 3
    return w, h, 3, bytes(out)


# -------------------------------------------------- progressive decoding
# Scan-by-scan coefficient accumulation per spec Annex G: DC scans
# (interleaved or not) send diffs of coef>>Al then one refinement bit
# per pass; AC scans are single-component, send a spectral band
# [Ss..Se] at point transform Al with EOB-run coding, then refinement
# scans correct one bit per already-nonzero coefficient and place
# newly-significant +-1<<Al values. Blocks are stored in ZIGZAG
# (spectral) order; dequant + IDCT happen once at EOI.


def _grid_dims(frame):
    """Per-component block grids: full MCU-aligned (interleaved scans)
    and the tight ceil(samples/8) sub-grid (non-interleaved scans)."""
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    full = []
    tight = []
    for cid, hs, vs, tq in comps:
        full.append((mcus_x * hs, mcus_y * vs))
        tight.append((-(-(-(-w * hs // hmax)) // 8), -(-(-(-h * vs // vmax)) // 8)))
    return hmax, vmax, mcus_x, mcus_y, full, tight


def _alloc_coefs(frame):
    _, _, _, _, full, _ = _grid_dims(frame)
    return [[[0] * 64 for _ in range(bw * bh)] for bw, bh in full]


def _refine_nonzero(block, k, se, reader, p1, m1, r):
    """Advance from spectral index k emitting nothing: read one
    correction bit per already-nonzero coefficient, count down ``r``
    zero-history positions; stop at the (r+1)-th zero-history slot (or
    past ``se``). Returns the stop index."""
    while k <= se:
        c = block[k]
        if c != 0:
            b = reader.bit()
            if b is None:
                raise ValueError("JPEG entropy data truncated")
            if b and (c & p1) == 0:
                block[k] = c + (p1 if c >= 0 else m1)
        else:
            if r == 0:
                break
            r -= 1
        k += 1
    return k


def _decode_prog_scan(payload, pos, frame, huff_dc, huff_ac, scan_comps,
                      band, ri, coefs):
    """One progressive scan; mutates ``coefs`` and returns the payload
    offset of the next marker."""
    ss, se, ah, al = band
    w, h, comps = frame
    hmax, vmax, mcus_x, mcus_y, full, tight = _grid_dims(frame)
    reader = _BitReader(payload, pos)
    ns = len(scan_comps)
    if ns > 1 and ss != 0:
        raise ValueError("JPEG interleaved AC scan is not legal")
    if ss == 0 and se != 0:
        raise ValueError("JPEG scan mixes DC and AC bands")

    # unit = one MCU (interleaved) or one block (single-component scan)
    if ns > 1 or ss == 0 and ns == len(comps):
        units_x, units_y = mcus_x, mcus_y
    else:
        ci0 = scan_comps[0][0]
        units_x, units_y = tight[ci0]

    preds = [0] * len(comps)
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    rst_next = 0
    unit_count = 0
    atab = None
    if ss != 0:
        atab = huff_ac[scan_comps[0][2]]

    def dc_block(ci, dtab, block):
        nonlocal preds
        if ah == 0:
            t = reader.decode(dtab)
            if t is None:
                raise ValueError("JPEG entropy data truncated")
            if t:
                diff_bits = reader.bits(t)
                if diff_bits is None:
                    raise ValueError("JPEG entropy data truncated")
                preds[ci] += _extend(diff_bits, t)
            block[0] = preds[ci] << al
        else:
            b = reader.bit()
            if b is None:
                raise ValueError("JPEG entropy data truncated")
            if b:
                block[0] |= p1

    def ac_first(block):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = reader.decode(atab)
            if rs is None:
                raise ValueError("JPEG entropy data truncated")
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eb = reader.bits(r)
                    if eb is None:
                        raise ValueError("JPEG entropy data truncated")
                    eobrun += eb
                return
            k += r
            if k > se:
                raise ValueError("JPEG AC run past band end")
            vbits = reader.bits(s)
            if vbits is None:
                raise ValueError("JPEG entropy data truncated")
            block[k] = _extend(vbits, s) << al
            k += 1

    def ac_refine(block):
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = reader.decode(atab)
                if rs is None:
                    raise ValueError("JPEG entropy data truncated")
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eb = reader.bits(r)
                            if eb is None:
                                raise ValueError("JPEG entropy data truncated")
                            eobrun += eb
                        break
                    val = 0  # ZRL: skip 16 zero-history slots
                else:
                    if s != 1:
                        raise ValueError("JPEG refinement magnitude != 1")
                    b = reader.bit()
                    if b is None:
                        raise ValueError("JPEG entropy data truncated")
                    val = p1 if b else m1
                k = _refine_nonzero(block, k, se, reader, p1, m1, r)
                if s and k <= se:
                    block[k] = val
                k += 1
        if eobrun > 0:
            _refine_nonzero(block, k, se, reader, p1, m1, 64)
            eobrun -= 1

    def do_unit(ux, uy):
        if ss == 0:
            if ns > 1:
                for ci, dt, _at in scan_comps:
                    _cid, hs, vs, _tq = comps[ci]
                    bw = full[ci][0]
                    dtab = huff_dc[dt] if ah == 0 else None
                    for by in range(vs):
                        for bx in range(hs):
                            dc_block(
                                ci, dtab,
                                coefs[ci][(uy * vs + by) * bw + ux * hs + bx],
                            )
            else:
                ci, dt, _at = scan_comps[0]
                bw = full[ci][0]
                dc_block(ci, huff_dc[dt] if ah == 0 else None,
                         coefs[ci][uy * bw + ux])
        else:
            ci = scan_comps[0][0]
            bw = full[ci][0]
            block = coefs[ci][uy * bw + ux]
            if ah == 0:
                ac_first(block)
            else:
                ac_refine(block)

    for uy in range(units_y):
        for ux in range(units_x):
            if ri and unit_count and unit_count % ri == 0:
                reader.align_to_marker()
                i = reader.i
                d = reader.d
                while i + 1 < len(d) and d[i] == 0xFF and d[i + 1] == 0xFF:
                    i += 1
                if i + 1 < len(d) and d[i] == 0xFF and d[i + 1] == 0xD0 + rst_next:
                    reader.i = i + 2
                    rst_next = (rst_next + 1) & 7
                    preds = [0] * len(comps)
                    eobrun = 0
                else:
                    raise ValueError("JPEG missing expected restart marker")
            do_unit(ux, uy)
            unit_count += 1

    reader.align_to_marker()
    i = reader.i
    d = reader.d
    while i + 1 < len(d) and d[i] == 0xFF and d[i + 1] == 0xFF:
        i += 1  # fill bytes before the next marker
    return i


def _finish_progressive(frame, qt, coefs, transform=None):
    """Dequantize + IDCT the accumulated coefficient store and
    assemble the raster exactly as the sequential path does."""
    w, h, comps = frame
    hmax, vmax, mcus_x, mcus_y, full, _ = _grid_dims(frame)
    planes = []
    nat = [0] * 64
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        bw, bh = full[ci]
        pw = bw * 8
        plane = bytearray(pw * bh * 8)
        qtab = qt[tq]
        for by in range(bh):
            for bx in range(bw):
                block = coefs[ci][by * bw + bx]
                for k in range(64):
                    z = ZIGZAG[k]
                    nat[z] = block[k] * qtab[z]
                _idct_block(nat, plane, pw, bx * 8, by * 8)
        planes.append(plane)
    return _assemble_raster(w, h, comps, planes, mcus_x, hmax, vmax, transform)


# --------------------------------------------------------------- encoder
# Minimal baseline encoder for fixtures/tests ONLY (the decoder above is
# table-driven, so it exercises exactly the same paths on these files as
# on libjpeg output). Grayscale or 4:4:4 YCbCr, flat-length Huffman
# tables (every symbol at one code length — trivially canonical, and the
# all-ones code is never assigned), quality-scaled Annex-K-style quant.

_Q_BASE = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]


def _flat_table(symbols: list[int], length: int) -> tuple[list[int], bytes, dict[int, tuple[int, int]]]:
    """All ``symbols`` at code length ``length`` (canonical order).
    Valid iff 2**length > len(symbols) (keeps the all-ones code free)."""
    assert (1 << length) > len(symbols)
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    codes = {sym: (length, i) for i, sym in enumerate(symbols)}
    return counts, bytes(symbols), codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _fdct_quant(samples: list[int], qtab: list[int]) -> list[int]:
    """Forward DCT (level-shifted) + quantization, natural order."""
    cos = _COS
    shifted = [s - 128 for s in samples]
    tmp = [0.0] * 64
    for y in range(8):
        base = y * 8
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += shifted[base + x] * cos[u][x]
            tmp[base + u] = s
    out = [0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[y * 8 + u] * cos[v][y]
            q = qtab[v * 8 + u]
            val = s / q
            out[v * 8 + u] = int(val + 0.5) if val >= 0 else -int(-val + 0.5)
    return out


def _category(v: int) -> int:
    a = -v if v < 0 else v
    return a.bit_length()


def _quant_table(quality: int) -> list[int]:
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (q * scale + 50) // 100)) for q in _Q_BASE]


def _component_planes(
    pixels: bytes, width: int, height: int, ncomp: int,
    sampling: list[tuple[int, int]], hmax: int, vmax: int,
    cmyk_transform: int = 0,
) -> list[tuple[list[int], int, int]]:
    """RGB->YCbCr (libjpeg fixed-point) then per-component planes at
    component resolution (box-filter average over the hmax/hs x
    vmax/vs pixel group, edge-clamped). Returns (plane, cw, ch) per
    component. Shared by the sequential and progressive encoders —
    identical arithmetic, identical planes."""
    full: list[list[int]] = []
    if ncomp == 1:
        full.append(list(pixels))
    elif ncomp == 4:
        chans = [list(pixels[c::4]) for c in range(4)]
        if cmyk_transform == 2:  # CMYK -> YCCK via inverted RGB
            yv, cbv, crv = [], [], []
            for c, m, yy in zip(chans[0], chans[1], chans[2]):
                r, g, b = 255 - c, 255 - m, 255 - yy
                yv.append((19595 * r + 38470 * g + 7471 * b + 32768) >> 16)
                cbv.append(((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16) + 128)
                crv.append(((32768 * r - 27439 * g - 5329 * b + 32768) >> 16) + 128)
            full = [
                yv,
                [min(255, max(0, v)) for v in cbv],
                [min(255, max(0, v)) for v in crv],
                chans[3],
            ]
        else:
            full = chans
    else:
        yv, cbv, crv = [], [], []
        for i in range(0, len(pixels), 3):
            r, g, b = pixels[i], pixels[i + 1], pixels[i + 2]
            yv.append((19595 * r + 38470 * g + 7471 * b + 32768) >> 16)
            cbv.append(((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16) + 128)
            crv.append(((32768 * r - 27439 * g - 5329 * b + 32768) >> 16) + 128)
        full = [yv, [min(255, max(0, v)) for v in cbv], [min(255, max(0, v)) for v in crv]]

    planes: list[tuple[list[int], int, int]] = []
    for ci in range(ncomp):
        hs, vs = sampling[ci]
        if (hs, vs) == (hmax, vmax):
            planes.append((full[ci], width, height))
            continue
        fx, fy = hmax // hs, vmax // vs
        cw = -(-width // fx)
        ch = -(-height // fy)
        plane = [0] * (cw * ch)
        src = full[ci]
        for cy in range(ch):
            for cx in range(cw):
                acc = cnt = 0
                for dy in range(fy):
                    sy = min(cy * fy + dy, height - 1)
                    for dx in range(fx):
                        sx = min(cx * fx + dx, width - 1)
                        acc += src[sy * width + sx]
                        cnt += 1
                plane[cy * cw + cx] = (acc + cnt // 2) // cnt
        planes.append((plane, cw, ch))
    return planes


def encode_baseline(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    quality: int = 75,
    subsample: bool = False,
    restart_interval: int = 0,
    cmyk_transform: int = 0,
) -> bytes:
    """Encode an interleaved uint8 raster (gray, RGB, or CMYK) as a
    baseline JPEG. Fixture-grade: correct bitstream, flat Huffman
    tables. 4-channel input writes an APP14 Adobe marker;
    ``cmyk_transform=2`` stores YCCK (CMYK through inverted RGB ->
    YCbCr, K passthrough — the dominant Adobe layout), 0 stores raw
    CMYK planes.
    ``subsample`` emits 4:2:0 chroma (2x2-averaged half-res Cb/Cr —
    the dominant real-crawl layout); ``restart_interval`` emits DRI +
    RSTn markers every N MCUs. Both exist to exercise the decoder's
    subsampling and restart paths with no external codec."""
    if channels not in (1, 3, 4):
        raise ValueError("encode_baseline supports 1, 3, or 4 channels")
    qtab = _quant_table(quality)

    dc_counts, dc_syms, dc_codes = _flat_table(list(range(12)), 5)
    # AC symbols the encoder can emit: EOB, ZRL, and (run, cat) pairs
    # for cat 1..10 (8-bit samples never need cat > 10) — 162 symbols,
    # all at code length 8 (256 > 163 keeps the all-ones code free)
    ac_symbols = [0x00, 0xF0] + [
        (r << 4) | c for r in range(16) for c in range(1, 11)
    ]
    ac_counts, ac_syms, ac_codes = _flat_table(ac_symbols, 8)

    ncomp = channels
    sampling = [(2, 2), (1, 1), (1, 1)] if (subsample and ncomp == 3) else [(1, 1)] * ncomp
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)

    out = bytearray(b"\xff\xd8")
    if ncomp == 4:
        # APP14 Adobe: announce the 4-component color layout
        adobe = b"Adobe" + struct.pack(">HHHB", 100, 0, 0, cmyk_transform)
        out += b"\xff\xee" + struct.pack(">H", 2 + len(adobe)) + adobe
    # DQT (one table, 8-bit)
    zz_q = bytes(qtab[ZIGZAG[k]] for k in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    # SOF0
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for c in range(ncomp):
        hs, vs = sampling[c]
        sof += bytes([c + 1, (hs << 4) | vs, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC table 0 + AC table 0
    dht = b"\x00" + bytes(dc_counts) + dc_syms
    dht += b"\x10" + bytes(ac_counts) + ac_syms
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    planes = _component_planes(
        pixels, width, height, ncomp, sampling, hmax, vmax, cmyk_transform
    )

    bw = _BitWriter()
    preds = [0] * ncomp
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    block = [0] * 64
    mcu_count = 0
    rst_next = 0

    def encode_block(ci: int, px: int, py: int) -> None:
        plane, cw, ch = planes[ci]
        for yy in range(8):
            sy = min(py + yy, ch - 1)
            for xx in range(8):
                sx = min(px + xx, cw - 1)
                block[yy * 8 + xx] = plane[sy * cw + sx]
        coef = _fdct_quant(block, qtab)
        diff = coef[0] - preds[ci]
        preds[ci] = coef[0]
        cat = _category(diff)
        ln, code = dc_codes[cat]
        bw.put(code, ln)
        if cat:
            v = diff if diff >= 0 else diff + (1 << cat) - 1
            bw.put(v, cat)
        run = 0
        zz_coef = [coef[ZIGZAG[k]] for k in range(64)]
        last_nz = 0
        for k in range(63, 0, -1):
            if zz_coef[k]:
                last_nz = k
                break
        for k in range(1, last_nz + 1):
            v = zz_coef[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]
                bw.put(code, ln)
                run -= 16
            cat = _category(v)
            ln, code = ac_codes[(run << 4) | cat]
            bw.put(code, ln)
            vb = v if v >= 0 else v + (1 << cat) - 1
            bw.put(vb, cat)
            run = 0
        if last_nz < 63:
            ln, code = ac_codes[0x00]  # EOB
            bw.put(code, ln)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()  # byte-align (1-padded) before the marker
                bw.out += bytes([0xFF, 0xD0 + rst_next])
                rst_next = (rst_next + 1) & 7
                preds = [0] * ncomp
            for ci in range(ncomp):
                hs, vs = sampling[ci]
                for by in range(vs):
                    for bx in range(hs):
                        encode_block(ci, (mx * hs + bx) * 8, (my * vs + by) * 8)
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------------- progressive encoder
# Fixture-grade progressive (SOF2) encoder exercising every decoder
# path: an interleaved DC scan at Al=1 (optionally restart-marked),
# per-component AC first scans at Al=1 (optionally split into two
# spectral bands) with EOB-run coding, then a DC refinement scan and
# per-component AC refinement scans down to Al=0. The transported
# quantized coefficients are identical to encode_baseline's for the
# same (pixels, quality, subsample), so the decoded raster is
# byte-identical between the two encodings — the round-trip oracle.


def encode_progressive(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    quality: int = 75,
    subsample: bool = False,
    spectral_split: int = 0,
    restart_interval: int = 0,
) -> bytes:
    if channels not in (1, 3):
        raise ValueError("encode_progressive supports 1 or 3 channels")
    qtab = _quant_table(quality)
    ncomp = channels
    sampling = [(2, 2), (1, 1), (1, 1)] if (subsample and ncomp == 3) else [(1, 1)] * ncomp
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = _component_planes(pixels, width, height, ncomp, sampling, hmax, vmax)

    # full-grid coefficient blocks per component, ZIGZAG order
    coefs: list[list[list[int]]] = []
    block = [0] * 64
    for ci in range(ncomp):
        hs, vs = sampling[ci]
        plane, cw, ch = planes[ci]
        bw_full, bh_full = mcus_x * hs, mcus_y * vs
        comp_blocks = []
        for by in range(bh_full):
            for bx in range(bw_full):
                px, py = bx * 8, by * 8
                for yy in range(8):
                    sy = min(py + yy, ch - 1)
                    for xx in range(8):
                        sx = min(px + xx, cw - 1)
                        block[yy * 8 + xx] = plane[sy * cw + sx]
                nat = _fdct_quant(block, qtab)
                comp_blocks.append([nat[ZIGZAG[k]] for k in range(64)])
        coefs.append(comp_blocks)

    dc_counts, dc_syms, dc_codes = _flat_table(list(range(12)), 5)
    # all (run, size) symbols incl. EOBn (r<15, s=0) and ZRL — 176 at
    # one code length (256 > 177 keeps the all-ones code free)
    ac_symbols = [(r << 4) | s for r in range(16) for s in range(11)]
    ac_counts, ac_syms, ac_codes = _flat_table(ac_symbols, 8)

    out = bytearray(b"\xff\xd8")
    zz_q = bytes(qtab[ZIGZAG[k]] for k in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for c in range(ncomp):
        hs, vs = sampling[c]
        sof += bytes([c + 1, (hs << 4) | vs, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dht = b"\x00" + bytes(dc_counts) + dc_syms
    dht += b"\x10" + bytes(ac_counts) + ac_syms
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht

    def sos_header(comp_ids: list[int], is_dc: bool, ss: int, se: int,
                   ah: int, al: int) -> bytes:
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])  # DC table 0 / AC table 0
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    def put_sym(w: _BitWriter, codes, sym: int) -> None:
        ln, code = codes[sym]
        w.put(code, ln)

    # ---- scan 1: interleaved DC first pass, Al=1 (restarts optional)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += sos_header(list(range(1, ncomp + 1)), True, 0, 0, 0, 1)
    w = _BitWriter()
    preds = [0] * ncomp
    rst_next = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + rst_next])
                rst_next = (rst_next + 1) & 7
                preds = [0] * ncomp
            for ci in range(ncomp):
                hs, vs = sampling[ci]
                bw_full = mcus_x * hs
                for by in range(vs):
                    for bx in range(hs):
                        c0 = coefs[ci][(my * vs + by) * bw_full + mx * hs + bx][0]
                        v = c0 >> 1
                        diff = v - preds[ci]
                        preds[ci] = v
                        cat = _category(diff)
                        put_sym(w, dc_codes, cat)
                        if cat:
                            w.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
            mcu_count += 1
    w.flush()
    out += w.out
    if restart_interval:
        # disable restarts for the remaining scans (DRI = 0)
        out += b"\xff\xdd" + struct.pack(">HH", 4, 0)

    # tight (non-interleaved) block grids per component
    tight = []
    for ci in range(ncomp):
        hs, vs = sampling[ci]
        cs_x = -(-width * hs // hmax)
        cs_y = -(-height * vs // vmax)
        tight.append((-(-cs_x // 8), -(-cs_y // 8)))

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        w = _BitWriter()
        eobrun = 0
        bw_full = mcus_x * sampling[ci][0]
        bwn, bhn = tight[ci]

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                put_sym(w, ac_codes, r << 4)
                if r:
                    w.put(eobrun - (1 << r), r)
                eobrun = 0

        for by in range(bhn):
            for bx in range(bwn):
                blk = coefs[ci][by * bw_full + bx]
                temps = [0] * 64
                last = 0
                for k in range(ss, se + 1):
                    c = blk[k]
                    a = -c if c < 0 else c
                    t = a >> al
                    if t:
                        temps[k] = t if c >= 0 else -t
                        last = k
                if last == 0:
                    eobrun += 1
                    if eobrun == 32767:
                        flush_eob()
                    continue
                flush_eob()
                r = 0
                for k in range(ss, last + 1):
                    t = temps[k]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15:
                        put_sym(w, ac_codes, 0xF0)
                        r -= 16
                    cat = _category(t)
                    put_sym(w, ac_codes, (r << 4) | cat)
                    w.put(t if t >= 0 else t + (1 << cat) - 1, cat)
                    r = 0
                if last < se:
                    eobrun += 1
                    if eobrun == 32767:
                        flush_eob()
        flush_eob()
        w.flush()
        return bytes(w.out)

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        w = _BitWriter()
        eobrun = 0
        pend: list[int] = []  # correction bits deferred to the EOB-run flush
        bw_full = mcus_x * sampling[ci][0]
        bwn, bhn = tight[ci]

        def flush_eob():
            nonlocal eobrun, pend
            if eobrun:
                r = eobrun.bit_length() - 1
                put_sym(w, ac_codes, r << 4)
                if r:
                    w.put(eobrun - (1 << r), r)
                for b in pend:
                    w.put(b, 1)
                eobrun = 0
                pend = []

        for by in range(bhn):
            for bx in range(bwn):
                blk = coefs[ci][by * bw_full + bx]
                # point-transformed magnitudes; EOB = last newly-
                # significant index (t == 1; already-significant have
                # t > 1 since abs >= 2<<Al)
                temps = [0] * 64
                eob = 0
                for k in range(ss, se + 1):
                    c = blk[k]
                    a = -c if c < 0 else c
                    t = a >> al
                    temps[k] = t
                    if t == 1:
                        eob = k
                r = 0
                br: list[int] = []  # correction bits in the current run
                for k in range(ss, se + 1):
                    t = temps[k]
                    if t == 0:
                        r += 1
                        continue
                    # ZRLs are emitted at EVERY nonzero position once the
                    # pending zero run exceeds 15 (but never past the last
                    # newly-significant coefficient — those runs fold into
                    # the EOB run), so each symbol's buffered correction
                    # bits lie inside that symbol's decode walk
                    while r > 15 and k <= eob:
                        flush_eob()
                        put_sym(w, ac_codes, 0xF0)
                        r -= 16
                        for b in br:
                            w.put(b, 1)
                        br = []
                    if t > 1:  # already significant: one correction bit
                        br.append(t & 1)
                        continue
                    # newly significant (+-1 at this level)
                    flush_eob()
                    put_sym(w, ac_codes, (r << 4) | 1)
                    w.put(1 if blk[k] >= 0 else 0, 1)
                    for b in br:
                        w.put(b, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    pend.extend(br)
                    if eobrun == 32767:
                        flush_eob()
        flush_eob()
        w.flush()
        return bytes(w.out)

    # ---- scans 2..: per-component AC first pass at Al=1
    for ci in range(ncomp):
        bands = [(1, 63)]
        if spectral_split and 1 <= spectral_split < 63:
            bands = [(1, spectral_split), (spectral_split + 1, 63)]
        for ss, se in bands:
            out += sos_header([ci + 1], False, ss, se, 0, 1)
            out += ac_first_scan(ci, ss, se, 1)

    # ---- DC refinement: one bit per block, interleaved MCU order
    out += sos_header(list(range(1, ncomp + 1)), True, 0, 0, 1, 0)
    w = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                hs, vs = sampling[ci]
                bw_full = mcus_x * hs
                for by in range(vs):
                    for bx in range(hs):
                        c0 = coefs[ci][(my * vs + by) * bw_full + mx * hs + bx][0]
                        w.put(c0 & 1, 1)
    w.flush()
    out += w.out

    # ---- per-component AC refinement down to Al=0
    for ci in range(ncomp):
        out += sos_header([ci + 1], False, 1, 63, 1, 0)
        out += ac_refine_scan(ci, 1, 63, 0)

    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------- metadata (COM segments)


def encode_lossless(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    predictor: int = 4,
    scan_order: tuple[int, ...] | None = None,
) -> bytes:
    """Encode an interleaved uint8 raster as a sequential LOSSLESS
    JPEG (SOF3, T.81 Annex H): per-sample prediction with the given
    selector (1-7), differences Huffman-coded with DC-style SSSS
    categories, components stored as-is (no colour transform — the
    lossless process defines none). Fixture-grade: flat Huffman table,
    8-bit precision, no subsampling, single interleaved scan. The
    decoder must reproduce the input raster BYTE-IDENTICALLY — that is
    the entire point of the process."""
    if channels not in (1, 3):
        raise ValueError("encode_lossless supports 1 or 3 channels")
    if not (1 <= predictor <= 7):
        raise ValueError("predictor selector out of range")
    # T.81 places no ordering constraint on the SOS component list;
    # scan_order permutes it (and the per-sample-group interleave to
    # match) to exercise decoders on conformant non-frame-order scans
    order = tuple(scan_order) if scan_order is not None else tuple(range(channels))
    if sorted(order) != list(range(channels)):
        raise ValueError("scan_order must be a permutation of the components")
    # 8-bit samples: diffs span [-255, 255] mod 2^16 -> categories 0-8,
    # but modulo wraparound can land anywhere in 0-16; emit the exact
    # mod-2^16 diff the decoder will add back, in its true category
    dc_counts, dc_syms, dc_codes = _flat_table(list(range(17)), 6)

    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for c in range(channels):
        sof += bytes([c + 1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    dht = b"\x00" + bytes(dc_counts) + dc_syms
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = bytes([channels])
    for c in order:
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, 0])  # Ss=selector, Se=0, AhAl=0
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    default = 1 << 7  # precision 8, Pt 0
    prev_row = [[0] * width for _ in range(channels)]
    cur_row = [[0] * width for _ in range(channels)]
    for y in range(height):
        for x in range(width):
            for ci in order:
                val = pixels[(y * width + x) * channels + ci]
                if y == 0:
                    pred = cur_row[ci][x - 1] if x else default
                elif x == 0:
                    pred = prev_row[ci][0]
                else:
                    ra = cur_row[ci][x - 1]
                    rb = prev_row[ci][x]
                    rc = prev_row[ci][x - 1]
                    pred = {
                        1: ra,
                        2: rb,
                        3: rc,
                        4: ra + rb - rc,
                        5: ra + ((rb - rc) >> 1),
                        6: rb + ((ra - rc) >> 1),
                        7: (ra + rb) >> 1,
                    }[predictor]
                cur_row[ci][x] = val
                diff = (val - pred) & 0xFFFF
                if diff >= 32768:  # negative branch of the mod-2^16 ring
                    diff -= 65536
                if diff == 32768 or diff == -32768:
                    s16 = 16
                else:
                    s16 = _category(diff)
                length, code = dc_codes[s16]
                bw.put(code, length)
                if 0 < s16 < 16:
                    bits = diff if diff > 0 else diff + (1 << s16) - 1
                    bw.put(bits & ((1 << s16) - 1), s16)
        prev_row, cur_row = cur_row, prev_row
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _iter_metadata_segments(payload: bytes):
    """Yield (marker, segment_bytes) for every sized segment before
    the first SOS — the shared pre-scan walk for the metadata
    harvesters (COM, APP1/EXIF). Tolerant: desync, EOI, short lengths
    simply end the walk. Raises ValueError only when the payload is
    not a JPEG at all."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos, n = 2, len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            break
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if seg_len < 2:
            break
        yield marker, payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDA:  # SOS: entropy data follows, stop walking
            break
        pos += 2 + seg_len


def jpeg_comments(payload: bytes) -> list[str]:
    """Latin-1 text of every COM (0xFFFE) segment before the first SOS
    — the JPEG metadata-mining leg (caption/copyright strings ride
    here). Non-fatal by design: a malformed tail simply ends the
    harvest."""
    return [
        seg.decode("latin-1")
        for marker, seg in _iter_metadata_segments(payload)
        if marker == 0xFE
    ]


def insert_comments(payload: bytes, comments: list[str]) -> bytes:
    """Fixture helper: splice COM segments directly after SOI (valid
    per spec — tables/misc segments may precede the frame header)."""
    if len(payload) < 2 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    com = b"".join(
        b"\xff\xfe" + struct.pack(">H", len(c.encode("latin-1")) + 2) + c.encode("latin-1")
        for c in comments
    )
    return payload[:2] + com + payload[2:]


# --------------------------------------------------- metadata (EXIF APP1)

# IFD0 tags worth harvesting at corpus scale (names per TIFF 6.0 / EXIF)
_EXIF_TAGS = {
    0x010F: "Make",
    0x0110: "Model",
    0x0112: "Orientation",
    0x0132: "DateTime",
    0x8298: "Copyright",
}


def exif_entries(payload: bytes) -> list[tuple[str, str]]:
    """(tag_name, value) pairs from the APP1/Exif IFD0 — both byte
    orders (II little / MM big), SHORT/LONG/ASCII types, inline and
    offset-stored values, bounds-checked throughout. Unknown tags and
    malformed structures are skipped, never fatal (same harvest
    discipline as pngcodec.text_chunks): orientation/camera/copyright
    mining must not reject an image the pixel decoder accepts."""
    app1 = None
    for marker, seg in _iter_metadata_segments(payload):
        if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            app1 = seg[6:]
            break
    if app1 is None or len(app1) < 8:
        return []
    order = app1[:2]
    if order == b"II":
        u16 = lambda b, o: struct.unpack_from("<H", b, o)[0]  # noqa: E731
        u32 = lambda b, o: struct.unpack_from("<I", b, o)[0]  # noqa: E731
    elif order == b"MM":
        u16 = lambda b, o: struct.unpack_from(">H", b, o)[0]  # noqa: E731
        u32 = lambda b, o: struct.unpack_from(">I", b, o)[0]  # noqa: E731
    else:
        return []
    try:
        if u16(app1, 2) != 42:
            return []
        ifd = u32(app1, 4)
        if ifd + 2 > len(app1):
            return []
        count = u16(app1, ifd)
        out = []
        for i in range(count):
            e = ifd + 2 + 12 * i
            if e + 12 > len(app1):
                break
            tag, typ = u16(app1, e), u16(app1, e + 2)
            cnt = u32(app1, e + 4)
            name = _EXIF_TAGS.get(tag)
            if name is None:
                continue
            if typ == 3 and cnt == 1:  # SHORT, inline (order-dependent)
                out.append((name, str(u16(app1, e + 8))))
            elif typ == 4 and cnt == 1:  # LONG, inline
                out.append((name, str(u32(app1, e + 8))))
            elif typ == 2:  # ASCII, NUL-terminated; offset when > 4 bytes
                if cnt <= 4:
                    raw = app1[e + 8 : e + 8 + cnt]
                else:
                    off = u32(app1, e + 8)
                    if off + cnt > len(app1):
                        continue
                    raw = app1[off : off + cnt]
                out.append((name, raw.rstrip(b"\x00").decode("latin-1")))
        return out
    except (struct.error, IndexError):
        return []


def build_exif_app1(entries: list[tuple[int, object]], big_endian: bool) -> bytes:
    """Fixture helper: a real APP1/Exif segment with one IFD0 holding
    ``entries`` = [(tag, int-or-str value), ...] in the given byte
    order — SHORTs inline, ASCII strings stored past the IFD exactly
    as cameras write them."""
    bo = ">" if big_endian else "<"
    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4  # after count + entries + next-IFD
    body = bytearray()
    body += b"MM" if big_endian else b"II"
    body += struct.pack(bo + "H", 42) + struct.pack(bo + "I", ifd_off)
    body += struct.pack(bo + "H", n)
    tail = bytearray()
    for tag, val in entries:
        if isinstance(val, int):
            body += struct.pack(bo + "HHI", tag, 3, 1)
            body += struct.pack(bo + "H", val) + b"\x00\x00"
        else:
            raw = val.encode("latin-1") + b"\x00"
            body += struct.pack(bo + "HHI", tag, 2, len(raw))
            if len(raw) <= 4:
                body += raw + b"\x00" * (4 - len(raw))
            else:
                body += struct.pack(bo + "I", data_off + len(tail))
                tail += raw
    body += struct.pack(bo + "I", 0)  # no next IFD
    body += tail
    seg = b"Exif\x00\x00" + bytes(body)
    return b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg


def insert_app1(payload: bytes, app1: bytes) -> bytes:
    """Splice a pre-built APP1 segment directly after SOI."""
    if len(payload) < 2 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return payload[:2] + app1 + payload[2:]
