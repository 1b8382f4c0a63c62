"""Pure-stdlib AES (FIPS-197) + CBC, built for decrypting AES-encrypted
crawl PDFs (the /AESV2 standard security handler) in a sandbox with no
crypto library. Tables are DERIVED from the GF(2^8) definitions at
import (nothing hand-typed that could drift from the spec) and the
whole cipher is pinned by the FIPS-197 appendix known-answer vectors
in tests/test_pdf.py.

Defensive/format-compatibility use only: this DECRYPTS existing
archives so their text can be extracted; it is not an endorsement of
AES-CBC for new designs. Throughput note for the 100 TB argument:
the T-table decrypt path measures ~0.6 MB/s/core (CPython) —
acceptable because AES-encrypted PDFs are a sub-percent slice of a
crawl and their content streams are KBs (a 5 KB stream costs ~8 ms);
a production deployment would swap cbc_decrypt's block callee for a
JVM/native codec behind the same signature without touching any
caller.
"""

from __future__ import annotations

# ----------------------------------------------------- GF(2^8) tables

_EXP = [0] * 512
_LOG = [0] * 256


def _build_field() -> None:
    x = 1
    for i in range(255):
        _EXP[i] = x
        _LOG[x] = i
        # multiply by the generator 0x03 = x * (0x02 ^ 0x01)
        xt = ((x << 1) ^ 0x11B) if x & 0x80 else (x << 1)
        x ^= xt
    for i in range(255, 512):
        _EXP[i] = _EXP[i - 255]


_build_field()


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[_LOG[a] + _LOG[b]]


def _rotl8(v: int, n: int) -> int:
    return ((v << n) | (v >> (8 - n))) & 0xFF


_SBOX = [0] * 256
_INV_SBOX = [0] * 256
for _a in range(256):
    _b = _EXP[255 - _LOG[_a]] if _a else 0  # multiplicative inverse
    _s = _b ^ _rotl8(_b, 1) ^ _rotl8(_b, 2) ^ _rotl8(_b, 3) ^ _rotl8(_b, 4) ^ 0x63
    _SBOX[_a] = _s
    _INV_SBOX[_s] = _a

# per-byte multiply tables for the (Inv)MixColumns constants
_M2 = [_gmul(i, 2) for i in range(256)]
_M3 = [_gmul(i, 3) for i in range(256)]
_M9 = [_gmul(i, 9) for i in range(256)]
_M11 = [_gmul(i, 11) for i in range(256)]
_M13 = [_gmul(i, 13) for i in range(256)]
_M14 = [_gmul(i, 14) for i in range(256)]

_RCON = [0] * 11
_RCON[1] = 1
for _i in range(2, 11):
    _RCON[_i] = _M2[_RCON[_i - 1]]


# -------------------------------------------------------- key schedule


def _expand_key(key: bytes) -> list[list[int]]:
    """FIPS-197 §5.2: round keys as a flat list of 4-byte words."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError(f"AES key length {len(key)}")
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return words


def _round_keys(key: bytes) -> list[list[int]]:
    """Round keys as 16-byte state lists (column-major, like states)."""
    w = _expand_key(key)
    return [
        [w[4 * r + c][i] for c in range(4) for i in range(4)]
        for r in range(len(w) // 4)
    ]


# ------------------------------------------------------- block cipher
# state is a 16-int list in COLUMN-major order (s[c*4+r]), matching the
# byte order blocks arrive in — FIPS-197 fig. 3.


def encrypt_block(key: bytes, block: bytes) -> bytes:
    return _encrypt_block_rk(_round_keys(key), block)


def _encrypt_block_rk(rks: list[list[int]], block: bytes) -> bytes:
    nr = len(rks) - 1
    s = [b ^ k for b, k in zip(block, rks[0])]
    for rnd in range(1, nr + 1):
        s = [_SBOX[b] for b in s]
        # ShiftRows: row r rotates left by r (column-major indexing)
        s = [s[((c + r) % 4) * 4 + r] for c in range(4) for r in range(4)]
        if rnd < nr:
            t = []
            for c in range(4):
                a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
                t += [
                    _M2[a0] ^ _M3[a1] ^ a2 ^ a3,
                    a0 ^ _M2[a1] ^ _M3[a2] ^ a3,
                    a0 ^ a1 ^ _M2[a2] ^ _M3[a3],
                    _M3[a0] ^ a1 ^ a2 ^ _M2[a3],
                ]
            s = t
        s = [b ^ k for b, k in zip(s, rks[rnd])]
    return bytes(s)


def decrypt_block(key: bytes, block: bytes) -> bytes:
    return _decrypt_block_rk(_round_keys(key), block)


def _decrypt_block_rk(rks: list[list[int]], block: bytes) -> bytes:
    nr = len(rks) - 1
    s = [b ^ k for b, k in zip(block, rks[nr])]
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows: row r rotates RIGHT by r
        s = [s[((c - r) % 4) * 4 + r] for c in range(4) for r in range(4)]
        s = [_INV_SBOX[b] for b in s]
        s = [b ^ k for b, k in zip(s, rks[rnd])]
        if rnd > 0:
            t = []
            for c in range(4):
                a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
                t += [
                    _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3],
                    _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3],
                    _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3],
                    _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3],
                ]
            s = t
    return bytes(s)


# ----------------------------------------- fast decrypt (T-tables)
# The "equivalent inverse cipher" (FIPS-197 §5.3.5): InvSubBytes +
# InvShiftRows + InvMixColumns folded into four 256-entry 32-bit
# tables, middle round keys pre-passed through InvMixColumns. Same
# math, ~10x fewer Python operations per block — this is the path CBC
# decryption (the crawl-hot direction) takes; the straightforward
# per-step implementation above remains as the cross-check reference
# (tests assert both agree on random blocks) and the FIPS vectors pin
# the tables.

_TD0 = [0] * 256
_TD1 = [0] * 256
_TD2 = [0] * 256
_TD3 = [0] * 256
for _x in range(256):
    _ib = _INV_SBOX[_x]
    _w = (_M14[_ib] << 24) | (_M9[_ib] << 16) | (_M13[_ib] << 8) | _M11[_ib]
    _TD0[_x] = _w
    _TD1[_x] = ((_w >> 8) | (_w << 24)) & 0xFFFFFFFF
    _TD2[_x] = ((_w >> 16) | (_w << 16)) & 0xFFFFFFFF
    _TD3[_x] = ((_w >> 24) | (_w << 8)) & 0xFFFFFFFF


def _dec_schedule(key: bytes) -> list[list[int]]:
    """Decryption round keys as 32-bit words, reversed, with the
    middle rounds pre-mixed through InvMixColumns."""
    w = _expand_key(key)
    nr = len(w) // 4 - 1

    def words(i: int) -> list[int]:
        return [
            (a << 24) | (b << 16) | (c << 8) | d for a, b, c, d in w[4 * i : 4 * i + 4]
        ]

    rounds = [words(nr)]
    for j in range(1, nr):
        mixed = []
        for a0, a1, a2, a3 in w[4 * (nr - j) : 4 * (nr - j) + 4]:
            mixed.append(
                ((_M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]) << 24)
                | ((_M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]) << 16)
                | ((_M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]) << 8)
                | (_M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3])
            )
        rounds.append(mixed)
    rounds.append(words(0))
    return rounds


def _decrypt_block_fast(rounds: list[list[int]], block: bytes) -> bytes:
    rk = rounds[0]
    s0 = int.from_bytes(block[0:4], "big") ^ rk[0]
    s1 = int.from_bytes(block[4:8], "big") ^ rk[1]
    s2 = int.from_bytes(block[8:12], "big") ^ rk[2]
    s3 = int.from_bytes(block[12:16], "big") ^ rk[3]
    td0, td1, td2, td3 = _TD0, _TD1, _TD2, _TD3
    for rk in rounds[1:-1]:
        t0 = td0[(s0 >> 24) & 0xFF] ^ td1[(s3 >> 16) & 0xFF] ^ td2[(s2 >> 8) & 0xFF] ^ td3[s1 & 0xFF] ^ rk[0]
        t1 = td0[(s1 >> 24) & 0xFF] ^ td1[(s0 >> 16) & 0xFF] ^ td2[(s3 >> 8) & 0xFF] ^ td3[s2 & 0xFF] ^ rk[1]
        t2 = td0[(s2 >> 24) & 0xFF] ^ td1[(s1 >> 16) & 0xFF] ^ td2[(s0 >> 8) & 0xFF] ^ td3[s3 & 0xFF] ^ rk[2]
        t3 = td0[(s3 >> 24) & 0xFF] ^ td1[(s2 >> 16) & 0xFF] ^ td2[(s1 >> 8) & 0xFF] ^ td3[s0 & 0xFF] ^ rk[3]
        s0, s1, s2, s3 = t0, t1, t2, t3
    rk = rounds[-1]
    ib = _INV_SBOX
    o0 = ((ib[(s0 >> 24) & 0xFF] << 24) | (ib[(s3 >> 16) & 0xFF] << 16) | (ib[(s2 >> 8) & 0xFF] << 8) | ib[s1 & 0xFF]) ^ rk[0]
    o1 = ((ib[(s1 >> 24) & 0xFF] << 24) | (ib[(s0 >> 16) & 0xFF] << 16) | (ib[(s3 >> 8) & 0xFF] << 8) | ib[s2 & 0xFF]) ^ rk[1]
    o2 = ((ib[(s2 >> 24) & 0xFF] << 24) | (ib[(s1 >> 16) & 0xFF] << 16) | (ib[(s0 >> 8) & 0xFF] << 8) | ib[s3 & 0xFF]) ^ rk[2]
    o3 = ((ib[(s3 >> 24) & 0xFF] << 24) | (ib[(s2 >> 16) & 0xFF] << 16) | (ib[(s1 >> 8) & 0xFF] << 8) | ib[s0 & 0xFF]) ^ rk[3]
    return (
        o0.to_bytes(4, "big")
        + o1.to_bytes(4, "big")
        + o2.to_bytes(4, "big")
        + o3.to_bytes(4, "big")
    )


# ----------------------------------------- fast encrypt (T-tables)
# The forward twin of the path above: SubBytes + ShiftRows +
# MixColumns folded into four 256-entry 32-bit tables. Encryption is
# NOT crawl-hot for content (we decrypt archives), but the R6 password
# KDF (Algorithm 2.B, extractor/pdf.py _hash_2b) is ~8k block
# ENCRYPTIONS per hash by design — the per-step reference below
# remains the cross-check (tests assert agreement on random blocks).

_TE0 = [0] * 256
_TE1 = [0] * 256
_TE2 = [0] * 256
_TE3 = [0] * 256
for _x in range(256):
    _sb = _SBOX[_x]
    _w = (_M2[_sb] << 24) | (_sb << 16) | (_sb << 8) | _M3[_sb]
    _TE0[_x] = _w
    _TE1[_x] = ((_w >> 8) | (_w << 24)) & 0xFFFFFFFF
    _TE2[_x] = ((_w >> 16) | (_w << 16)) & 0xFFFFFFFF
    _TE3[_x] = ((_w >> 24) | (_w << 8)) & 0xFFFFFFFF


def _enc_schedule(key: bytes) -> list[list[int]]:
    """Encryption round keys as 32-bit words (file order, no mixing)."""
    w = _expand_key(key)
    return [
        [
            (a << 24) | (b << 16) | (c << 8) | d
            for a, b, c, d in w[4 * i : 4 * i + 4]
        ]
        for i in range(len(w) // 4)
    ]


def _encrypt_block_fast(rounds: list[list[int]], block: bytes) -> bytes:
    rk = rounds[0]
    s0 = int.from_bytes(block[0:4], "big") ^ rk[0]
    s1 = int.from_bytes(block[4:8], "big") ^ rk[1]
    s2 = int.from_bytes(block[8:12], "big") ^ rk[2]
    s3 = int.from_bytes(block[12:16], "big") ^ rk[3]
    te0, te1, te2, te3 = _TE0, _TE1, _TE2, _TE3
    for rk in rounds[1:-1]:
        t0 = te0[(s0 >> 24) & 0xFF] ^ te1[(s1 >> 16) & 0xFF] ^ te2[(s2 >> 8) & 0xFF] ^ te3[s3 & 0xFF] ^ rk[0]
        t1 = te0[(s1 >> 24) & 0xFF] ^ te1[(s2 >> 16) & 0xFF] ^ te2[(s3 >> 8) & 0xFF] ^ te3[s0 & 0xFF] ^ rk[1]
        t2 = te0[(s2 >> 24) & 0xFF] ^ te1[(s3 >> 16) & 0xFF] ^ te2[(s0 >> 8) & 0xFF] ^ te3[s1 & 0xFF] ^ rk[2]
        t3 = te0[(s3 >> 24) & 0xFF] ^ te1[(s0 >> 16) & 0xFF] ^ te2[(s1 >> 8) & 0xFF] ^ te3[s2 & 0xFF] ^ rk[3]
        s0, s1, s2, s3 = t0, t1, t2, t3
    rk = rounds[-1]
    sb = _SBOX
    o0 = ((sb[(s0 >> 24) & 0xFF] << 24) | (sb[(s1 >> 16) & 0xFF] << 16) | (sb[(s2 >> 8) & 0xFF] << 8) | sb[s3 & 0xFF]) ^ rk[0]
    o1 = ((sb[(s1 >> 24) & 0xFF] << 24) | (sb[(s2 >> 16) & 0xFF] << 16) | (sb[(s3 >> 8) & 0xFF] << 8) | sb[s0 & 0xFF]) ^ rk[1]
    o2 = ((sb[(s2 >> 24) & 0xFF] << 24) | (sb[(s3 >> 16) & 0xFF] << 16) | (sb[(s0 >> 8) & 0xFF] << 8) | sb[s1 & 0xFF]) ^ rk[2]
    o3 = ((sb[(s3 >> 24) & 0xFF] << 24) | (sb[(s0 >> 16) & 0xFF] << 16) | (sb[(s1 >> 8) & 0xFF] << 8) | sb[s2 & 0xFF]) ^ rk[3]
    return (
        o0.to_bytes(4, "big")
        + o1.to_bytes(4, "big")
        + o2.to_bytes(4, "big")
        + o3.to_bytes(4, "big")
    )


# --------------------------------------------------------------- CBC


def cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF-style AES-CBC: the IV is the FIRST 16 bytes of ``data``
    (spec 7.6.2), PKCS#7 padding stripped. Raises ValueError on
    malformed length or padding — hostile bytes must reject cleanly."""
    if len(data) < 32 or len(data) % 16 != 0:
        raise ValueError("AES-CBC data length")
    if len(key) == 16:  # AESV2 body path: unrolled word loop
        out = bytearray(cbc_decrypt128_raw(key, data[:16], data[16:]))
        pad = out[-1]
        if pad < 1 or pad > 16 or out[-pad:] != bytes([pad]) * pad:
            raise ValueError("AES-CBC padding")
        return bytes(out[:-pad])
    rounds = _dec_schedule(key)  # schedule once, not per block
    prev = data[:16]
    out = bytearray()
    for off in range(16, len(data), 16):
        blk = data[off : off + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block_fast(rounds, blk), prev))
        prev = blk
    pad = out[-1]
    if pad < 1 or pad > 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("AES-CBC padding")
    return bytes(out[:-pad])


def cbc_encrypt(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """Fixture-side inverse of cbc_decrypt (IV prepended, PKCS#7
    applied) — deterministic bytes for a deterministic IV."""
    if len(iv) != 16:
        raise ValueError("AES-CBC IV length")
    pad = 16 - len(plain) % 16
    plain = plain + bytes([pad]) * pad
    if len(key) == 16:  # AESV2 body path: unrolled word loop
        return iv + cbc_encrypt128_raw(key, iv, plain)
    rounds = _enc_schedule(key)
    out = bytearray(iv)
    prev = iv
    for off in range(0, len(plain), 16):
        blk = bytes(a ^ b for a, b in zip(plain[off : off + 16], prev))
        prev = _encrypt_block_fast(rounds, blk)
        out += prev
    return bytes(out)


def cbc_encrypt_raw(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """Raw CBC: explicit IV (NOT prepended to the output), NO padding —
    ``plain`` must already be a multiple of 16. This is the CBC mode
    the PDF 2.0 R6 key machinery uses: Algorithm 2.B's 64-repetition
    block is inherently 16-aligned, and /UE //OE hold the 32-byte file
    key CBC-encrypted with a zero IV and no padding (spec 7.6.4.4.8)."""
    if len(iv) != 16 or len(plain) % 16 != 0:
        raise ValueError("raw AES-CBC geometry")
    if len(key) == 16:  # the KDF hot path: unrolled word loop
        return cbc_encrypt128_raw(key, iv, plain)
    rounds = _enc_schedule(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(plain), 16):
        blk = bytes(a ^ b for a, b in zip(plain[off : off + 16], prev))
        prev = _encrypt_block_fast(rounds, blk)
        out += prev
    return bytes(out)


def cbc_decrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Inverse of cbc_encrypt_raw (explicit IV, no padding strip)."""
    if len(iv) != 16 or len(data) % 16 != 0 or not data:
        raise ValueError("raw AES-CBC geometry")
    if len(key) == 16:  # unrolled word loop
        return cbc_decrypt128_raw(key, iv, data)
    rounds = _dec_schedule(key)
    prev = iv
    out = bytearray()
    for off in range(0, len(data), 16):
        blk = data[off : off + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block_fast(rounds, blk), prev))
        prev = blk
    return bytes(out)


# ------------------------------ unrolled AES-128 CBC (the KDF hot path)
# The PDF 2.0 R6 password KDF (Algorithm 2.B) performs thousands of
# serial AES-128-CBC block encryptions per hash — per-block function
# calls, round-key slicing and bytes round-trips dominate the pure-
# Python cost. This fully-unrolled word loop keeps the whole message
# in 32-bit words, binds the 44 schedule words to locals once per
# MESSAGE, and runs ~2.5x faster per block. Bytes-identical to
# cbc_encrypt_raw for 16-byte keys (randomized cross-check in tests).
def cbc_encrypt128_raw(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """AES-128-CBC-NOPAD encrypt, fully unrolled T-table word loop —
    the R6 KDF / AESV2 body hot path (len(plain) % 16 == 0). Same
    bytes as cbc_encrypt_raw(key, iv, plain) for 16-byte keys; the
    per-step reference cross-check in the tests pins agreement."""
    import struct

    w = _expand_key(key)
    (
        k0, k1, k2, k3, k4, k5, k6, k7, k8, k9, k10, k11, k12, k13, k14, k15, k16, k17, k18, k19, k20, k21, k22, k23, k24, k25, k26, k27, k28, k29, k30, k31, k32, k33, k34, k35, k36, k37, k38, k39, k40, k41, k42, k43,
    ) = [(a << 24) | (b << 16) | (c << 8) | d for a, b, c, d in w]
    n = len(plain) >> 2
    ws = struct.unpack(f">{n}I", plain)
    c0, c1, c2, c3 = struct.unpack(">4I", iv)
    te0, te1, te2, te3, sb = _TE0, _TE1, _TE2, _TE3, _SBOX
    out = []
    ap = out.append
    for i in range(0, n, 4):
        s0 = ws[i] ^ c0 ^ k0
        s1 = ws[i + 1] ^ c1 ^ k1
        s2 = ws[i + 2] ^ c2 ^ k2
        s3 = ws[i + 3] ^ c3 ^ k3
        t1_0 = te0[s0 >> 24] ^ te1[(s1 >> 16) & 255] ^ te2[(s2 >> 8) & 255] ^ te3[s3 & 255] ^ k4
        t1_1 = te0[s1 >> 24] ^ te1[(s2 >> 16) & 255] ^ te2[(s3 >> 8) & 255] ^ te3[s0 & 255] ^ k5
        t1_2 = te0[s2 >> 24] ^ te1[(s3 >> 16) & 255] ^ te2[(s0 >> 8) & 255] ^ te3[s1 & 255] ^ k6
        t1_3 = te0[s3 >> 24] ^ te1[(s0 >> 16) & 255] ^ te2[(s1 >> 8) & 255] ^ te3[s2 & 255] ^ k7
        t2_0 = te0[t1_0 >> 24] ^ te1[(t1_1 >> 16) & 255] ^ te2[(t1_2 >> 8) & 255] ^ te3[t1_3 & 255] ^ k8
        t2_1 = te0[t1_1 >> 24] ^ te1[(t1_2 >> 16) & 255] ^ te2[(t1_3 >> 8) & 255] ^ te3[t1_0 & 255] ^ k9
        t2_2 = te0[t1_2 >> 24] ^ te1[(t1_3 >> 16) & 255] ^ te2[(t1_0 >> 8) & 255] ^ te3[t1_1 & 255] ^ k10
        t2_3 = te0[t1_3 >> 24] ^ te1[(t1_0 >> 16) & 255] ^ te2[(t1_1 >> 8) & 255] ^ te3[t1_2 & 255] ^ k11
        t3_0 = te0[t2_0 >> 24] ^ te1[(t2_1 >> 16) & 255] ^ te2[(t2_2 >> 8) & 255] ^ te3[t2_3 & 255] ^ k12
        t3_1 = te0[t2_1 >> 24] ^ te1[(t2_2 >> 16) & 255] ^ te2[(t2_3 >> 8) & 255] ^ te3[t2_0 & 255] ^ k13
        t3_2 = te0[t2_2 >> 24] ^ te1[(t2_3 >> 16) & 255] ^ te2[(t2_0 >> 8) & 255] ^ te3[t2_1 & 255] ^ k14
        t3_3 = te0[t2_3 >> 24] ^ te1[(t2_0 >> 16) & 255] ^ te2[(t2_1 >> 8) & 255] ^ te3[t2_2 & 255] ^ k15
        t4_0 = te0[t3_0 >> 24] ^ te1[(t3_1 >> 16) & 255] ^ te2[(t3_2 >> 8) & 255] ^ te3[t3_3 & 255] ^ k16
        t4_1 = te0[t3_1 >> 24] ^ te1[(t3_2 >> 16) & 255] ^ te2[(t3_3 >> 8) & 255] ^ te3[t3_0 & 255] ^ k17
        t4_2 = te0[t3_2 >> 24] ^ te1[(t3_3 >> 16) & 255] ^ te2[(t3_0 >> 8) & 255] ^ te3[t3_1 & 255] ^ k18
        t4_3 = te0[t3_3 >> 24] ^ te1[(t3_0 >> 16) & 255] ^ te2[(t3_1 >> 8) & 255] ^ te3[t3_2 & 255] ^ k19
        t5_0 = te0[t4_0 >> 24] ^ te1[(t4_1 >> 16) & 255] ^ te2[(t4_2 >> 8) & 255] ^ te3[t4_3 & 255] ^ k20
        t5_1 = te0[t4_1 >> 24] ^ te1[(t4_2 >> 16) & 255] ^ te2[(t4_3 >> 8) & 255] ^ te3[t4_0 & 255] ^ k21
        t5_2 = te0[t4_2 >> 24] ^ te1[(t4_3 >> 16) & 255] ^ te2[(t4_0 >> 8) & 255] ^ te3[t4_1 & 255] ^ k22
        t5_3 = te0[t4_3 >> 24] ^ te1[(t4_0 >> 16) & 255] ^ te2[(t4_1 >> 8) & 255] ^ te3[t4_2 & 255] ^ k23
        t6_0 = te0[t5_0 >> 24] ^ te1[(t5_1 >> 16) & 255] ^ te2[(t5_2 >> 8) & 255] ^ te3[t5_3 & 255] ^ k24
        t6_1 = te0[t5_1 >> 24] ^ te1[(t5_2 >> 16) & 255] ^ te2[(t5_3 >> 8) & 255] ^ te3[t5_0 & 255] ^ k25
        t6_2 = te0[t5_2 >> 24] ^ te1[(t5_3 >> 16) & 255] ^ te2[(t5_0 >> 8) & 255] ^ te3[t5_1 & 255] ^ k26
        t6_3 = te0[t5_3 >> 24] ^ te1[(t5_0 >> 16) & 255] ^ te2[(t5_1 >> 8) & 255] ^ te3[t5_2 & 255] ^ k27
        t7_0 = te0[t6_0 >> 24] ^ te1[(t6_1 >> 16) & 255] ^ te2[(t6_2 >> 8) & 255] ^ te3[t6_3 & 255] ^ k28
        t7_1 = te0[t6_1 >> 24] ^ te1[(t6_2 >> 16) & 255] ^ te2[(t6_3 >> 8) & 255] ^ te3[t6_0 & 255] ^ k29
        t7_2 = te0[t6_2 >> 24] ^ te1[(t6_3 >> 16) & 255] ^ te2[(t6_0 >> 8) & 255] ^ te3[t6_1 & 255] ^ k30
        t7_3 = te0[t6_3 >> 24] ^ te1[(t6_0 >> 16) & 255] ^ te2[(t6_1 >> 8) & 255] ^ te3[t6_2 & 255] ^ k31
        t8_0 = te0[t7_0 >> 24] ^ te1[(t7_1 >> 16) & 255] ^ te2[(t7_2 >> 8) & 255] ^ te3[t7_3 & 255] ^ k32
        t8_1 = te0[t7_1 >> 24] ^ te1[(t7_2 >> 16) & 255] ^ te2[(t7_3 >> 8) & 255] ^ te3[t7_0 & 255] ^ k33
        t8_2 = te0[t7_2 >> 24] ^ te1[(t7_3 >> 16) & 255] ^ te2[(t7_0 >> 8) & 255] ^ te3[t7_1 & 255] ^ k34
        t8_3 = te0[t7_3 >> 24] ^ te1[(t7_0 >> 16) & 255] ^ te2[(t7_1 >> 8) & 255] ^ te3[t7_2 & 255] ^ k35
        t9_0 = te0[t8_0 >> 24] ^ te1[(t8_1 >> 16) & 255] ^ te2[(t8_2 >> 8) & 255] ^ te3[t8_3 & 255] ^ k36
        t9_1 = te0[t8_1 >> 24] ^ te1[(t8_2 >> 16) & 255] ^ te2[(t8_3 >> 8) & 255] ^ te3[t8_0 & 255] ^ k37
        t9_2 = te0[t8_2 >> 24] ^ te1[(t8_3 >> 16) & 255] ^ te2[(t8_0 >> 8) & 255] ^ te3[t8_1 & 255] ^ k38
        t9_3 = te0[t8_3 >> 24] ^ te1[(t8_0 >> 16) & 255] ^ te2[(t8_1 >> 8) & 255] ^ te3[t8_2 & 255] ^ k39
        c0 = ((sb[t9_0 >> 24] << 24) | (sb[(t9_1 >> 16) & 255] << 16) | (sb[(t9_2 >> 8) & 255] << 8) | sb[t9_3 & 255]) ^ k40
        c1 = ((sb[t9_1 >> 24] << 24) | (sb[(t9_2 >> 16) & 255] << 16) | (sb[(t9_3 >> 8) & 255] << 8) | sb[t9_0 & 255]) ^ k41
        c2 = ((sb[t9_2 >> 24] << 24) | (sb[(t9_3 >> 16) & 255] << 16) | (sb[(t9_0 >> 8) & 255] << 8) | sb[t9_1 & 255]) ^ k42
        c3 = ((sb[t9_3 >> 24] << 24) | (sb[(t9_0 >> 16) & 255] << 16) | (sb[(t9_1 >> 8) & 255] << 8) | sb[t9_2 & 255]) ^ k43
        ap(c0)
        ap(c1)
        ap(c2)
        ap(c3)
    return struct.pack(f">{n}I", *out)


# The decrypt twin of cbc_encrypt128_raw (see above).
def cbc_decrypt128_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-128-CBC-NOPAD decrypt, fully unrolled — the AESV2 body
    extraction hot path. Bytes-identical to cbc_decrypt_raw for
    16-byte keys (randomized cross-check in tests)."""
    import struct

    (
        k0, k1, k2, k3, k4, k5, k6, k7, k8, k9, k10, k11, k12, k13, k14, k15, k16, k17, k18, k19, k20, k21, k22, k23, k24, k25, k26, k27, k28, k29, k30, k31, k32, k33, k34, k35, k36, k37, k38, k39, k40, k41, k42, k43,
    ) = [w for r in _dec_schedule(key) for w in r]
    n = len(data) >> 2
    ws = struct.unpack(f">{n}I", data)
    p0, p1, p2, p3 = struct.unpack(">4I", iv)
    td0, td1, td2, td3, ib = _TD0, _TD1, _TD2, _TD3, _INV_SBOX
    out = []
    ap = out.append
    for i in range(0, n, 4):
        w0 = ws[i]
        w1 = ws[i + 1]
        w2 = ws[i + 2]
        w3 = ws[i + 3]
        s0 = w0 ^ k0
        s1 = w1 ^ k1
        s2 = w2 ^ k2
        s3 = w3 ^ k3
        t1_0 = td0[s0 >> 24] ^ td1[(s3 >> 16) & 255] ^ td2[(s2 >> 8) & 255] ^ td3[s1 & 255] ^ k4
        t1_1 = td0[s1 >> 24] ^ td1[(s0 >> 16) & 255] ^ td2[(s3 >> 8) & 255] ^ td3[s2 & 255] ^ k5
        t1_2 = td0[s2 >> 24] ^ td1[(s1 >> 16) & 255] ^ td2[(s0 >> 8) & 255] ^ td3[s3 & 255] ^ k6
        t1_3 = td0[s3 >> 24] ^ td1[(s2 >> 16) & 255] ^ td2[(s1 >> 8) & 255] ^ td3[s0 & 255] ^ k7
        t2_0 = td0[t1_0 >> 24] ^ td1[(t1_3 >> 16) & 255] ^ td2[(t1_2 >> 8) & 255] ^ td3[t1_1 & 255] ^ k8
        t2_1 = td0[t1_1 >> 24] ^ td1[(t1_0 >> 16) & 255] ^ td2[(t1_3 >> 8) & 255] ^ td3[t1_2 & 255] ^ k9
        t2_2 = td0[t1_2 >> 24] ^ td1[(t1_1 >> 16) & 255] ^ td2[(t1_0 >> 8) & 255] ^ td3[t1_3 & 255] ^ k10
        t2_3 = td0[t1_3 >> 24] ^ td1[(t1_2 >> 16) & 255] ^ td2[(t1_1 >> 8) & 255] ^ td3[t1_0 & 255] ^ k11
        t3_0 = td0[t2_0 >> 24] ^ td1[(t2_3 >> 16) & 255] ^ td2[(t2_2 >> 8) & 255] ^ td3[t2_1 & 255] ^ k12
        t3_1 = td0[t2_1 >> 24] ^ td1[(t2_0 >> 16) & 255] ^ td2[(t2_3 >> 8) & 255] ^ td3[t2_2 & 255] ^ k13
        t3_2 = td0[t2_2 >> 24] ^ td1[(t2_1 >> 16) & 255] ^ td2[(t2_0 >> 8) & 255] ^ td3[t2_3 & 255] ^ k14
        t3_3 = td0[t2_3 >> 24] ^ td1[(t2_2 >> 16) & 255] ^ td2[(t2_1 >> 8) & 255] ^ td3[t2_0 & 255] ^ k15
        t4_0 = td0[t3_0 >> 24] ^ td1[(t3_3 >> 16) & 255] ^ td2[(t3_2 >> 8) & 255] ^ td3[t3_1 & 255] ^ k16
        t4_1 = td0[t3_1 >> 24] ^ td1[(t3_0 >> 16) & 255] ^ td2[(t3_3 >> 8) & 255] ^ td3[t3_2 & 255] ^ k17
        t4_2 = td0[t3_2 >> 24] ^ td1[(t3_1 >> 16) & 255] ^ td2[(t3_0 >> 8) & 255] ^ td3[t3_3 & 255] ^ k18
        t4_3 = td0[t3_3 >> 24] ^ td1[(t3_2 >> 16) & 255] ^ td2[(t3_1 >> 8) & 255] ^ td3[t3_0 & 255] ^ k19
        t5_0 = td0[t4_0 >> 24] ^ td1[(t4_3 >> 16) & 255] ^ td2[(t4_2 >> 8) & 255] ^ td3[t4_1 & 255] ^ k20
        t5_1 = td0[t4_1 >> 24] ^ td1[(t4_0 >> 16) & 255] ^ td2[(t4_3 >> 8) & 255] ^ td3[t4_2 & 255] ^ k21
        t5_2 = td0[t4_2 >> 24] ^ td1[(t4_1 >> 16) & 255] ^ td2[(t4_0 >> 8) & 255] ^ td3[t4_3 & 255] ^ k22
        t5_3 = td0[t4_3 >> 24] ^ td1[(t4_2 >> 16) & 255] ^ td2[(t4_1 >> 8) & 255] ^ td3[t4_0 & 255] ^ k23
        t6_0 = td0[t5_0 >> 24] ^ td1[(t5_3 >> 16) & 255] ^ td2[(t5_2 >> 8) & 255] ^ td3[t5_1 & 255] ^ k24
        t6_1 = td0[t5_1 >> 24] ^ td1[(t5_0 >> 16) & 255] ^ td2[(t5_3 >> 8) & 255] ^ td3[t5_2 & 255] ^ k25
        t6_2 = td0[t5_2 >> 24] ^ td1[(t5_1 >> 16) & 255] ^ td2[(t5_0 >> 8) & 255] ^ td3[t5_3 & 255] ^ k26
        t6_3 = td0[t5_3 >> 24] ^ td1[(t5_2 >> 16) & 255] ^ td2[(t5_1 >> 8) & 255] ^ td3[t5_0 & 255] ^ k27
        t7_0 = td0[t6_0 >> 24] ^ td1[(t6_3 >> 16) & 255] ^ td2[(t6_2 >> 8) & 255] ^ td3[t6_1 & 255] ^ k28
        t7_1 = td0[t6_1 >> 24] ^ td1[(t6_0 >> 16) & 255] ^ td2[(t6_3 >> 8) & 255] ^ td3[t6_2 & 255] ^ k29
        t7_2 = td0[t6_2 >> 24] ^ td1[(t6_1 >> 16) & 255] ^ td2[(t6_0 >> 8) & 255] ^ td3[t6_3 & 255] ^ k30
        t7_3 = td0[t6_3 >> 24] ^ td1[(t6_2 >> 16) & 255] ^ td2[(t6_1 >> 8) & 255] ^ td3[t6_0 & 255] ^ k31
        t8_0 = td0[t7_0 >> 24] ^ td1[(t7_3 >> 16) & 255] ^ td2[(t7_2 >> 8) & 255] ^ td3[t7_1 & 255] ^ k32
        t8_1 = td0[t7_1 >> 24] ^ td1[(t7_0 >> 16) & 255] ^ td2[(t7_3 >> 8) & 255] ^ td3[t7_2 & 255] ^ k33
        t8_2 = td0[t7_2 >> 24] ^ td1[(t7_1 >> 16) & 255] ^ td2[(t7_0 >> 8) & 255] ^ td3[t7_3 & 255] ^ k34
        t8_3 = td0[t7_3 >> 24] ^ td1[(t7_2 >> 16) & 255] ^ td2[(t7_1 >> 8) & 255] ^ td3[t7_0 & 255] ^ k35
        t9_0 = td0[t8_0 >> 24] ^ td1[(t8_3 >> 16) & 255] ^ td2[(t8_2 >> 8) & 255] ^ td3[t8_1 & 255] ^ k36
        t9_1 = td0[t8_1 >> 24] ^ td1[(t8_0 >> 16) & 255] ^ td2[(t8_3 >> 8) & 255] ^ td3[t8_2 & 255] ^ k37
        t9_2 = td0[t8_2 >> 24] ^ td1[(t8_1 >> 16) & 255] ^ td2[(t8_0 >> 8) & 255] ^ td3[t8_3 & 255] ^ k38
        t9_3 = td0[t8_3 >> 24] ^ td1[(t8_2 >> 16) & 255] ^ td2[(t8_1 >> 8) & 255] ^ td3[t8_0 & 255] ^ k39
        o0 = (((ib[t9_0 >> 24] << 24) | (ib[(t9_3 >> 16) & 255] << 16) | (ib[(t9_2 >> 8) & 255] << 8) | ib[t9_1 & 255]) ^ k40) ^ p0
        o1 = (((ib[t9_1 >> 24] << 24) | (ib[(t9_0 >> 16) & 255] << 16) | (ib[(t9_3 >> 8) & 255] << 8) | ib[t9_2 & 255]) ^ k41) ^ p1
        o2 = (((ib[t9_2 >> 24] << 24) | (ib[(t9_1 >> 16) & 255] << 16) | (ib[(t9_0 >> 8) & 255] << 8) | ib[t9_3 & 255]) ^ k42) ^ p2
        o3 = (((ib[t9_3 >> 24] << 24) | (ib[(t9_2 >> 16) & 255] << 16) | (ib[(t9_1 >> 8) & 255] << 8) | ib[t9_0 & 255]) ^ k43) ^ p3
        ap(o0)
        ap(o1)
        ap(o2)
        ap(o3)
        p0, p1, p2, p3 = w0, w1, w2, w3
    return struct.pack(f">{n}I", *out)
