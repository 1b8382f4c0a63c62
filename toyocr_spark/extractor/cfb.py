"""MS-CFB (OLE2 compound file) container reader — the carrier of the
legacy Office binary formats (.doc/.xls/.ppt) a web crawl still sees
daily on government and university hosts.

Reference analogue: the byte -> array decode seam the survey grafts
(/root/reference/data/dataset_mapper.py:151-155) — one more container
walk feeding the SAME Block stream as HTML/PDF/OOXML; the format
machinery lives here, everything downstream is shared.

Pure stdlib, read-only, and bounded: every sector index is checked
against the file, every chain walk carries a visited-set cycle guard,
and any structural inconsistency raises ValueError (callers translate
that into the kernel's quiet-skip contract). Spec: [MS-CFB] — header,
DIFAT, FAT, miniFAT, directory; version 3 (512-byte sectors) and
version 4 (4096) both accepted.
"""

from __future__ import annotations

import struct

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_MAXREGSECT = 0xFFFFFFFA
_NOSTREAM = 0xFFFFFFFF


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


class CfbFile:
    """Parsed compound file: directory + stream reads by name."""

    def __init__(self, data: bytes) -> None:
        if len(data) < 512 or data[:8] != CFB_MAGIC:
            raise ValueError("not a CFB container")
        self._data = data
        shift = _u16(data, 30)
        if shift not in (9, 12):
            raise ValueError("CFB sector size out of spec")
        self._ss = 1 << shift
        mini_shift = _u16(data, 32)
        if not (2 <= mini_shift < shift):
            raise ValueError("CFB mini sector size out of spec")
        self._mss = 1 << mini_shift
        self._n_sectors = max(0, (len(data) - 512 + self._ss - 1) // self._ss)
        n_fat = _u32(data, 44)
        first_dir = _u32(data, 48)
        self._mini_cutoff = _u32(data, 56)
        first_minifat = _u32(data, 60)
        first_difat = _u32(data, 68)
        n_difat = _u32(data, 72)

        # DIFAT: 109 header slots, then a chained overflow (each DIFAT
        # sector is ss/4 - 1 FAT locators + a next pointer)
        fat_secs = [
            s
            for s in struct.unpack_from("<109I", data, 76)
            if s <= _MAXREGSECT
        ]
        sec, hops = first_difat, 0
        while sec <= _MAXREGSECT:
            if hops > n_difat + 1 or hops > self._n_sectors:
                raise ValueError("CFB DIFAT chain out of bounds")
            raw = self._sector(sec)
            per = self._ss // 4 - 1
            ent = struct.unpack_from(f"<{per + 1}I", raw, 0)
            fat_secs.extend(s for s in ent[:per] if s <= _MAXREGSECT)
            sec = ent[per]
            hops += 1
        if len(fat_secs) < n_fat:
            raise ValueError("CFB FAT sector list short")

        fat: list[int] = []
        per = self._ss // 4
        for s in fat_secs[:n_fat]:
            fat.extend(struct.unpack_from(f"<{per}I", self._sector(s), 0))
        self._fat = fat

        # directory: 128-byte entries over the FAT chain
        dirblob = b"".join(self._sector(s) for s in self._chain(first_dir))
        self._entries: list[tuple[str, int, int, int]] = []  # name, type, start, size
        for off in range(0, len(dirblob) - 127, 128):
            nlen = _u16(dirblob, off + 64)
            typ = dirblob[off + 66]
            if typ == 0 or not (2 <= nlen <= 64):
                continue
            name = dirblob[off : off + nlen - 2].decode("utf-16-le", "replace")
            start = _u32(dirblob, off + 116)
            size = struct.unpack_from("<Q", dirblob, off + 120)[0] & 0x7FFFFFFF
            self._entries.append((name, typ, start, size))

        roots = [e for e in self._entries if e[1] == 5]
        if not roots:
            raise ValueError("CFB has no root entry")
        _, _, mini_start, mini_size = roots[0]
        if mini_size:
            blob = b"".join(self._sector(s) for s in self._chain(mini_start))
            self._ministream = blob[:mini_size]
        else:
            self._ministream = b""
        if first_minifat <= _MAXREGSECT:
            blob = b"".join(self._sector(s) for s in self._chain(first_minifat))
            self._minifat = list(
                struct.unpack_from(f"<{len(blob) // 4}I", blob, 0)
            )
        else:
            self._minifat = []

    # -- sector plumbing -------------------------------------------------

    def _sector(self, n: int) -> bytes:
        off = 512 + n * self._ss
        if n > _MAXREGSECT or off + self._ss > len(self._data) + self._ss - 1:
            raise ValueError("CFB sector out of bounds")
        raw = self._data[off : off + self._ss]
        return raw.ljust(self._ss, b"\x00")  # final sector may be short

    def _chain(self, start: int) -> list[int]:
        out: list[int] = []
        seen: set[int] = set()
        sec = start
        while sec <= _MAXREGSECT:
            if sec in seen or len(out) > len(self._fat):
                raise ValueError("CFB FAT chain cycles")
            seen.add(sec)
            out.append(sec)
            if sec >= len(self._fat):
                raise ValueError("CFB chain outruns the FAT")
            sec = self._fat[sec]
        return out

    def _mini_chain(self, start: int) -> list[int]:
        out: list[int] = []
        seen: set[int] = set()
        sec = start
        while sec <= _MAXREGSECT:
            if sec in seen or len(out) > len(self._minifat):
                raise ValueError("CFB miniFAT chain cycles")
            seen.add(sec)
            out.append(sec)
            if sec >= len(self._minifat):
                raise ValueError("CFB chain outruns the miniFAT")
            sec = self._minifat[sec]
        return out

    # -- public surface --------------------------------------------------

    def names(self) -> list[str]:
        return [e[0] for e in self._entries if e[1] == 2]

    def has_stream(self, name: str) -> bool:
        return any(e[0] == name and e[1] == 2 for e in self._entries)

    def stream(self, name: str) -> bytes:
        """Stream bytes by directory name. Streams under the mini
        cutoff live in the root's ministream via the miniFAT; larger
        ones chain through the main FAT."""
        for ename, typ, start, size in self._entries:
            if typ != 2 or ename != name:
                continue
            if size == 0:
                return b""
            if size < self._mini_cutoff:
                parts = [
                    self._ministream[s * self._mss : (s + 1) * self._mss]
                    for s in self._mini_chain(start)
                ]
            else:
                parts = [self._sector(s) for s in self._chain(start)]
            blob = b"".join(parts)
            if len(blob) < size:
                raise ValueError("CFB stream shorter than directory size")
            return blob[:size]
        raise ValueError(f"CFB stream not found: {name!r}")
