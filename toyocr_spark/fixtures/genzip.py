"""Deterministic generic-ZIP fixture builder — multi-document bundles
with the member kinds a real site export carries: text documents in
any dispatch format (STORED and DEFLATED both exercised), opaque
binary resources the walk must skip, directory entries (structural),
and nested archives the mutual no-recursion guard must refuse. All
metadata pinned (DOS epoch date_time, no extra fields) so identical
inputs give identical bytes.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations

import io
import zipfile

_DOS_EPOCH = (1980, 1, 1, 0, 0, 0)


def build_zip(
    members: list[tuple[str, bytes]],
    *,
    with_dir: bool = False,
    alternate_methods: bool = True,
) -> bytes:
    """Assemble a zip with the given (name, bytes) regular-file
    members in order; `alternate_methods` stores even-indexed members
    STORED and odd-indexed DEFLATED so both decode paths prove out."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        if with_dir:
            d = zipfile.ZipInfo("docs/", date_time=_DOS_EPOCH)
            d.external_attr = 0o40755 << 16
            zf.writestr(d, b"")
        for i, (name, payload) in enumerate(members):
            info = zipfile.ZipInfo(name, date_time=_DOS_EPOCH)
            method = (
                zipfile.ZIP_STORED
                if (i % 2 == 0 or not alternate_methods)
                else zipfile.ZIP_DEFLATED
            )
            zf.writestr(info, payload, compress_type=method)
    return buf.getvalue()
