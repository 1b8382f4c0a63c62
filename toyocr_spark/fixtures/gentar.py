"""Deterministic TAR fixture builder — multi-document archives with
the member kinds a real bundle carries: text documents in any dispatch
format, opaque binary resources the walk must skip, directories and
symlinks (structural, never documents). Pure stdlib tarfile with all
metadata pinned (mtime=0, uid/gid=0, empty names) so identical inputs
give identical bytes.

Reference analogue: fixture generation feeding the decode seam
(/root/reference/data/dataset_mapper.py:151-155).
"""

from __future__ import annotations

import io
import tarfile


def build_tar(
    members: list[tuple[str, bytes]],
    *,
    with_dir: bool = False,
    with_symlink: bool = False,
) -> bytes:
    """Assemble an uncompressed POSIX tar with the given (name, bytes)
    regular-file members in order; optional directory and symlink
    entries exercise the structural-skip path."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:", format=tarfile.USTAR_FORMAT) as tf:
        if with_dir:
            d = tarfile.TarInfo("docs/")
            d.type = tarfile.DIRTYPE
            d.mtime = 0
            tf.addfile(d)
        for name, payload in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(payload)
            ti.mtime = 0
            ti.uid = ti.gid = 0
            ti.uname = ti.gname = ""
            tf.addfile(ti, io.BytesIO(payload))
        if with_symlink:
            ln = tarfile.TarInfo("docs/latest")
            ln.type = tarfile.SYMTYPE
            ln.linkname = members[0][0] if members else "x"
            ln.mtime = 0
            tf.addfile(ln)
    return buf.getvalue()
