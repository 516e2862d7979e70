r"""Deterministic arXiv-source tarball fixtures for the S4 scan.

Each fixture exercises one behavior of the reference's
``read_tex_files`` (arxiv.py:50-85):

- multi-member sources (members concatenate; non-.tex members are
  ignored);
- an undecodable .tex member (skipped, arxiv.py:77-79);
- a plain-text payload misnamed .tar.gz (ReadError fallback);
- a paper whose macros blow up (DemacroError quarantine).

Everything — member names, contents, tar metadata — is a pure function
of the paper index, so the same fixtures regenerate bit-stable content
anywhere (tar/gzip timestamps are pinned to 0).
"""

from __future__ import annotations

import gzip
import io
import os
import tarfile
from typing import List

N_PAPERS = 6
POISON_IDX = 4  # macro bomb → demacro quarantine
PLAIN_IDX = 5  # not a tar at all → single-tex fallback


def paper_sources(idx: int) -> dict:
    """{member_name: bytes} for paper ``idx``."""
    mac = (
        "\\newcommand{\\vv}[1]{\\mathbf{#1}}\n"
        "\\def\\eps{\\varepsilon}\n"
    )
    main = (
        "\\documentclass{article}\n" + mac +
        "\\begin{document}\n"
        f"Intro for paper {idx}. % comment\n"
        f"$\\vv{{x_{idx}}} + \\eps$\n"
        f"\\begin{{equation}}a_{idx} = b^{idx}\\end{{equation}}\n"
    )
    sect = (
        f"\\section{{Results {idx}}}\n"
        f"$$\\sum_k c_k^{idx}$$\n"
        "\\end{document}\n"
    )
    if idx == POISON_IDX:
        # regex-metachar macro name: the reference's pydemacro raises
        main = "\\newcommand{\\a(}{x} $\\a( + 1$\n" + main
    return {
        "main.tex": main.encode("utf-8"),
        "sections/results.tex": sect.encode("utf-8"),
        "notes.txt": f"not latex {idx}".encode("utf-8"),
        "legacy.tex": ("caf\xe9 latin1 " + str(idx)).encode("latin-1"),
    }


def _fixture_bytes(idx: int) -> bytes:
    if idx == PLAIN_IDX:
        # a bare tex file served under a .tar.gz name
        return f"$z_{idx}^2$ plain payload\n".encode("utf-8")
    tar_buf = io.BytesIO()
    with tarfile.open(fileobj=tar_buf, mode="w") as tf:
        for name, data in sorted(paper_sources(idx).items()):
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            tf.addfile(info, io.BytesIO(data))
    gz_buf = io.BytesIO()
    with gzip.GzipFile(fileobj=gz_buf, mode="wb", mtime=0) as gz:
        gz.write(tar_buf.getvalue())
    return gz_buf.getvalue()


def write_fixture_tarballs(out_dir: str) -> List[str]:
    """Write the fixture set; returns the paths.

    Always (re)writes via atomic rename: a skip-if-exists would keep
    stale files around when a fixture's *definition* changes between
    runs, silently diverging from the regenerated golden; the rename
    keeps concurrent writers (parallel tests sharing /tmp) safe.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for idx in range(N_PAPERS):
        path = os.path.join(out_dir, f"2003.{10000 + idx}.tar.gz")
        paths.append(path)
        blob = _fixture_bytes(idx)
        if os.path.exists(path):
            with open(path, "rb") as fh:
                if fh.read() == blob:
                    continue  # bit-identical — nothing to do
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, path)
    return paths
