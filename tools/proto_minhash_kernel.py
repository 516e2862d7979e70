#!/usr/bin/env python
"""Offline prototyping of the fused profile kernel (guide §1: measure
before building).  Collects the x10 shingle sets and times exact
variants of the md5 MinHash family.  NOT part of the frozen bench."""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

K = 8
SUFFIXES = [f"#{i}".encode() for i in range(K)]


def variant_naive(sets):
    out = []
    for sh in sets:
        sigs = []
        for i in range(K):
            suf = SUFFIXES[i]
            sigs.append(min(hashlib.md5(s + suf).hexdigest() for s in sh))
        out.append(sigs)
    return out


def variant_copy(sets):
    md5 = hashlib.md5
    out = []
    for sh in sets:
        best = [None] * K
        for s in sh:
            h = md5(s)
            for i in range(K):
                hi = h.copy()
                hi.update(SUFFIXES[i])
                d = hi.hexdigest()
                if best[i] is None or d < best[i]:
                    best[i] = d
        out.append(best)
    return out


def variant_memo(sets):
    md5 = hashlib.md5
    memo = {}
    out = []
    for sh in sets:
        best = [None] * K
        for s in sh:
            digs = memo.get(s)
            if digs is None:
                h = md5(s)
                digs = []
                for i in range(K):
                    hi = h.copy()
                    hi.update(SUFFIXES[i])
                    digs.append(hi.hexdigest())
                memo[s] = digs
            for i in range(K):
                d = digs[i]
                if best[i] is None or d < best[i]:
                    best[i] = d
        out.append(best)
    return out


def variant_memo_minxs(sets):
    """memo + per-doc min via builtin min over zipped lists."""
    md5 = hashlib.md5
    memo = {}
    out = []
    for sh in sets:
        rows = []
        for s in sh:
            digs = memo.get(s)
            if digs is None:
                h = md5(s)
                digs = tuple(
                    (lambda hi: (hi.update(suf), hi.hexdigest())[1])(h.copy())
                    for suf in SUFFIXES
                )
                memo[s] = digs
            rows.append(digs)
        out.append([min(c) for c in zip(*rows)])
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_documents_x10_sf0.1"
    from latex_ocr_spark.operators import dedup as D
    from latex_ocr_spark.session import get_spark

    spark = get_spark("proto_minhash")
    rows = (
        D.doc_shingle_arrays(
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
                "doc_id", "text"
            ),
            "text", "doc_id", 3,
        )
        .collect()
    )
    sets = [[s.encode() for s in r.shingles] for r in rows if r.shingles]
    n = sum(len(s) for s in sets)
    uniq = len({s for sh in sets for s in sh})
    print(f"{len(sets)} docs, {n} shingles, {uniq} unique ({uniq/n:.1%})")

    ref = None
    for name, fn in [
        ("naive", variant_naive),
        ("copy", variant_copy),
        ("memo", variant_memo),
        ("memo_minxs", variant_memo_minxs),
    ]:
        t0 = time.time()
        out = fn(sets)
        dt = time.time() - t0
        if ref is None:
            ref = out
        ok = out == ref
        print(f"{name:<12} {dt:6.2f}s single-core  match={ok}")


if __name__ == "__main__":
    main()
