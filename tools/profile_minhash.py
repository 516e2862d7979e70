#!/usr/bin/env python
"""Decompose the per-document profile cost (guide §1): tokenize+shingle
vs the 8-hash md5 MinHash family, at sf0.1 and a hashlib prototype
offline.  NOT part of the frozen bench."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from latex_ocr_spark.operators import dedup as D
    from latex_ocr_spark.session import get_spark

    spark = get_spark("profile_minhash")
    spark.range(1000).count()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for name, fn in [
        ("shingle arrays only", lambda: D.doc_shingle_arrays(docs, "text", "doc_id", 3)),
        ("arrays + size", lambda: D.minhash_signatures(
            docs, 0, "text", "doc_id", 3, include_size=True, include_shingles=True)),
        ("profile (8 sigs)", lambda: D.minhash_signatures(
            docs, 8, "text", "doc_id", 3, include_size=True, include_shingles=True)),
    ]:
        best = None
        for _ in range(3):
            t0 = time.time()
            noop(fn())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:<24} best {best:6.2f}s", flush=True)

    # offline hashlib prototype over the same shingle sets
    rows = D.doc_shingle_arrays(docs, "text", "doc_id", 3).collect()
    sets = [r.shingles for r in rows if r.shingles]
    n_sh = sum(len(s) for s in sets)
    import hashlib

    t0 = time.time()
    out = []
    for sh in sets:
        sigs = []
        for i in range(8):
            suf = f"#{i}".encode()
            sigs.append(min(hashlib.md5(s.encode() + suf).hexdigest() for s in sh))
        out.append(sigs)
    dt = time.time() - t0
    print(f"hashlib single-core: {dt:.2f}s for {len(sets)} docs / {n_sh} shingles "
          f"({8*n_sh/dt/1e6:.2f}M md5/s)")


if __name__ == "__main__":
    main()
