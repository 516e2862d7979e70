"""Regenerate the golden-parquet oracles in resources/goldens/.

Every golden is computed WITHOUT Spark — plain Python over the same
deterministic inputs the registry queries construct — so the driver's
oracle comparison checks the distributed implementation against an
independent single-process execution of the parity-tested kernels:

- extract_transcripts / corpus_build / tok_bpe_ids / extract_failures /
  eval_pipeline_metrics: textkernel pipeline + BPE over the
  deterministic synthetic transcripts (datagen.transcripts);
- img_preprocess / media_features: the numpy PNG codec + histogram
  kernels over range()-keyed constructed payloads;
- simhash64: pure-Python XXH64 (tools/pyxxh64.py, bit-verified against
  Spark's xxhash64) over every documents table, keyed by md5(text) so
  one golden serves every scale factor.

Run:  python tools/make_goldens.py
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from latex_ocr_spark.paths import GOLDEN_DIR  # noqa: E402 — repo-relative, Spark-free

TESTDATA_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# Java's \s (ASCII-only), which Spark's split() uses — Python's \s is
# unicode-aware and would tokenize differently on exotic whitespace
_JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")


def _tokens(text: str) -> list[str]:
    return [t for t in _JAVA_WS.split(text) if t != ""]


def _write(name: str, table: pa.Table) -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"{name}: {table.num_rows} rows -> {path}")


# ---------------------------------------------------------------------------
# extraction-family goldens (synthetic transcripts, scale-independent)
# ---------------------------------------------------------------------------


def _all_turns(n_convs: int, extra=()):
    from latex_ocr_spark.datagen.transcripts import conv_length, make_turn

    for conv in range(n_convs):
        for turn in range(conv_length(conv)):
            row = make_turn(conv, turn)
            yield row[0], row[1], row[3]  # conv_id, turn_idx, text
    yield from extra


def _extract_all(n_convs: int, extra=()):
    """(spans, failures) exactly as the Arrow UDF splits them."""
    from latex_ocr_spark.textkernel.pipeline import extract_turn_checked

    spans, failures = [], []
    for conv_id, turn_idx, text in _all_turns(n_convs, extra):
        got, failed = extract_turn_checked(text if text is not None else "")
        if failed:
            failures.append((conv_id, turn_idx))
            continue
        for s in got:
            spans.append((conv_id, turn_idx, s.span_idx, s.raw_match, s.latex_norm))
    return spans, failures


def make_extract_transcripts():
    spans, _ = _extract_all(200)
    spans.sort(key=lambda r: (r[0], r[1], r[2]))
    conv_seq, prev, k = [], None, 0
    for r in spans:
        k = k + 1 if r[0] == prev else 1
        prev = r[0]
        conv_seq.append(k)
    cols = list(zip(*spans)) if spans else [[]] * 5
    _write(
        "extract_transcripts",
        pa.table(
            {
                "conv_id": pa.array(cols[0], pa.string()),
                "turn_idx": pa.array(cols[1], pa.int32()),
                "span_idx": pa.array(cols[2], pa.int32()),
                "raw_match": pa.array(cols[3], pa.string()),
                "latex_norm": pa.array(cols[4], pa.string()),
                "conv_seq": pa.array(conv_seq, pa.int32()),
            }
        ),
    )


def make_corpus_build():
    from latex_ocr_spark.textkernel.normalize import normalize_formula_katex

    spans, _ = _extract_all(150)
    gate = re.compile(r"[\\_^(){}]")
    raws = {r[3] for r in spans if gate.search(r[3])}
    formulas = {normalize_formula_katex(r) for r in raws}
    formulas.discard(None)
    ordered = sorted(formulas)  # code-point order == Spark's UTF8 binary order
    _write(
        "corpus_build",
        pa.table(
            {
                "eq_id": pa.array(range(1, len(ordered) + 1), pa.int32()),
                "formula": pa.array(ordered, pa.string()),
            }
        ),
    )


def make_tok_bpe_ids():
    from latex_ocr_spark.textkernel.bpe import default_tokenizer

    tk = default_tokenizer()
    spans, _ = _extract_all(100)
    rows = []
    for conv_id, turn_idx, span_idx, _raw, norm in spans:
        ids = tk.encode(norm)
        if len(ids) <= 512:
            rows.append(
                (conv_id, turn_idx, span_idx, norm, len(ids),
                 json.dumps(ids, separators=(",", ":")))
            )
    cols = list(zip(*rows))
    _write(
        "tok_bpe_ids",
        pa.table(
            {
                "conv_id": pa.array(cols[0], pa.string()),
                "turn_idx": pa.array(cols[1], pa.int32()),
                "span_idx": pa.array(cols[2], pa.int32()),
                "latex_norm": pa.array(cols[3], pa.string()),
                "n_tokens": pa.array(cols[4], pa.int32()),
                "tokens_json": pa.array(cols[5], pa.string()),
            }
        ),
    )


def make_extract_failures():
    poison = [("conv-poison", 0, r"\newcommand{\a(}{x} $\a( + 1$")]
    _, failures = _extract_all(150, extra=poison)
    cols = list(zip(*failures)) if failures else [[], []]
    _write(
        "extract_failures",
        pa.table(
            {
                "conv_id": pa.array(cols[0], pa.string()),
                "turn_idx": pa.array(cols[1], pa.int32()),
            }
        ),
    )


def make_eval_pipeline_metrics():
    """Replicates extract → tokenize → stand-in decode → score → rollup
    (registry.eval_pipeline_metrics) in one process."""
    from latex_ocr_spark.operators.evalmetrics import (
        bleu_counts,  # noqa: F401  (rollup uses per-pair sentence metrics)
        edit_distance,
        sentence_bleu,
        token_accuracy,
    )
    from latex_ocr_spark.textkernel.bpe import default_tokenizer
    from latex_ocr_spark.textkernel.normalize import post_process

    tk = default_tokenizer()
    spans, _ = _extract_all(100)
    bleus, eds, accs, exact = [], [], [], []
    for _c, _t, _s, _raw, truth in spans:
        # stand-in decode is the identity over ids → pred = decode(encode(truth))
        pred = tk.decode(tk.encode(truth))
        p, t = post_process(pred or ""), post_process(truth or "")
        bleus.append(sentence_bleu(tk.detok_tokens(pred or ""), tk.detok_tokens(truth or "")))
        eds.append(edit_distance(p, t) / max(len(t), 1))
        accs.append(
            token_accuracy(
                tk.encode(p, add_specials=False), tk.encode(t, add_specials=False)
            )
        )
        exact.append(int(p == t))
    n = len(spans)
    _write(
        "eval_pipeline_metrics",
        pa.table(
            {
                "avg_bleu": pa.array([round(sum(bleus) / n, 4)], pa.float64()),
                "avg_edit_dist": pa.array([round(sum(eds) / n, 4)], pa.float64()),
                "avg_token_acc": pa.array([round(sum(accs) / n, 4)], pa.float64()),
                "exact_match_rate": pa.array([round(sum(exact) / n, 4)], pa.float64()),
                "n_pairs": pa.array([n], pa.int64()),
            }
        ),
    )


# ---------------------------------------------------------------------------
# image/media goldens (range()-keyed constructed payloads)
# ---------------------------------------------------------------------------

_IMG_SIZES = [(32, 32), (64, 32), (128, 64), (320, 96), (672, 192), (2000, 1200), (16, 16)]


def make_img_preprocess():
    from latex_ocr_spark.operators.images import (
        decode_png_gray,
        encode_png_gray,
        pad_to_divisible,
    )

    ids, ws, hs = [], [], []
    for did in range(200):
        w, h = _IMG_SIZES[did % 5]
        arr = np.full((h, w), 255, dtype=np.uint8)
        arr[: max(h // 3, 1), : max(w // 3, 1)] = 0
        padded = pad_to_divisible(decode_png_gray(encode_png_gray(arr)))
        ids.append(did)
        ws.append(padded.shape[1])
        hs.append(padded.shape[0])
    _write(
        "img_preprocess",
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "proc_w": pa.array(ws, pa.int32()),
                "proc_h": pa.array(hs, pa.int32()),
            }
        ),
    )


def make_media_features(feature_dim: int = 8):
    from latex_ocr_spark.operators.images import decode_png_gray, encode_png_gray

    mids, kinds, nbytes, feats, errs = [], [], [], [], []
    for did in range(120):
        if did % 3 == 0:
            kind, mime = "image", "image/png"
            payload = encode_png_gray(np.full((32, 32), (did * 37) % 256, dtype=np.uint8))
        elif did % 3 == 1:
            kind, mime, payload = "audio", "audio/wav", b"RIFF"
        else:
            kind, mime, payload = "video", "video/mp4", b"ftyp"
        mids.append(did)
        kinds.append(kind)
        nbytes.append(len(payload))
        if kind == "image":
            arr = decode_png_gray(payload)
            hist, _ = np.histogram(arr, bins=feature_dim, range=(0, 255))
            total = max(int(hist.sum()), 1)
            feats.append(
                json.dumps(
                    [round(float(x) / total, 6) for x in hist], separators=(",", ":")
                )
            )
            errs.append(None)
        else:
            feats.append(None)
            errs.append(
                f"NotImplementedError: no codec for kind={kind} mime={mime} in this container"
            )
    _write(
        "media_features",
        pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "n_bytes": pa.array(nbytes, pa.int64()),
                "feature_json": pa.array(feats, pa.string()),
                "decode_error": pa.array(errs, pa.string()),
            }
        ),
    )


def make_x12_sympy_convert():
    from latex_ocr_spark.operators.symbolic import convert_checked

    ids, strs, errs = [], [], []
    for i in range(500):
        if i % 5 == 0:
            latex = "x_{%d}^2 + \\frac{%d}{2}" % (i, i)
        elif i % 5 == 1:
            latex = "\\sqrt{a_%d + 1} \\cdot \\alpha" % i
        elif i % 5 == 2:
            latex = "\\left( y + %d \\right)^{3}" % i
        elif i % 5 == 3:
            latex = "\\int_0^%d f" % i
        else:
            latex = "operatorname*{sin}(t_%d)" % i
        # subset converter pinned — the registry query pins the same,
        # so parity never depends on optional full-grammar parsers
        s, e = convert_checked(latex, use_full_parser=False)
        ids.append(i)
        strs.append(s)
        errs.append(e)
    _write(
        "x12_sympy_convert",
        pa.table(
            {
                "span_id": pa.array(ids, pa.int64()),
                "sympy_str": pa.array(strs, pa.string()),
                "convert_error": pa.array(errs, pa.string()),
            }
        ),
    )


def make_s4_arxiv_tarballs():
    import tempfile

    from latex_ocr_spark.datagen.tarballs import write_fixture_tarballs
    from latex_ocr_spark.sources.archives import paper_from_blob

    rows = []
    with tempfile.TemporaryDirectory() as d:
        for path in write_fixture_tarballs(d):
            pid, n, tex, err = paper_from_blob(path, open(path, "rb").read())
            rows.append(
                (
                    pid,
                    n,
                    err,
                    hashlib.md5(tex.encode("utf-8")).hexdigest() if tex is not None else None,
                    len(tex) if tex is not None else None,
                )
            )
    cols = list(zip(*rows))
    _write(
        "s4_arxiv_tarballs",
        pa.table(
            {
                "paper_id": pa.array(cols[0], pa.string()),
                "n_tex_files": pa.array(cols[1], pa.int32()),
                "demacro_error": pa.array(cols[2], pa.string()),
                "tex_md5": pa.array(cols[3], pa.string()),
                "tex_len": pa.array(cols[4], pa.int32()),
            }
        ),
    )


# ---------------------------------------------------------------------------
# simhash golden over the real documents tables (content-keyed)
# ---------------------------------------------------------------------------


def _simhash64_py(text: str) -> int | None:
    from tools.pyxxh64 import xxh64

    toks = _tokens(text)
    if not toks:
        return None  # zero-token docs are dropped by the operator
    votes = [0] * 64
    for tok in toks:
        h = xxh64(tok.encode("utf-8"))
        for b in range(64):
            votes[b] += 1 if ((h >> b) & 1) == 1 else -1
    u = sum(1 << b for b in range(64) if votes[b] > 0)
    return u - (1 << 64) if u >= (1 << 63) else u


def make_simhash64():
    import duckdb

    seen: dict[str, int] = {}
    con = duckdb.connect()
    for sf in TESTDATA_SFS:
        for (text,) in con.execute(
            f"SELECT DISTINCT text FROM read_parquet('{sf}/documents.parquet')"
        ).fetchall():
            key = hashlib.md5(text.encode("utf-8")).hexdigest()
            if key not in seen:
                sh = _simhash64_py(text)
                if sh is not None:
                    seen[key] = sh
    # sort by key: DuckDB's DISTINCT emits rows in nondeterministic
    # order, which made the golden's bytes drift run-to-run (content
    # was always identical — the oracle joins on text_md5 — but a
    # regen should be byte-stable so drift is detectable at a glance)
    items = sorted(seen.items())
    _write(
        "simhash64",
        pa.table(
            {
                "text_md5": pa.array([k for k, _ in items], pa.string()),
                "simhash": pa.array([v for _, v in items], pa.int64()),
            }
        ),
    )


ALL = [
    make_extract_transcripts,
    make_corpus_build,
    make_tok_bpe_ids,
    make_extract_failures,
    make_eval_pipeline_metrics,
    make_img_preprocess,
    make_media_features,
    make_s4_arxiv_tarballs,
    make_x12_sympy_convert,
    make_simhash64,
]

if __name__ == "__main__":
    only = set(sys.argv[1:])
    for fn in ALL:
        name = fn.__name__.removeprefix("make_")
        if not only or name in only:
            fn()
