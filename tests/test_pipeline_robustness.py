"""Adversarial inputs through the *Spark* pipeline (Arrow boundary):
unicode, control chars, megabyte turns, pathological regex inputs —
must neither crash nor diverge from the pure kernel."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import pandas as pd

from latex_ocr_spark.operators.extract import extract_spans
from latex_ocr_spark.textkernel.pipeline import extract_turn

NASTY = [
    "plain $x+1$ ok",
    "emoji 🎉 $y_2$ end",
    "unicode math $α + β$ done",
    "\x00 null byte $z$ tail",          # NUL inside text
    "tab\tand\rcr $w$ mix",
    "a" * 1_000_000 + " $big$",          # 1 MB turn
    "$" * 2001,                           # dollar flood
    "\\" * 999,                           # backslash flood
    "deep " + "{" * 200 + "x" + "}" * 200 + " $q$",
    "combining ẃéîrd $t_9$",
    "surrogate-ish \ud800 $u$" if False else "high cp \U0001f600 $u$",
    r"\begin{align}" + "x&=y\\\\" * 300 + r"\end{align}",
    "mixed $a$ \\( b \\) \\[ c \\] \\begin{math}d\\end{math}",
    "",
]


def test_nasty_inputs_match_kernel(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(NASTY))],
            "turn_idx": list(range(len(NASTY))),
            "text": NASTY,
        }
    )
    df = spark.createDataFrame(pdf)
    got = {}
    for r in extract_spans(df).collect():
        got.setdefault((r.conv_id, r.turn_idx), []).append(
            (r.span_idx, r.raw_match, r.latex_norm)
        )
    for i, text in enumerate(NASTY):
        expected = [(s.span_idx, s.raw_match, s.latex_norm) for s in extract_turn(text)]
        assert sorted(got.get((f"c{i}", i), [])) == expected, repr(text[:60])
