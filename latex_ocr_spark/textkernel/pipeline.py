"""Per-turn extraction kernel: the single pure function the Spark
pipeline vectorizes over Arrow batches.

Chain (mirrors the reference corpus build, SURVEY.md §3.2):
mode classify → HTML strip/unescape (wiki/html) or macro expansion
(latex) → math-region location → scrub → dedup → sort → post_process.

Returned spans are sorted by the cleaned match string (the reference's
corpus writer sorts before persisting, extract_latex.py:117), which
makes ``span_idx`` deterministic under any partitioning.
"""

from __future__ import annotations

from typing import List, NamedTuple

from latex_ocr_spark.textkernel.demacro import MacroExpansionError, expand_macros
from latex_ocr_spark.textkernel.htmlclean import (
    MODE_LATEX,
    MODE_WIKI,
    classify_mode,
    strip_html_noise,
)
from latex_ocr_spark.textkernel.mathfind import find_math
from latex_ocr_spark.textkernel.normalize import post_process


class TurnSpan(NamedTuple):
    span_idx: int
    raw_match: str
    latex_norm: str


def extract_turn(text: str, mode: str = "auto", demacro: bool = True) -> List[TurnSpan]:
    """Extract all math spans from one transcript turn.

    A turn whose macro expansion fails contributes no spans (the
    reference driver skips the whole document on DemacroError,
    arxiv.py:153-156); callers that need failure accounting should call
    :func:`extract_turn_checked` instead.
    """
    return extract_turn_checked(text, mode, demacro)[0]


def extract_turn_checked(
    text: str, mode: str = "auto", demacro: bool = True
) -> "tuple[List[TurnSpan], bool]":
    """Like :func:`extract_turn` but also reports expansion failure."""
    if mode == "auto":
        mode = classify_mode(text)
    if mode == MODE_LATEX:
        if demacro:
            try:
                text = expand_macros(text)
            except MacroExpansionError:
                return [], True
        wiki = False
    else:
        text = strip_html_noise(text)
        wiki = mode == MODE_WIKI
    spans = [
        TurnSpan(i, raw, post_process(raw))
        for i, raw in enumerate(sorted(find_math(text, wiki)))
    ]
    return spans, False
