"""Pure-Python text kernels (no Spark imports).

These implement the extraction semantics of the reference corpus
pipeline (see SURVEY.md §2.6); they run inside Arrow-batched UDFs on
executors and double as the subjects of the reference-parity tests.
"""

from latex_ocr_spark.textkernel.mathfind import find_math, locate_math, scrub_match
from latex_ocr_spark.textkernel.demacro import MacroExpansionError, expand_macros
from latex_ocr_spark.textkernel.normalize import (
    canonicalize_envs,
    collapse_operatorname,
    normalize_formula,
    post_process,
)
from latex_ocr_spark.textkernel.htmlclean import classify_mode, strip_html_noise
from latex_ocr_spark.textkernel.pipeline import extract_turn

__all__ = [
    "MacroExpansionError",
    "canonicalize_envs",
    "classify_mode",
    "collapse_operatorname",
    "expand_macros",
    "extract_turn",
    "find_math",
    "locate_math",
    "normalize_formula",
    "post_process",
    "scrub_match",
    "strip_html_noise",
]
