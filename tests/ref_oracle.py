"""Test-time golden oracle: load the *reference* implementation's pure
functions straight from the read-only checkout at /root/reference and
use their outputs as expected values.

Nothing here ships in the engine — the reference code is only executed
during pytest to freeze expected behavior.  Modules with heavyweight
deps (torch/cv2/PIL) are not importable in this container, so for
``post_process`` we surgically extract just that function's source via
ast and exec it in an isolated namespace.
"""

from __future__ import annotations

import ast
import importlib.util
import sys
import types
import warnings
from functools import lru_cache

REF_ROOT = "/root/reference/pix2tex"


def _load_by_path(modname: str, path: str):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@lru_cache(maxsize=None)
def ref_extract_latex():
    return _load_by_path("_ref_extract_latex", f"{REF_ROOT}/dataset/extract_latex.py")


@lru_cache(maxsize=None)
def ref_demacro():
    # demacro.py does `from pix2tex.dataset.extract_latex import remove_labels`;
    # satisfy it with stub package modules pointing at the path-loaded module.
    if "pix2tex" not in sys.modules:
        sys.modules["pix2tex"] = types.ModuleType("pix2tex")
        sys.modules["pix2tex.dataset"] = types.ModuleType("pix2tex.dataset")
    sys.modules["pix2tex.dataset.extract_latex"] = ref_extract_latex()
    return _load_by_path("_ref_demacro", f"{REF_ROOT}/dataset/demacro.py")


@lru_cache(maxsize=None)
def ref_post_process():
    """Extract utils.post_process (utils/utils.py:138-160) without
    importing its torch/cv2-heavy module."""
    src = open(f"{REF_ROOT}/utils/utils.py").read()
    # the reference source contains non-raw '\W' string literals —
    # parse under a local filter so -W error runs don't die on *their*
    # SyntaxWarning/DeprecationWarning
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tree = ast.parse(src)
    fn = next(
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "post_process"
    )
    ns = {"re": __import__("re")}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), "<ref>", "exec"), ns)
    return ns["post_process"]


@lru_cache(maxsize=None)
def ref_read_tex_files():
    """Extract dataset/arxiv.py:read_tex_files without importing its
    module (tqdm/torch-adjacent imports are absent in this container).
    The extracted function gets the reference's own pydemacro."""
    src = open(f"{REF_ROOT}/dataset/arxiv.py").read()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tree = ast.parse(src)
    fn = next(
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "read_tex_files"
    )
    ns = {
        m: __import__(m)
        for m in ("tempfile", "tarfile", "glob", "os", "subprocess", "logging")
    }
    ns["pydemacro"] = ref_demacro().pydemacro
    exec(compile(ast.Module(body=[fn], type_ignores=[]), "<ref>", "exec"), ns)
    return ns["read_tex_files"]


@lru_cache(maxsize=None)
def ref_token2str_source_check() -> str:
    """Raw source of token2str for the detokenizer contract test."""
    return open(f"{REF_ROOT}/utils/utils.py").read()
