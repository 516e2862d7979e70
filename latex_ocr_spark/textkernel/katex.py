r"""KaTeX-style LaTeX normalizer (T11).

Re-creates, in pure Python, the reference's normalization step — a
vendored-KaTeX parse followed by an AST→LaTeX re-render with canonical
token spacing (preprocess_latex.js; invoked per corpus line by
preprocess_formulas.py:69-70).  This module is written from the
observed *behavior* of that step (node is available in the test
container, so tests/test_katex_parity.py replays the reference JS on
the fixture corpus and compares outputs byte-for-byte); the code
itself is an independent implementation.

Shape of the output grammar (probed from the reference):
- every symbol token is space-separated: ``\frac { 1 } { 2 }``;
- a braced script keeps one space (``x ^ { 2 a }``); an unbraced
  script is wrapped with *two* spaces (``x ^  { 2 }``);
- sub always renders before sup;
- named operators re-render as ``\operatorname { s i n }`` /
  ``\operatorname* { l i m }`` (limits variant);
- ``aligned``/``matrix``/``array`` all re-render as ``\begin{array}``
  with an explicit column spec, cells wrapped in groups, aligned
  inserting an empty leading group in odd columns, and a trailing
  ``\\`` after every row;
- parse failures yield an empty string (the reference prints an empty
  line and the >5-token gate downstream drops it).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple


class KatexError(Exception):
    """Any lex/parse failure — callers map this to an empty output."""


# ---------------------------------------------------------------------------
# symbol / function tables
# ---------------------------------------------------------------------------

_GREEK = (
    "alpha beta gamma delta epsilon varepsilon zeta eta theta vartheta iota "
    "kappa lambda mu nu xi omicron pi varpi rho varrho sigma varsigma tau "
    "upsilon phi varphi chi psi omega Gamma Delta Theta Lambda Xi Pi Sigma "
    "Upsilon Phi Psi Omega"
)

#: control words that are plain symbols: render as "\name "
SYMBOL_WORDS = set(
    (
        _GREEK + " "
        "leq geq neq ne le ge ll gg sim simeq approx equiv cong propto prec succ "
        "preceq succeq subset supset subseteq supseteq in ni notin mid parallel "
        "perp vdash dashv models asymp bowtie smile frown doteq "
        "pm mp times div ast star circ bullet cdot cap cup uplus sqcap sqcup "
        "vee wedge setminus wr diamond bigtriangleup bigtriangledown "
        "triangleleft triangleright oplus ominus otimes oslash odot bigcirc "
        "dagger ddagger amalg "
        "leftarrow rightarrow to gets leftrightarrow Leftarrow Rightarrow "
        "Leftrightarrow mapsto hookleftarrow hookrightarrow nearrow searrow "
        "swarrow nwarrow uparrow downarrow updownarrow Uparrow Downarrow "
        "Updownarrow longleftarrow longrightarrow longleftrightarrow "
        "Longleftarrow Longrightarrow Longleftrightarrow longmapsto "
        "rightharpoonup rightharpoondown leftharpoonup leftharpoondown "
        "rightleftharpoons "
        "infty partial nabla forall neg lnot emptyset varnothing "
        "aleph hbar imath jmath ell wp Re Im prime backslash top bot angle "
        "triangle surd diamondsuit heartsuit clubsuit spadesuit flat natural "
        "sharp vdots ddots cdots ldots dots "
        "colon lbrace rbrace lbrack rbrack langle rangle lfloor rfloor "
        "lceil rceil vert Vert lvert rvert lVert rVert "
        "not atop circledast S checkmark"
    ).split()
)
# words the vendored KaTeX does NOT know fall through to the
# unknown-mathord path: exists, iff, implies, dotsb..dotso, degree,
# copyright, P, bm, boldsymbol, mathnormal, mathring, negthinspace,
# textit — audited one-by-one against node (tests/test_katex_parity)

#: control symbols (backslash + punctuation) that are plain symbols
SYMBOL_CONTROL = set("\\# \\& \\$ \\_ \\{ \\} \\| \\^ \\~ \\%".split(" "))

#: control words classified mathord with a multi-char value — these
#: print per-character inside a mathrm font context (observed: lower
#: greek and \imath/\jmath split; capitals, relations, \infty... don't)
MATHORD_MULTICHAR = set(
    ("alpha beta gamma delta epsilon varepsilon zeta eta theta vartheta "
     "iota kappa lambda mu nu xi omicron pi varpi rho varrho sigma varsigma "
     "tau upsilon phi varphi chi psi omega imath jmath").split()
)

SPACING_WORDS = {"quad", "qquad", "enspace", "thinspace"}
SPACING_CONTROL = {"\\,", "\\;", "\\:", "\\!", "\\ ", "\\>"}

#: \sin-family named operators: name -> limits (True => \operatorname*)
NAMED_OPS = {
    **{n: False for n in (
        "sin cos tan cot sec csc sinh cosh tanh coth arcsin arccos arctan "
        "arg ln log exp deg dim hom ker lg"
    ).split()},
    **{n: True for n in "lim limsup liminf max min sup inf det gcd Pr".split()},
}

#: big operators rendered as their own symbol (op.symbol = true)
SYMBOL_OPS = set(
    "int oint iint iiint sum prod coprod bigcap bigcup bigvee bigwedge "
    "bigoplus bigotimes bigodot biguplus bigsqcup smallint".split()
)

ACCENTS = set(
    "hat tilde bar vec dot ddot acute grave check breve "
    "widetilde widehat overrightarrow overleftarrow".split()
)

FONT_WORDS = set("mathrm mathbf mathit mathcal mathfrak mathscr "
                 "mathsf mathtt textbf".split())
TEXT_WORDS = {"text", "mbox", "hbox"}
STYLING_WORDS = {"displaystyle", "textstyle", "scriptstyle", "scriptscriptstyle"}
SIZING_WORDS = {"rm", "it", "bf", "sf", "tt", "cal", "textrm", "tiny",
                "scriptsize", "footnotesize", "small", "normalsize", "large",
                "Large", "LARGE", "huge", "Huge"}
DELIMSIZING = set("big Big bigg Bigg bigl Bigl biggl Biggl bigr Bigr biggr "
                  "Biggr bigm Bigm biggm Biggm".split())

DELIMS = set(list("()[]|/.") + [
    "\\{", "\\}", "\\|", "langle", "rangle", "lfloor", "rfloor", "lceil",
    "rceil", "vert", "Vert", "lvert", "rvert", "lVert", "rVert", "backslash",
    "uparrow", "downarrow", "updownarrow", "Uparrow", "Downarrow",
    "Updownarrow", "lbrace", "rbrace", "lbrack", "rbrack",
])

ENVIRONMENTS = {"array", "matrix", "aligned", "cases", "pmatrix", "bmatrix",
                "Bmatrix", "vmatrix", "Vmatrix", "darray", "dcases"}

_TOKEN_RE = re.compile(r"\\[a-zA-Z]+|\\.|\n|[^\\]", re.S)


def _lex(s: str) -> List[str]:
    return _TOKEN_RE.findall(s)


# AST nodes are plain dicts: {"t": type, ...}


class _Parser:
    """Recursive-descent parser for the math subset the renderer needs."""

    def __init__(self, tokens: List[str], text_mode: bool = False):
        self.toks = tokens
        self.i = 0
        self.text_mode = text_mode
        self.cur_breakers: Tuple[str, ...] = ()

    # -- token helpers ----------------------------------------------------

    def peek(self) -> Optional[str]:
        while self.i < len(self.toks) and not self.text_mode and self.toks[self.i] in (" ", "\t", "\n"):
            self.i += 1
        return self.toks[self.i] if self.i < len(self.toks) else None

    def pop(self) -> str:
        t = self.peek()
        if t is None:
            raise KatexError("unexpected end of input")
        self.i += 1
        return t

    # -- expressions -------------------------------------------------------

    def parse_expression(
        self, breakers: Tuple[str, ...] = (), break_on_infix: bool = False
    ) -> List[dict]:
        prev_breakers = self.cur_breakers
        self.cur_breakers = breakers
        try:
            return self._parse_expression(breakers, break_on_infix)
        finally:
            self.cur_breakers = prev_breakers

    def _parse_expression(
        self, breakers: Tuple[str, ...], break_on_infix: bool
    ) -> List[dict]:
        out: List[dict] = []
        while True:
            t = self.peek()
            if t is None or t in breakers or t in ("}",):
                return out
            if t == "\\end" or t == "\\right":
                return out
            if break_on_infix and t in ("\\over", "\\choose"):
                return out
            if t in ("\\over", "\\choose"):
                # TeX infix: split the expression parsed so far from
                # the rest of the group into a genfrac; a second infix
                # in the same group is an error (KaTeX behavior)
                self.pop()
                denom = self.parse_expression(breakers, break_on_infix=True)
                if self.peek() in ("\\over", "\\choose"):
                    raise KatexError("only one infix operator per group")
                return [
                    {
                        "t": "genfrac",
                        "bar": t == "\\over",
                        "numer": {"t": "ordgroup", "body": out},
                        "denom": {"t": "ordgroup", "body": denom},
                    }
                ]
            out.append(self.parse_atom_with_scripts())

    def parse_atom_with_scripts(self) -> dict:
        atom = self.parse_atom()
        sub = sup = None
        primes: List[dict] = []
        while True:
            t = self.peek()
            if t == "'":
                self.pop()
                primes.append({"t": "sym", "v": "\\prime"})
                continue
            if t == "^" and sup is None and not primes:
                self.pop()
                sup = self.parse_script()
                continue
            if t == "_" and sub is None:
                self.pop()
                sub = self.parse_script()
                continue
            break
        if primes:
            sup = {"t": "ordgroup", "body": primes}
        if sub is None and sup is None:
            return atom
        return {"t": "supsub", "base": atom, "sub": sub, "sup": sup}

    def parse_script(self) -> dict:
        # braced scripts become ordgroups via parse_atom; single tokens
        # come back as-is — the renderer distinguishes them
        return self.parse_atom()

    def parse_required_group(self) -> dict:
        """An argument: braced group or a single atom."""
        return self.parse_atom()

    # -- atoms --------------------------------------------------------------

    def parse_atom(self) -> dict:
        t = self.pop()
        if t == "{":
            body = self.parse_expression()
            if self.peek() != "}":
                raise KatexError("expected }")
            self.pop()
            return {"t": "ordgroup", "body": body}
        if t == "}":
            raise KatexError("unexpected }")
        if t == "~":
            return {"t": "spacing", "v": "~"}
        if t in ("&", "^", "_"):
            raise KatexError(f"misplaced {t}")
        if not t.startswith("\\"):
            if self.text_mode and t == " ":
                return {"t": "spacing", "v": " "}
            return {"t": "sym", "v": t}
        return self.parse_control(t)

    def parse_control(self, t: str) -> dict:
        name = t[1:]
        if t in SPACING_CONTROL:
            return {"t": "spacing", "v": " " if t == "\\>" else t}
        if t in SYMBOL_CONTROL or t == "\\\\" and self.text_mode:
            return {"t": "sym", "v": t}
        if name in SPACING_WORDS:
            return {"t": "spacing", "v": t}
        if name in SYMBOL_WORDS:
            return {"t": "sym", "v": t, "m": name in MATHORD_MULTICHAR}
        if name in NAMED_OPS:
            return {"t": "op", "symbol": False, "name": name, "limits": NAMED_OPS[name]}
        if name in SYMBOL_OPS:
            return {"t": "op", "symbol": True, "v": t}
        # NOTE: \operatorname is NOT special-cased — the vendored KaTeX
        # predates it, so it falls through to the unknown-symbol path
        # (observed: `\operatorname*{ess}` → `\operatorname * { e s s }`)
        if name in ("frac", "dfrac", "tfrac", "cfrac"):
            numer = self.parse_required_group()
            denom = self.parse_required_group()
            return {"t": "genfrac", "bar": True, "numer": numer, "denom": denom}
        if name in ("binom", "dbinom", "tbinom"):
            numer = self.parse_required_group()
            denom = self.parse_required_group()
            return {"t": "genfrac", "bar": False, "numer": numer, "denom": denom}
        if name == "sqrt":
            index = None
            if self.peek() == "[":
                self.pop()
                index = self.parse_expression(breakers=("]",))
                if self.peek() != "]":
                    raise KatexError("expected ]")
                self.pop()
            body = self.parse_required_group()
            return {"t": "sqrt", "index": index, "body": body}
        if name in ACCENTS:
            base = self.parse_required_group()
            return {"t": "accent", "accent": t, "base": base}
        if name in ("overline", "underline", "overbrace", "underbrace"):
            body = self.parse_required_group()
            kind = name if name in ("overline", "underline") else name
            return {"t": kind if name in ("overline", "underline") else "accent2",
                    "accent": t, "body": body}
        if name in FONT_WORDS:
            body = self.parse_required_group()
            return {"t": "font", "font": name, "body": body}
        if name in TEXT_WORDS:
            body = self.parse_text_arg()
            return {"t": "text", "body": body}
        if name in STYLING_WORDS:
            rest = self.parse_expression(self.cur_breakers, break_on_infix=True)
            return {"t": "styling", "original": t, "body": rest}
        if name in SIZING_WORDS:
            # unlike styling, sizing keeps a following infix inside its
            # own body (observed: `\rm x a \over b` → \mathrm{\frac..})
            rest = self.parse_expression(self.cur_breakers)
            return {"t": "sizing", "original": t, "body": rest}
        if name in DELIMSIZING:
            d = self.pop()
            if d.startswith("\\") and d[1:] in DELIMS:
                pass
            elif d in DELIMS or d.startswith("\\"):
                pass
            else:
                raise KatexError(f"bad delimiter after {t}")
            return {"t": "delimsizing", "func": t, "v": d}
        if name == "left":
            left = self.pop()
            body = self.parse_expression()
            if self.peek() != "\\right":
                raise KatexError("missing \\right")
            self.pop()
            right = self.pop()
            return {"t": "leftright", "left": left, "right": right, "body": body}
        if name == "begin":
            return self.parse_environment()
        if name in ("phantom", "hphantom", "vphantom"):
            body = self.parse_required_group()
            return {"t": "phantom", "body": body}
        if name in ("llap", "rlap"):
            body = self.parse_required_group()
            return {"t": name, "body": body}
        # the vendored KaTeX was modified to pass unknown control words
        # through as ordinary symbols (observed: \dup, \stackrel, \atop
        # all render literally instead of erroring); they classify as
        # mathord, so they split per-char inside mathrm
        return {"t": "sym", "v": t, "m": True}

    def parse_text_arg(self) -> List[dict]:
        """A \\text{...} argument: spaces are significant inside."""
        if self.peek() != "{":
            # single-token text arg
            t = self.pop()
            return [{"t": "sym", "v": t}]
        self.pop()
        body: List[dict] = []
        while True:
            if self.i >= len(self.toks):
                raise KatexError("unterminated text group")
            t = self.toks[self.i]
            self.i += 1
            if t == "}":
                return body
            if t == " ":
                body.append({"t": "spacing", "v": " "})
            elif t.startswith("\\"):
                body.append({"t": "sym", "v": t})
            else:
                body.append({"t": "sym", "v": t})

    # -- environments -------------------------------------------------------

    def parse_environment(self) -> dict:
        if self.pop() != "{":
            raise KatexError("expected { after \\begin")
        env = ""
        while self.peek() != "}":
            env += self.pop()
        self.pop()
        if env not in ENVIRONMENTS:
            raise KatexError(f"unsupported environment {env}")

        cols: Optional[List[str]] = None
        if env in ("array", "darray"):
            if self.pop() != "{":
                raise KatexError("array needs a column spec")
            cols = []
            while self.peek() != "}":
                c = self.pop()
                if c in ("l", "c", "r"):
                    cols.append(c)
            self.pop()

        rows: List[List[dict]] = []
        row: List[dict] = []
        cell_idx = 0

        def close_cell():
            nonlocal cell_idx
            body = self.parse_expression(breakers=("&", "\\\\", "\\cr"))
            if env == "aligned" and cell_idx % 2 == 1:
                body = [{"t": "ordgroup", "body": []}] + body
            row.append({"t": "ordgroup", "body": body})
            cell_idx += 1

        while True:
            close_cell()
            t = self.peek()
            if t == "&":
                self.pop()
                continue
            if t == "\\\\" or t == "\\cr":
                self.pop()
                rows.append(row)
                row = []
                cell_idx = 0
                continue
            if t == "\\end":
                self.pop()
                if self.pop() != "{":
                    raise KatexError("expected { after \\end")
                endname = ""
                while self.peek() != "}":
                    endname += self.pop()
                self.pop()
                if endname != env:
                    raise KatexError("environment mismatch")
                rows.append(row)
                break
            raise KatexError(f"unexpected token in {env}: {t}")

        if env == "aligned":
            ncols = max(len(r) for r in rows)
            cols = ["r", "l"] * ((ncols + 1) // 2)
            cols = cols[:ncols]
        node = {"t": "array", "cols": cols, "rows": rows}
        wrap = {
            "pmatrix": ("(", ")"), "bmatrix": ("[", "]"),
            "Bmatrix": ("\\{", "\\}"), "vmatrix": ("|", "|"),
            "Vmatrix": ("\\|", "\\|"), "cases": ("\\{", "."), "dcases": ("\\{", "."),
        }
        if env in wrap:
            left, right = wrap[env]
            if env in ("cases", "dcases"):
                node["cols"] = ["l", "l"]
            return {"t": "leftright", "left": left, "right": right, "body": [node]}
        return node


# ---------------------------------------------------------------------------
# renderer (mirrors the observed groupTypes behavior)
# ---------------------------------------------------------------------------


class _Renderer:
    def __init__(self):
        self.out: List[str] = []

    def s(self) -> str:
        return "".join(self.out)

    def expr(self, nodes: List[dict], font: Optional[str] = None) -> None:
        for n in nodes:
            self.group(n, font)

    def group(self, n: dict, font: Optional[str] = None) -> None:
        t = n["t"]
        if t == "sym":
            if font == "mathrm" and len(n["v"]) > 1 and n.get("m"):
                for ch in n["v"]:
                    # the reference's JS writes `"\;"` which is just ";"
                    self.out.append((ch + " ") if ch != " " else (ch + "; "))
            else:
                self.out.append(n["v"] + " ")
        elif t == "spacing":
            self.out.append("~ " if n["v"] == " " else n["v"] + " ")
        elif t == "ordgroup":
            self.out.append("{ ")
            self.expr(n["body"], font)
            self.out.append("} ")
        elif t == "supsub":
            self.group(n["base"], font)
            if n["sub"] is not None:
                self.out.append("_ ")
                self._script(n["sub"], font)
            if n["sup"] is not None:
                self.out.append("^ ")
                self._script(n["sup"], font)
        elif t == "genfrac":
            self.out.append("\\frac " if n["bar"] else "\\binom ")
            self.group(n["numer"], font)
            self.group(n["denom"], font)
        elif t == "sqrt":
            if n["index"] is not None:
                self.out.append("\\sqrt [ ")
                self.expr(n["index"], font)
                self.out.append("] ")
            else:
                self.out.append("\\sqrt ")
            self.group(n["body"], font)
        elif t == "leftright":
            self.out.append("\\left" + n["left"] + " ")
            self.expr(n["body"], font)
            self.out.append("\\right" + n["right"] + " ")
        elif t == "accent":
            if n["base"]["t"] != "ordgroup":
                self.out.append(n["accent"] + " { ")
                self.group(n["base"], font)
                self.out.append("} ")
            else:
                self.out.append(n["accent"] + " ")
                self.group(n["base"], font)
        elif t == "accent2":  # overbrace/underbrace
            self.out.append(n["accent"] + " ")
            self.group(n["body"], font)
        elif t in ("overline", "underline"):
            self.out.append("\\" + t + " { ")
            self.group(n["body"], font)
            self.out.append("} ")
        elif t == "op":
            if n.get("symbol"):
                self.out.append(n["v"] + " ")
            else:
                self.out.append("\\operatorname* { " if n["limits"] else "\\operatorname { ")
                for ch in n["name"]:
                    self.out.append(ch + " ")
                self.out.append("} ")
        elif t == "font":
            fname = n["font"]
            if fname in ("mbox", "hbox"):
                fname = "mathrm"
            self.out.append("\\" + fname + " ")
            self.group(n["body"], fname)
        elif t == "text":
            self.out.append("\\mathrm { ")
            self.expr(n["body"], font)
            self.out.append("} ")
        elif t == "styling":
            self.out.append(" " + n["original"] + " ")
            self.expr(n["body"], font)
        elif t == "sizing":
            if n["original"] == "\\rm":
                self.out.append("\\mathrm { ")
                self.expr(n["body"], "mathrm")
                self.out.append("} ")
            else:
                self.out.append(" " + n["original"] + " ")
                self.expr(n["body"], font)
        elif t == "delimsizing":
            self.out.append(n["func"] + " " + n["v"] + " ")
        elif t == "array":
            self.out.append("\\begin{array} { ")
            if n["cols"]:
                for c in n["cols"]:
                    self.out.append(c + " ")
            else:
                for _ in n["rows"][0]:
                    self.out.append("l ")
            self.out.append("} ")
            for row in n["rows"]:
                if not row or not row[0]["body"]:
                    continue
                for cell in row:
                    self.group(cell, font)
                    self.out.append("& ")
                joined = "".join(self.out)
                self.out = [joined[:-2] + "\\\\ "]
            self.out.append("\\end{array} ")
        elif t == "phantom":
            self.out.append("\\phantom { ")
            body = n["body"]
            if body["t"] == "ordgroup":
                self.expr(body["body"], font)
            else:
                self.group(body, font)
            self.out.append("} ")
        elif t in ("llap", "rlap"):
            self.out.append("\\" + t + " ")
            self.group(n["body"], font)
        else:  # pragma: no cover
            raise KatexError(f"unrenderable node {t}")

    def _script(self, node: dict, font: Optional[str]) -> None:
        if node["t"] != "ordgroup":
            self.out.append(" { ")
            self.group(node, font)
            self.out.append("} ")
        else:
            self.group(node, font)


# ---------------------------------------------------------------------------
# driver-level preprocessing (string surgery the JS does around the parse)
# ---------------------------------------------------------------------------

_RE_BSL_GT = re.compile(r"\\>")
_RE_LABEL_RAW = re.compile(r"\\label{.*?}")
_RE_DBL_BSL = re.compile(r"\\\\")
_RE_LABEL_SPACED = re.compile(r"\\label { .*? }")


def _driver_pre(line: str) -> str:
    if line.startswith("%"):
        line = line[1:]
    line = line.split("%")[0]
    line = line.replace("\\~", " ")
    for _ in range(300):
        new = _RE_BSL_GT.sub(" ", line, count=1)
        new = new.replace("$", " ", 1)
        new = _RE_LABEL_RAW.sub("", new, count=1)
        if new == line:
            break
        line = new
    if all(k not in line for k in ("matrix", "cases", "array", "begin")):
        for _ in range(300):
            new = _RE_DBL_BSL.sub(r"\\,", line, count=1)
            if new == line:
                break
            line = new
    line = line + " "
    for _ in range(300):
        new = line.replace("{\\rm", "\\mathrm{", 1)
        new = new.replace("{ \\rm", "\\mathrm{", 1)
        new = new.replace("\\rm{", "\\mathrm{", 1)
        if new == line:
            break
        line = new
    return line


def katex_normalize(line: str) -> str:
    """Normalize one formula; '' on parse failure (reference behavior)."""
    try:
        pre = _driver_pre(line)
        parser = _Parser(_lex(pre))
        tree = parser.parse_expression()
        if parser.peek() is not None:
            raise KatexError(f"trailing input at {parser.peek()!r}")
        r = _Renderer()
        r.expr(tree)
        out = r.s()
        out = _RE_LABEL_SPACED.sub("", out, count=1)
        return out
    except (KatexError, RecursionError):
        return ""
