r"""Turn-text templates covering every math-location pattern and every
cleaning branch of the reference extractor (FIXTURES.md §1).

Each template is a plain string; the generator interpolates ``{i}``
(a per-turn integer) so equal templates in different turns still yield
distinct spans.  Keep templates raw-string literals so backslashes read
exactly as LaTeX.
"""

from __future__ import annotations

# --- plain math carriers -----------------------------------------------------
MATH_TEMPLATES = [
    # dollar family, incl. $$ display and \$ escapes
    r"The energy is $E_{i} = m c^2 + {i}$ as shown.",
    r"Costs are \$5 but the identity $$\int_0^{i} x\,dx = \frac{{i}^2}{2}$$ holds.",
    r"Twin spans $a_{i}+b$ and $a_{i}+b$ repeat in one turn, plus $z_{i}$.",
    r"Adjacent dollars trap: $$$x_{i}$$$ should not match greedily.",
    # \( \) and \[ \]
    r"Inline \(\alpha_{i} \leq \beta\) and display \[\sum_{k=0}^{i} k = \frac{{i}({i}+1)}{2}\] mix.",
    r"Escaped close \(f(x) = x\^{i}\) then \[g(y)\neq y_{i}\] done.",
    # equation/math/displaymath environments
    r"See \begin{equation}x^{i} - 1 = 0\end{equation} and \begin{equation*}y_{i}>0\end{equation*}.",
    r"Short \begin{math}p_{i} \cdot q\end{math} plus \begin{displaymath}r^{i}/s\end{displaymath}.",
    # align family
    "Derivation: \\begin{align}a_{i} &= b + c \\\\ d &= e_{i}\\end{align} qed.",
    "Split env \\begin{split}u_{i} &= v \\\\ w &= z\\end{split} and gather \\begin{gather}m_{i}=n\\end{gather}.",
    r"Aligned \begin{alignedat}{2}x_{i}&=1&y&=2\end{alignedat} with eqnarray \begin{eqnarray}p&=&q_{i}\end{eqnarray}.",
    # label/ref/cite removal inside matches
    r"Labelled $x_{i}^2 \label{eq:foo{i}} + y$ and cited \[z_{i} \cite{knuth} - w \eqref{eq:bar}\].",
    r"Reference soup \begin{equation}\ref{a} k_{i}+1 \label{eq:q{i}}\end{equation} end.",
    # spacing macros at the edges
    r"Edges $\quad x_{i}+y \quad$ and $\, z_{i}\,$ and $~w_{i}~$ trim.",
    r"Hspace $\hspace{1em} q_{i}-r \hspace{2em}$ plus $\hfill s_{i} \hfill$ done.",
    # \notag, \nonumber, embedded newlines
    "Multi-line \\begin{align}x_{i} &= y \\notag \\\\ z &= w \\nonumber\\end{align} ok.",
    "Dollar with newline $a_{i} +\nb$ collapses.",
    # faulty branches: tikz, empty-ish, trailing backslash
    r"Diagram $\tikz{\draw (0,0)--({i},1);}$ is dropped but $kept_{i}$ stays.",
    r"Tiny $x$ and trailing $bad_{i}\\$ plus good $fine_{i}$.",
    # operatorname whitelist
    r"Trig $\operatorname{sin}(x_{i}) + \operatorname{cos}(y)$ appears.",
    r"Spaced $\operatorname {tan}(z_{i})$ and $\operatorname {liminf}_{n} a_n$ forms.",
    # smallmatrix / split rewrite candidates
    r"Matrix $\begin{smallmatrix}a&b\\c&d_{i}\end{smallmatrix}$ inline.",
    # mathrm/text/mathbf groups for post_process
    r"Units $3\,\mathrm {kg} \cdot x_{i}$ and $\text {speed } v_{i}$ and $\mathbf {F} = m a$.",
    # duplicated equations within one turn (set-dedup)
    r"Same twice: $dup_{i}+1$ text $dup_{i}+1$ tail $other_{i}$.",
]

# --- macro-defining turns (latex mode; exercises the expander) --------------
MACRO_TEMPLATES = [
    r"\newcommand{\vect}[1]{\mathbf{#1}} The force is $\vect{F_{i}} = m \vect{a}$.",
    r"\newcommand*{\half}{\frac{1}{2}} Energy $E = \half m v_{i}^2$ here.",
    r"\newcommand{\pb}[3][2]{(#2 + #3)^{#1}} Expand $\pb[{i}]{x}{y}$ now.",
    r"\def\ee{\end{equation}} \def\be{\begin{equation}} \be x_{i}+1=2 \ee trailing.",
    r"\let\a\alpha \let\b=\beta Greek $\a_{i} + \b$ mix.",
    r"\newcommand{\cmd}[1]{op(#1)} \newcommand{\nested}[2]{\cmd{#1}\cmd{#2}} Use $\nested{p_{i}}{q}$.",
    "% pure comment line\n\\newcommand{\\sq}[1]{#1^2} Then $\\sq{u_{i}} - 1$ trails. % tail comment\n",
    r"\newcommand{\dup}{one} \newcommand{\dup}{two} Ambiguous $\dup_{i} + c$ stays verbatim.",
]

# --- HTML-ish turns (wiki/html modes) ----------------------------------------
HTML_TEMPLATES = [
    # wiki mode: \displaystyle markup terminated by " or <
    '<p>wiki math <img alt="{\\displaystyle x_{i}^2+y}" src="a.png"></p>'
    "<script>var skip_{i} = 1;</script>",
    '<div>more <span class="mwe-math">{\\displaystyle \\frac{a_{i}}{b}}</span>'
    '<img alt="{\\displaystyle e^{i\\pi}+1=0}"></div>',
    # stackexchange-like: dollars inside HTML, entities to unescape
    "<p>se question about $x_{i} &lt; y$ and code</p><noscript>nojs_{i}</noscript>",
    "<p>entity soup &amp; math $a_{i} \\leq b$ plus $$c_{i}^2$$ tail</p>",
    "<body>plain html no math turn {i} &amp; nothing else</body>",
    # numeric entity for '$': only decodes to math after unescape — the
    # reason the JVM prefilter must keep '&'-bearing turns
    "<p>entity dollars &#36;e_{i}+f&#36; and named &dollar;g_{i}&dollar; end</p>",
    # malformed / unclosed markup must not derail the strip pass
    "<div class=broken <span>$h_{i}-1$</div><script>half_open_{i}",
    "<p>CDATA-ish <![CDATA[ $not_me_{i}$ ]]> but real $yes_{i}$</p>",
]

# --- no-math turns -----------------------------------------------------------
PLAIN_TEMPLATES = [
    "This turn {i} has no mathematics at all, only prose.",
    "Tool output: status=ok, attempt={i}, duration=12ms.",
    "A costs discussion mentioning 5 dollars literally: \\$5 and \\$`{i}`.",
    "",
]

ALL_TEMPLATE_GROUPS = {
    "math": MATH_TEMPLATES,
    "macro": MACRO_TEMPLATES,
    "html": HTML_TEMPLATES,
    "plain": PLAIN_TEMPLATES,
}


def render_template(group: str, index: int, salt: int) -> str:
    """Pick the ``index``-th template of ``group`` (mod size) and
    interpolate the per-turn salt."""
    templates = ALL_TEMPLATE_GROUPS[group]
    return templates[index % len(templates)].replace("{i}", str(salt))
