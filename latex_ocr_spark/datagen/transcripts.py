"""Deterministic multi-turn transcript synthesis.

Schema matches the engine's input contract (BASELINE.json input_hint):
``conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp``.  Every field is a pure function of ``(conv, turn)`` —
no shared RNG state — so any row range can be generated independently
on any executor (this is what lets the bench generate 10⁶+ turns in
parallel with ``spark.range``).

Conversation lengths are skewed on purpose (a few 200-turn convs among
many short ones) to exercise the salted repartition path.
"""

from __future__ import annotations

import datetime as _dt
from typing import Dict, Iterator, List, Tuple

from latex_ocr_spark.datagen.templates import render_template

BASE_TS = _dt.datetime(2024, 12, 20, 0, 0, 0)
_ROLES = ("user", "assistant", "tool")
_LENGTH_CYCLE = (2, 3, 5, 8, 13, 21, 34)
_SKEW_EVERY = 97  # every 97th conversation is a 200-turn whale
_SKEW_LEN = 200

# group mix per 20 turns: 10 math, 3 macro, 4 html, 3 plain
_GROUP_WHEEL = (
    ["math"] * 10 + ["macro"] * 3 + ["html"] * 4 + ["plain"] * 3
)

Row = Tuple[str, int, str, str, str, _dt.datetime]


def conv_length(conv: int) -> int:
    if conv % _SKEW_EVERY == 0 and conv > 0:
        return _SKEW_LEN
    return _LENGTH_CYCLE[conv % len(_LENGTH_CYCLE)]


def turn_text(conv: int, turn: int) -> str:
    mix = (conv * 31 + turn * 7) % len(_GROUP_WHEEL)
    group = _GROUP_WHEEL[mix]
    template_idx = (conv * 13 + turn * 3) % 97
    salt = conv * 1000 + turn
    return render_template(group, template_idx, salt)


def make_turn(conv: int, turn: int) -> Row:
    tool = None
    if (conv + turn) % 10 == 0:
        tool = "calculator"
    elif (conv + turn) % 10 == 5:
        tool = "search"
    return (
        "conv-%06d" % conv,
        turn,
        _ROLES[turn % len(_ROLES)],
        turn_text(conv, turn),
        tool,
        BASE_TS + _dt.timedelta(hours=conv % 480, minutes=turn),
    )


def iter_transcripts(n_convs: int) -> Iterator[Row]:
    for conv in range(n_convs):
        for turn in range(conv_length(conv)):
            yield make_turn(conv, turn)


def gen_transcripts(n_convs: int) -> List[Row]:
    return list(iter_transcripts(n_convs))


def golden_spans(rows: List[Row]) -> List[Dict]:
    """Expected-output oracle: runs the pure per-turn kernel driver-side.

    Used only in tests/fixture builds; the kernel itself is separately
    parity-tested against the reference implementation, closing the
    chain engine == kernel == reference.
    """
    from latex_ocr_spark.textkernel.pipeline import extract_turn

    out: List[Dict] = []
    for conv_id, turn_idx, _role, text, _tool, _ts in rows:
        for span in extract_turn(text):
            out.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": turn_idx,
                    "span_idx": span.span_idx,
                    "raw_match": span.raw_match,
                    "latex_norm": span.latex_norm,
                }
            )
    out.sort(key=lambda r: (r["conv_id"], r["turn_idx"], r["span_idx"]))
    return out
