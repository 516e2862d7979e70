"""Minimal ByteLevel-BPE trainer (M7).

The reference trains its vocab driver-side with the HF ``tokenizers``
wheel (dataset.py:222-230: BpeTrainer, vocab_size=8000, specials
[PAD][BOS][EOS]); that wheel is absent here, so this is a from-scratch
trainer producing the same tokenizer.json shape our BpeTokenizer loads.

Spark usage mirrors the reference's driver-side training: sample the
corpus column (``df.sample(...).collect()`` or a pre-aggregated
term-frequency table from A1) and train on the driver — vocab training
is a global sequential fixpoint, not a distributed op.
"""

from __future__ import annotations

import json
from collections import Counter
from typing import Dict, Iterable, List, Tuple

from latex_ocr_spark.textkernel.bpe import _PRETOK, _byte_unicode_map

SPECIALS = ["[PAD]", "[BOS]", "[EOS]"]


def train_bpe(
    corpus: Iterable[str], vocab_size: int = 2000, min_frequency: int = 2
) -> dict:
    """Train merges+vocab; returns a tokenizer.json-shaped dict."""
    b2u = _byte_unicode_map()
    # word-frequency table over byte-level pretokens
    word_freq: Counter = Counter()
    for text in corpus:
        for chunk in _PRETOK.findall(text):
            word_freq[tuple(b2u[b] for b in chunk.encode("utf-8"))] += 1

    # alphabet = every unit seen, deterministic order
    vocab: Dict[str, int] = {s: i for i, s in enumerate(SPECIALS)}
    for unit in sorted({u for w in word_freq for u in w}):
        vocab.setdefault(unit, len(vocab))

    merges: List[Tuple[str, str]] = []
    words: Dict[Tuple[str, ...], int] = dict(word_freq)
    while len(vocab) < vocab_size:
        pair_freq: Counter = Counter()
        for word, freq in words.items():
            for i in range(len(word) - 1):
                pair_freq[(word[i], word[i + 1])] += freq
        if not pair_freq:
            break
        # deterministic tie-break: frequency desc, then lexicographic
        (a, b), freq = min(
            pair_freq.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < min_frequency:
            break
        merges.append((a, b))
        merged = a + b
        vocab.setdefault(merged, len(vocab))
        new_words: Dict[Tuple[str, ...], int] = {}
        for word, f in words.items():
            out: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + f
        words = new_words

    return {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [
            {"id": i, "special": True, "content": s} for i, s in enumerate(SPECIALS)
        ],
        "normalizer": None,
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False, "trim_offsets": True},
        "post_processor": None,
        "decoder": None,
        "model": {
            "dropout": None,
            "unk_token": None,
            "continuing_subword_prefix": None,
            "end_of_word_suffix": None,
            "fuse_unk": False,
            "vocab": vocab,
            "merges": [f"{a} {b}" for a, b in merges],
        },
    }


def save_tokenizer(spec: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(spec, f)
