"""BPE tokenizer: round-trip contract over every extracted span
(FIXTURES.md §5) plus Spark column operators."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from latex_ocr_spark.datagen.transcripts import gen_transcripts
from latex_ocr_spark.textkernel.bpe import BOS_ID, EOS_ID, default_tokenizer
from latex_ocr_spark.textkernel.pipeline import extract_turn


def test_roundtrip_all_fixture_spans():
    tk = default_tokenizer()
    n = 0
    for row in gen_transcripts(80):
        for span in extract_turn(row[3]):
            ids = tk.encode(span.latex_norm)
            assert ids[0] == BOS_ID and ids[-1] == EOS_ID
            assert tk.decode(ids) == span.latex_norm
            n += 1
    assert n > 500


def test_specials_and_edges():
    tk = default_tokenizer()
    assert tk.encode("") == [BOS_ID, EOS_ID]
    assert tk.decode([BOS_ID, EOS_ID]) == ""
    assert tk.decode(tk.encode(r"\frac{1}{2}")) == r"\frac{1}{2}"
    # Ġ sentinel decodes to a space between pretokens
    ids = tk.encode("a b")
    assert tk.decode(ids) == "a b"


def test_known_vocab_ids():
    tk = default_tokenizer()
    # frozen single-token spot checks from resources/tokenizer.json
    assert tk.vocab["[PAD]"] == 0
    assert tk.vocab["[BOS]"] == 1
    assert tk.vocab["[EOS]"] == 2
    assert tk.encode("!", add_specials=False) == [tk.vocab["!"]]


def test_spark_tokenize_roundtrip(spark):
    import pandas as pd

    from latex_ocr_spark.operators.tokenize import (
        filter_max_seq_len,
        with_detokenized,
        with_tokens,
    )

    pdf = pd.DataFrame(
        {"latex_norm": [r"\frac{1}{2}", r"x^{2}+y_{i}", r"\alpha\beta", ""]}
    )
    df = spark.createDataFrame(pdf)
    toked = with_tokens(df)
    back = with_detokenized(toked)
    rows = {r.latex_norm: (r.tokens, r.decoded) for r in back.collect()}
    for s, (ids, decoded) in rows.items():
        assert decoded == s
        assert ids[0] == BOS_ID and ids[-1] == EOS_ID
    assert filter_max_seq_len(toked, max_len=3).count() == 1  # only ""
