"""Property test: the SQL BPE merge rounds (DuckDB dialect — the exact
algorithm twin of the Spark body) must agree with an independent
token-list implementation of the Sennrich greedy trainer for ANY corpus.

Runs engine-side on DuckDB only (fast, no Spark session): the Spark/DuckDB
pair is proven equivalent by the driver-hash oracle gate; this test pins
the ALGORITHM against a reference that shares no string-replace semantics
with it (the r8 boundary-sharing bug class)."""

from __future__ import annotations

from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_fastlanes_spark.pipeline.text import _bpe_sql


def _merge(parts: list, a: str, b: str) -> list:
    out, i = [], 0
    while i < len(parts):
        if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return out


def _reference_rounds(words: list, n_rounds: int = 3) -> list:
    vocab = [(list(w), n) for w, n in Counter(words).items()]
    out = []
    for r in range(1, n_rounds + 1):
        pairs: Counter = Counter()
        for parts, n in vocab:
            for a, b in zip(parts, parts[1:]):
                pairs[f"{a} {b}"] += n
        if not pairs:
            break
        best = min(((-n, p) for p, n in pairs.items()))
        out.append((r, best[1], -best[0]))
        a, b = best[1].split(" ")
        vocab = [(_merge(parts, a, b), n) for parts, n in vocab]
    return out


# small alphabet maximizes adjacent-run collisions — the adversarial regime
words_strategy = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=8), min_size=1, max_size=12
)


@settings(max_examples=40, deadline=None)
@given(words_strategy)
def test_bpe_sql_matches_token_list_reference(words):
    expect = _reference_rounds(words)
    text = " ".join(words)
    con = duckdb.connect()
    con.register(
        "documents_src", pd.DataFrame({"text": [text]})
    )
    con.execute("CREATE VIEW documents AS SELECT text FROM documents_src")
    got = sorted(map(tuple, con.execute(_bpe_sql("duckdb")).fetchall()))
    assert got == sorted(expect), (words, got, expect)
