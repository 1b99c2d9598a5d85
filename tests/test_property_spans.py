"""Property-based check of dedup_substring_spans' span semantics: the
Spark pipeline (gram hashing → cross-doc duplicate probe → windowed
interval merge) must equal a direct pure-Python reference on random
corpora.  This targets the two places an off-by-one survives
example-based tests: the k-gram position range (1..n-k+1) and the
overlap-or-adjacent merge rule (pos > prev_end + 1 starts a new span).

Corpora are built from a 4-token alphabet so cross-doc duplicate 8-grams
are common; DuckDB is not involved — the reference implementation IS the
oracle here (the DuckDB parity of the same operator is covered by
tests/test_oracle_parity.py and the adversarial text suite).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

K = 8


def _ref_spans(docs: dict[int, list[str]]) -> set[tuple[int, int, int, int]]:
    """Pure-Python reference: (doc_id, span_start, span_end, n_grams)."""
    grams: dict[tuple[str, ...], set[int]] = {}
    pos: dict[int, list[int]] = {}
    for did, toks in docs.items():
        pos[did] = []
        for i in range(len(toks) - K + 1):
            grams.setdefault(tuple(toks[i : i + K]), set()).add(did)
    dup = {g for g, ds in grams.items() if len(ds) > 1}
    out: set[tuple[int, int, int, int]] = set()
    for did, toks in docs.items():
        ps = [
            i + 1  # 1-based, matching the SQL/Spark contract
            for i in range(len(toks) - K + 1)
            if tuple(toks[i : i + K]) in dup
        ]
        if not ps:
            continue
        start, end, n = ps[0], ps[0] + K - 1, 1
        for p in ps[1:]:
            if p > end + 1:
                out.add((did, start, end, n))
                start, end, n = p, p + K - 1, 1
            else:
                end, n = p + K - 1, n + 1
        out.add((did, start, end, n))
    return out


_doc = st.lists(st.sampled_from(("aa", "bb", "cc", "dd")), min_size=0, max_size=24)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_doc, min_size=2, max_size=6))
def test_substring_spans_match_reference(spark, tmp_path_factory, docs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataframe_expressions_spark.operators.registry import load_all

    d = tmp_path_factory.mktemp("prop_spans")
    texts = [" ".join(t) for t in docs]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(docs) + 1), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(docs), pa.string()),
                "source": pa.array(["s"] * len(docs), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
        for r in load_all()["dedup_substring_spans"]
        .fn(spark, str(d))
        .collect()
    }
    want = _ref_spans({i + 1: t for i, t in enumerate(docs)})
    assert got == want
