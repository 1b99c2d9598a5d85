"""Property-based checks for the two tier6 operators whose correctness
rests on a decomposition argument rather than a direct formula:

* ``join_interval_bucketed`` — the claim that bucket width == interval
  length makes every (signup, purchase) pair meet in EXACTLY one bucket
  (so no dedup pass is needed) has off-by-one risk at three places:
  the exact lower boundary (inclusive), the exact +10 m upper boundary
  (exclusive), and bucket-aligned signups (array_distinct collapse).
  Random timestamps drawn from a grid dense in exactly those offsets are
  compared against a brute-force pure-Python interval join.

* ``decontam_bloom`` — the Bloom bitmap + exact-verify pipeline must
  equal a plain fingerprint semi-join on ANY corpus (the sketch may
  admit false positives; the verify join must kill every one).  Random
  corpora with heavy duplication maximize both contamination hits and
  bitmap collisions.

The reference implementations ARE the oracles here; DuckDB parity of the
same operators is covered by tests/test_oracle_parity.py and the
adversarial suites.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_T0 = dt.datetime(1996, 3, 1, 0, 0, 0)
_BUCKET_US = 600 * 1_000_000

# offsets (in microseconds) dense around the half-open boundary and the
# bucket edges: 0, +1us, last-covered-us, exact +10m, bucket-aligned
_OFFSETS_US = [
    0,
    1,
    299_000_000,
    599_999_999,
    600_000_000,
    600_000_001,
    1_199_999_999,
    1_200_000_000,
    1_800_000_000,
]

_event = st.tuples(
    st.sampled_from([1, 2]),                       # user_id
    st.sampled_from(["signup", "purchase"]),
    st.sampled_from(_OFFSETS_US),
)


def _write_events(d, events):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(1, len(events) + 1), pa.int64()),
                "ts": pa.array(
                    [_T0 + dt.timedelta(microseconds=us) for _, _, us in events],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([u for u, _, _ in events], pa.int64()),
                "event_type": pa.array([t for _, t, _ in events], pa.string()),
                "value": pa.array([1.0] * len(events), pa.float64()),
                "props": pa.array(["{}"] * len(events), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )


def _ref_interval_join(events):
    """Brute-force half-open interval join → top-20 (n_pairs desc, user)."""
    sig = [(u, us) for u, t, us in events if t == "signup"]
    pur = [(u, us) for u, t, us in events if t == "purchase"]
    counts: dict[int, int] = {}
    for su, sus in sig:
        for pu, pus in pur:
            if su == pu and sus <= pus < sus + _BUCKET_US:
                counts[su] = counts.get(su, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    return {(u, n) for u, n in ranked}


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_event, min_size=1, max_size=14))
def test_interval_bucketing_matches_bruteforce(spark, tmp_path_factory, events):
    from dataframe_expressions_spark.operators.registry import load_all

    d = tmp_path_factory.mktemp("prop_iv")
    _write_events(d, events)
    got = {
        (r["user_id"], r["n_pairs"])
        for r in load_all()["join_interval_bucketed"].fn(spark, str(d)).collect()
    }
    assert got == _ref_interval_join(events)


_text = st.sampled_from(
    [
        # several EXACTLY-equal leading-40-char families plus divergent
        # tails, so cross-split contamination is common
        "alpha " * 10,
        "alpha " * 10 + "tail one",
        "beta beta beta beta beta beta beta beta ",
        "beta beta beta beta beta beta beta beta different",
        "gamma short",
        "",
        "delta " * 20,
    ]
)


def _ref_decontam(docs):
    """Plain prefix-fingerprint semi-join → per-source contamination."""
    def fp(text):
        acc = 0
        for ch in text[:40]:
            acc = (acc * 31 + ord(ch)) % 1_000_000_007
        return acc

    eval_fps = {fp(t) for i, (t, _) in docs.items() if i % 17 == 0}
    out: dict[str, int] = {}
    for i, (t, src) in docs.items():
        if i % 17 != 0 and fp(t) in eval_fps:
            out[src] = out.get(src, 0) + 1
    return set(out.items())


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.tuples(_text, st.sampled_from(["s1", "s2"])),
                min_size=1, max_size=40))
def test_bloom_decontam_matches_semijoin(spark, tmp_path_factory, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataframe_expressions_spark.operators.registry import load_all

    d = tmp_path_factory.mktemp("prop_bloom")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(rows) + 1), pa.int64()),
                "text": pa.array([t for t, _ in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array([s for _, s in rows], pa.string()),
                "n_chars": pa.array([len(t) for t, _ in rows], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = {
        (r["source"], r["n_contam"])
        for r in load_all()["decontam_bloom"].fn(spark, str(d)).collect()
    }
    docs = {i + 1: rows[i] for i in range(len(rows))}
    assert got == _ref_decontam(docs)
