"""Adversarial-input oracle parity: the driver's testdata text is benign
single-spaced ASCII, so engine-divergence on edge-case input (tabs,
newlines, repeated spaces, empty docs, unicode) would never surface
there.  This builds a tiny synthetic documents table full of exactly
those shapes and runs the text/dedup operators through the SAME
Spark-vs-DuckDB compare the driver uses."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import oracle_check as oc  # noqa: E402

_DOCS = [
    # (text, lang, source)
    ("", "en", "src0"),                                  # empty doc
    ("   ", "en", "src0"),                               # spaces only
    ("one", "en", "src1"),                               # single token
    ("a b", "en", "src1"),                               # sub-shingle
    ("the cat sat on the mat the cat sat", "en", "src1"),
    ("tab\tseparated\ttokens here now", "en", "src2"),   # tabs
    ("line\nbroken\ntext with newlines inside", "en", "src2"),
    ("double  space   runs    collapse", "en", "src2"),
    ("trailing space ", "en", "src3"),
    (" leading space", "en", "src3"),
    ("MiXeD CaSe TeXt MiXeD CaSe TeXt", "de", "src3"),
    ("punct, heavy! text? yes; really: ok.", "de", "src3"),
    ("1234 5678 90 numbers 1234 5678", "de", "src4"),
    ("repeat repeat repeat repeat repeat repeat", "fr", "src4"),
    ("the the the the the the the the the the", "fr", "src4"),
    ("xyzzy plugh qwerty asdf zxcv", "fr", "src4"),
    # unicode: ascii() returns full codepoints in BOTH engines (probed:
    # é→233, 東→26481, identical rolling fingerprints), so the hash
    # pipeline is unicode-safe by construction — keep it covered
    ("café au lait naïve résumé café au lait", "fr", "src5"),
    ("東京 大阪 京都 東京 名古屋 札幌", "ja", "src5"),
    ("mixed ascii και ελληνικά und deutsch", "el", "src5"),
    # doc 20: exact duplicate of doc 17 (doc 17 lands in the %17 eval
    # split, doc 20 in the corpus → decontam_bloom must flag it; the
    # identical fingerprint also forces sample_reservoir's doc_id
    # tie-break).  doc 21 extends doc 7 past its 37 chars, so their
    # 40-char prefixes DIFFER — the negative case: a shared span shorter
    # than the window must NOT count as contamination
    ("café au lait naïve résumé café au lait", "fr", "src9"),
    ("line\nbroken\ntext with newlines inside but diverging tail", "en", "src9"),
]

# ops whose inputs are only the documents table and whose semantics the
# synthetic shapes actually stress
_QIDS = (
    "text_stats",
    "text_ngram_freq",
    "vocab_topk",
    "dedup_exact",
    "doc_fingerprint",
    "text_token_bpe",
    "text_rep_bigram",
    "text_boilerplate_ngram",
    "dedup_substring_spans",
    "text_readability",
    # tier6 batch (round 4): empty/unicode texts exercise fp(substr)=0
    # sharing, reservoir tie-breaks, mode ties, and degenerate cells
    "decontam_bloom",
    "sample_reservoir",
    "agg_mode",
    "stats_chi2",
    # empty/space-only docs (NULL mean_wl, zero-length symbol-ratio
    # divisor), unicode symbol ratios, stopword-free repetition docs
    "text_gopher_filter",
    # round-6: sub-3-token docs (empty shingle sets on both engines),
    # unicode tokens (hash-set vs string-shingle Jaccard equality), and
    # a near-empty batch slice for the persisted-store probe
    "dedup_incremental_minhash",
    # round-7: true-BPE merge rounds (single-char tokens with no pairs,
    # unicode chars in merged symbols, tie-broken pair picks) and the
    # Arrow-scored quality model (empty docs → NULL score/keep, unicode
    # codepoint hashing ord≡ascii, single-token docs)
    "text_token_bpe_merge",
    "text_quality_model",
    # round-7 late: per-source BPE accounting (sources whose docs are all
    # token-free must survive with zero counts via the left join) and
    # the banding calibration (sub-3-token docs excluded from the
    # signature on both engines; unicode ord≡ascii portability)
    "text_token_bpe_apply",
    "dedup_band_calibration",
    # round-7 batch B: line-level boilerplate dedup — empty/space-only
    # docs must produce ZERO chunks on both engines (the sequence(0,-1)
    # phantom-chunk guard), duplicate docs share every chunk fingerprint,
    # and sub-chunk docs yield one short tail chunk
    "text_line_dedup",
    # round-7 batch C: perplexity bucketing (token-free docs drop before
    # the ntile; 22 docs over 10 buckets exercises the n%b extra-row
    # rule), softdedup weights (exact-duplicate docs 17/20 share a
    # fingerprint cluster; empty and space-only docs collide on fp("")
    # vs fp("   ") — DISTINCT fingerprints, not distinct texts), and the
    # cluster histogram (sub-shingle docs are singletons on both engines)
    "text_perplexity_bucket",
    "sample_importance_softdedup",
    "dq_duplicate_cluster_stats",
    # round-7 batch D: epoch shuffle — tiny corpus over 8 shards leaves
    # EMPTY shards on both engines (absent groups, not zero rows), and
    # the LCG must stay exact on small doc_ids
    "data_epoch_shuffle",
)


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adv_sf")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(_DOCS) + 1), pa.int64()),
            "text": pa.array([t for t, _, _ in _DOCS], pa.string()),
            "lang": pa.array([l for _, l, _ in _DOCS], pa.string()),
            "source": pa.array([s for _, _, s in _DOCS], pa.string()),
            "n_chars": pa.array([len(t) for t, _, _ in _DOCS], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_text_ops_survive_adversarial_input(spark, adv_dir):
    from dataframe_expressions_spark.operators.registry import load_all

    import duckdb

    load_all()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adv_dir}/documents.parquet')"
    )
    failures = {}
    for qid in _QIDS:
        err = oc.run_one(qid, spark, con, adv_dir)
        if err:
            failures[qid] = err
    assert not failures, failures


def test_multimodal_chunk_ops_empty_payload(spark, tmp_path):
    """Zero-length payloads must produce ZERO chunks on both engines:
    Spark's sequence(0, -1) yields [0, -1] (descending-step inference)
    where DuckDB's range(0, 0) is empty — the operators guard the
    explode, and this pins the guard with an ASCII-only fixture (the
    unicode fixture above deliberately violates the chunk ops' stated
    ASCII byte==char contract, so they are excluded from it)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataframe_expressions_spark.operators.registry import load_all

    load_all()
    d = tmp_path / "adv_mm"
    d.mkdir()
    docs = [
        ("", "en", "src0"),              # EMPTY payload: zero chunks
        ("a" * 64, "en", "src0"),        # exactly one chunk
        ("a" * 64, "en", "src1"),        # duplicate payload
        ("b" * 65, "en", "src1"),        # chunk boundary + 1
        ("c", "de", "src0"),             # sub-chunk payload
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(docs) + 1), pa.int64()),
            "text": pa.array([t for t, _, _ in docs], pa.string()),
            "lang": pa.array([l for _, l, _ in docs], pa.string()),
            "source": pa.array([s for _, _, s in docs], pa.string()),
            "n_chars": pa.array([len(t) for t, _, _ in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    failures = {}
    for qid in ("multimodal_chunk_dedup", "pipeline_multimodal_corpus"):
        err = oc.run_one(qid, spark, con, str(d))
        if err:
            failures[qid] = err
    assert not failures, failures
