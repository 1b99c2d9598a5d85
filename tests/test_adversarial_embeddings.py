"""Adversarial-input parity for the embedding/ANN operators: the driver's
embeddings are well-behaved random unit-ish vectors, so zero vectors
(cosine 0/0), exactly duplicated and negated pairs (cosine ±1 on the
round boundary), underflow/overflow magnitudes, and degenerate k-means
input never get exercised.  Synthetic embeddings built to hit exactly
those, compared through the driver-grade oracle harness."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import oracle_check as oc  # noqa: E402

_DIM = 64


def _vec(f):
    return [f(i) for i in range(_DIM)]


def _mk_embeddings():
    rows = []

    def add(vec, label):
        rows.append((len(rows), [float(x) for x in vec], label))

    add(_vec(lambda i: 0.0), 0)                       # zero vector
    add(_vec(lambda i: 0.1 * (i % 5)), 0)             # duplicate pair a
    add(_vec(lambda i: 0.1 * (i % 5)), 0)             # duplicate pair b
    add(_vec(lambda i: -0.1 * (i % 5)), 1)            # negation of the pair
    # magnitudes: underflow below DECIMAL(38,12) scale, and the largest
    # component inside the documented fold domain (squared terms must fit
    # DECIMAL(38,12) — |x| ≲ 1e13; real embeddings are O(1), and beyond
    # the domain BOTH the ANSI fold and the oracle's decimal overflow)
    add(_vec(lambda i: 1e-30), 1)
    add(_vec(lambda i: 1e2 if i == 0 else 0.0), 1)
    add(_vec(lambda i: -1.0 if i % 2 else 1.0), 2)    # alternating signs
    # fill labels 0-9 with deterministic distinct vectors
    for k in range(30):
        lab = k % 10
        add(_vec(lambda i, k=k: ((i * 7 + k * 13) % 11 - 5) / 7.0), lab)
    return rows


_QIDS = (
    "emb_norm_quantize",
    "emb_centroid",
    "emb_outlier_centroid",
    "emb_random_projection",
    "dedup_near_embedding",
    "sim_search_topk",
    "sim_search_lsh",
    "sim_search_ivf",
    "kmeans_lloyd",
    "dedup_semantic",
    "emb_pq_codebook",
    # first-8-dims slice of the zero / 1e-30 / duplicate / negated
    # vectors: the sliced-space zero-norm guard and tie-breaks (round 4)
    "emb_dim_slice",
    # round-6: the curation funnel (zero-norm k1 gate, duplicate pair on
    # the cosine round boundary, labels that lose every vector) and the
    # recall audit (zero-norm query vec_id 0 must drop from BOTH legs)
    "pipeline_embedding_curation",
    "sim_search_recall_audit",
    # round-7 batch B: whitening (constant dims → sigma 0 dropped from
    # BOTH passes; 1e-30 underflow rounds to 0 at 6dp), MMR (zero-norm
    # query vec 0 empties the pool → zero rows on both engines; the
    # duplicate/negated pairs put cosine ±1 ties on the round boundary),
    # and the NDCG audit (zero-norm query drops from both legs; negative
    # cosines all land in grade band 0)
    "emb_whitening",
    "rank_mmr",
    "rank_ndcg_audit",
    # round-7 batch D: IVF balance — the zero vector drops from the
    # assignment on both engines, zero-norm centroids drop from the
    # cell set, and labels that lose every vector vanish from the audit
    "emb_ivf_balance_audit",
)


@pytest.fixture(scope="module")
def adv_emb_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adv_emb_sf")
    rows = _mk_embeddings()
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def test_embedding_ops_survive_adversarial_input(spark, adv_emb_dir):
    import duckdb

    from dataframe_expressions_spark.operators.registry import load_all

    load_all()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{adv_emb_dir}/embeddings.parquet')"
    )
    failures = {}
    for qid in _QIDS:
        try:
            err = oc.run_one(qid, spark, con, adv_emb_dir)
        except Exception as e:  # noqa: BLE001
            err = f"EXC {type(e).__name__}: {str(e)[:140]}"
        if err:
            failures[qid] = err
    assert not failures, failures


@pytest.fixture(scope="module")
def single_candidate_dir(tmp_path_factory):
    """Degenerate corpus for the MMR pool-of-one edge (round-8, r7
    ADVICE): query vec 0 plus exactly ONE other nonzero vector — the
    pairwise (av != bv) self-join is empty, so a pairs-only grouped-map
    feed would emit zero rows while the oracle's sel1 still selects the
    lone candidate.  Zero vectors pad the corpus so the norm gate does
    real work."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adv_emb_one")
    vecs = [
        [1.0] + [0.0] * (_DIM - 1),          # query (vec_id 0)
        [0.5, 0.5] + [0.0] * (_DIM - 2),     # the lone candidate
        [0.0] * _DIM,                        # zero vectors: dropped by
        [0.0] * _DIM,                        # the n2 > 0 gate
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(vecs), pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def test_rank_mmr_single_candidate_pool(spark, single_candidate_dir):
    import duckdb

    from dataframe_expressions_spark.operators.registry import load_all

    qs = load_all()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{single_candidate_dir}/embeddings.parquet')"
    )
    err = oc.run_one("rank_mmr", spark, con, single_candidate_dir)
    assert not err, err
    # parity alone could hide a both-engines-empty bug: the lone
    # candidate must actually be selected at rank 1 with max_sim_sel 0
    rows = qs["rank_mmr"].fn(spark, single_candidate_dir).collect()
    assert len(rows) == 1
    assert rows[0]["rk"] == 1 and rows[0]["vid"] == 1
    assert rows[0]["max_sim_sel"] == 0.0
