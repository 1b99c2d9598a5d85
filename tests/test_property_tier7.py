"""Independent brute-force references for tier-7 operators whose DuckDB
oracles mirror the SAME algorithm (degree orientation, window cumsum) —
a shared-structure bug would pass parity, so these recompute the answer
a different way in plain Python (same discipline as
test_property_bucketed / test_property_spans)."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from conftest import SF_SMOKE


def test_triangle_count_matches_bruteforce(spark):
    """Operator counts via degree-ordered wedge joins; reference counts
    via per-edge neighbor-set intersection (each triangle seen 3x)."""
    from dataframe_expressions_spark.operators.tier7 import (
        graph_triangle_count,
    )

    row = graph_triangle_count(spark, SF_SMOKE).collect()[0]

    con = duckdb.connect()
    pairs = con.execute(
        f"""
        SELECT DISTINCT least(o_custkey % 4096, o_orderkey % 4096) AS lo,
                        greatest(o_custkey % 4096, o_orderkey % 4096) AS hi
        FROM '{SF_SMOKE}/orders.parquet'
        WHERE o_custkey % 4096 <> o_orderkey % 4096
        """
    ).fetchall()
    adj = defaultdict(set)
    for lo, hi in pairs:
        adj[lo].add(hi)
        adj[hi].add(lo)
    tri3 = sum(
        len(adj[a] & adj[b]) for a, b in pairs
    )  # every triangle counted once per edge = 3x
    assert tri3 % 3 == 0
    assert row["n_triangles"] == tri3 // 3
    assert row["n_edges"] == len(pairs)
    assert row["n_nodes"] == len(adj)


def test_gaps_islands_matches_bruteforce(spark):
    """Operator finds longest same-type runs via windowed break counts;
    reference walks each user's (t, event_id)-sorted stream in Python."""
    from dataframe_expressions_spark.operators.tier7 import (
        window_gaps_islands,
    )

    got = [
        (r["run_len"], r["user_id"], r["event_type"], r["start_event"])
        for r in window_gaps_islands(spark, SF_SMOKE).collect()
    ]

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
               event_id
        FROM '{SF_SMOKE}/events.parquet'
        ORDER BY user_id, t, event_id
        """
    ).fetchall()
    runs = []
    prev_user, prev_type, cur = None, None, None
    for user, etype, _, eid in rows:
        if user != prev_user or etype != prev_type:
            if cur:
                runs.append(cur)
            cur = [user, etype, 1, eid]
            prev_user, prev_type = user, etype
        else:
            cur[2] += 1
            cur[3] = min(cur[3], eid)
    if cur:
        runs.append(cur)
    runs.sort(key=lambda r: (-r[2], r[0], r[3]))
    want = [(r[2], r[0], r[1], r[3]) for r in runs[:20]]
    assert got == want


def test_cusum_changepoint_matches_bruteforce(spark):
    """Operator computes the scaled-integer CUSUM argmax via windows;
    reference walks the day series in plain Python with exact ints."""
    from dataframe_expressions_spark.operators.tier7 import (
        stats_cusum_changepoint,
    )

    r = stats_cusum_changepoint(spark, SF_SMOKE).collect()[0]

    con = duckdb.connect()
    days = con.execute(
        f"""
        SELECT CAST(ts AS DATE) AS day, count(*) AS x
        FROM '{SF_SMOKE}/events.parquet' GROUP BY 1 ORDER BY day
        """
    ).fetchall()
    n = len(days)
    sx = sum(x for _, x in days)
    best = None
    cum = 0
    for t, (day, x) in enumerate(days, start=1):
        cum += x
        c = n * cum - t * sx
        key = (abs(c), -t)  # max |C|, earliest day on ties
        if best is None or key > best[0]:
            best = (key, day, c, t, cum)
    _, day, c, t, cum = best
    assert r["cp_day"] == day
    assert r["c_scaled"] == c
    assert r["pre_n"] == t and r["pre_sum"] == cum
    assert r["post_n"] == n - t and r["post_sum"] == sx - cum


def test_multimodal_funnel_matches_bruteforce(spark):
    """Operator rolls the funnel up flag-per-stage in Spark; reference
    recomputes every stage from the raw texts with plain byte slicing."""
    import math

    from dataframe_expressions_spark.operators.tier7 import (
        pipeline_multimodal_corpus,
    )

    got = {
        r["stage"]: (r["n_assets"], r["n_bytes"], r["n_frames"])
        for r in pipeline_multimodal_corpus(spark, SF_SMOKE).collect()
    }

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    payloads = {d: t.encode("utf-8") for d, t in rows}
    owner = {}
    for d in sorted(payloads):
        b = payloads[d]
        for i in range(math.ceil(len(b) / 64)):
            ch = b[i * 64 : (i + 1) * 64]
            owner.setdefault(ch, d)
    flags = {}
    for d, b in payloads.items():
        chunks = [
            b[i * 64 : (i + 1) * 64] for i in range(math.ceil(len(b) / 64))
        ]
        if not chunks:
            continue  # chunkless assets drop from the report (documented)
        dup_frac = sum(1 for ch in chunks if owner[ch] < d) / len(chunks)
        n = len(b)
        k1 = dup_frac <= 0.5
        k2 = k1 and n % 640 >= 100 and (n * 31) % 480 >= 100
        frames = math.ceil(n / 128)
        k3 = k2 and frames <= 3
        flags[d] = (n, k1, k2, k3, frames)
    exp = {
        "s0_raw": (
            len(flags),
            sum(n for n, *_ in flags.values()),
            0,
        ),
        "s1_chunk_dedup": (
            sum(k1 for _, k1, _, _, _ in flags.values()),
            sum(n for n, k1, _, _, _ in flags.values() if k1),
            0,
        ),
        "s2_meta_gate": (
            sum(k2 for _, _, k2, _, _ in flags.values()),
            sum(n for n, _, k2, _, _ in flags.values() if k2),
            0,
        ),
        "s3_frame_sample": (
            sum(k3 for _, _, _, k3, _ in flags.values()),
            sum(n for n, _, _, k3, _ in flags.values() if k3),
            sum(fr for _, _, _, k3, fr in flags.values() if k3),
        ),
    }
    b3 = exp["s3_frame_sample"][1]
    exp["s4_shard_pack"] = (
        math.ceil(b3 / 65536),
        b3,
        exp["s3_frame_sample"][2],
    )
    assert got == exp


def test_kfold_matches_bruteforce(spark):
    """Fold arithmetic and per-fold counts recomputed in plain Python."""
    from dataframe_expressions_spark.operators.tier7 import data_kfold_assign

    got = {
        r["fold"]: (r["n_customers"], r["n_orders"])
        for r in data_kfold_assign(spark, SF_SMOKE).collect()
    }

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_custkey FROM '{SF_SMOKE}/orders.parquet'"
    ).fetchall()
    from collections import defaultdict

    custs, orders = defaultdict(set), defaultdict(int)
    for (ck,) in rows:
        fold = (ck * 1103515245 + 12345) % 2147483647 % 5
        custs[fold].add(ck)
        orders[fold] += 1
    exp = {f: (len(custs[f]), orders[f]) for f in orders}
    assert got == exp


def test_embedding_curation_matches_bruteforce(spark):
    """The 4-gate funnel recomputed with numpy floats following the
    operator's exact rounding discipline (DECIMAL folds simulated with
    math.fsum-free ordered sums over the same rounded terms)."""
    import math
    from collections import defaultdict
    from decimal import Decimal

    from dataframe_expressions_spark.operators.tier7 import (
        pipeline_embedding_curation,
    )

    got = {
        r["stage"]: (r["n_vecs"], r["n_labels"])
        for r in pipeline_embedding_curation(spark, SF_SMOKE).collect()
    }

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding FROM "
        f"'{SF_SMOKE}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    vecs = {vid: ([float(x) for x in v], lab) for vid, lab, v in rows}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    k1 = {vid: dot(v, v) > 0 for vid, (v, _) in vecs.items()}
    # centroids: exact DECIMAL(38,12) component means rounded to 6 — the
    # same cast both engines apply (binary double -> half-up 12 dp)
    by_label = defaultdict(list)
    for vid, (v, lab) in vecs.items():
        if k1[vid]:
            by_label[lab].append(v)
    cent = {}
    for lab, vs in by_label.items():
        dim = len(vs[0])
        ms = []
        for i in range(dim):
            s = Decimal(0)
            for v in vs:
                s += Decimal(v[i]).quantize(Decimal("1e-12"),
                                            rounding="ROUND_HALF_UP")
            ms.append(round(float(s) / len(vs), 6))
        cent[lab] = ms
    dist_ok = {}
    for vid, (v, lab) in vecs.items():
        if not k1[vid]:
            dist_ok[vid] = False
            continue
        m = cent[lab]
        s = Decimal(0)
        for x, mm in zip(v, m):
            s += Decimal((x - mm) * (x - mm)).quantize(
                Decimal("1e-12"), rounding="ROUND_HALF_UP")
        dist_ok[vid] = round(math.sqrt(float(s)), 6) <= 1.01
    k2 = {vid: k1[vid] and dist_ok[vid] for vid in vecs}
    surv = [vid for vid in sorted(vecs) if k2[vid]]
    nrm = {vid: math.sqrt(dot(vecs[vid][0], vecs[vid][0])) for vid in surv}

    # cell assignment: nearest of the <=16 lowest-vec_id valid 64-dim
    # seeds, ties to the lowest seed id (the r7 cell-blocked gate)
    def sqd(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    seeds = [vid for vid in sorted(vecs)
             if k1[vid] and len(vecs[vid][0]) == 64 and vid < 16]
    cell = {}
    for vid in surv:
        v = vecs[vid][0]
        if len(v) == 64 and seeds:
            cell[vid] = min(seeds, key=lambda s: (sqd(v, vecs[s][0]), s))
    dropped = set()
    for i, a in enumerate(surv):
        va, la = vecs[a]
        for b in surv[i + 1:]:
            vb, lb = vecs[b]
            if la != lb or a not in cell or b not in cell:
                continue
            if cell[a] != cell[b]:
                continue
            if round(dot(va, vb) / (nrm[a] * nrm[b]), 4) >= 0.3:
                dropped.add(b)
    k3 = {vid: k2[vid] and vid not in dropped for vid in vecs}
    label_counts = defaultdict(int)
    for vid in sorted(vecs):
        if k3[vid]:
            label_counts[vecs[vid][1]] += 1
    cap = min(label_counts.values()) if label_counts else 0
    k4, seen = {}, defaultdict(int)
    for vid in sorted(vecs):
        lab = vecs[vid][1]
        if k3[vid]:
            seen[lab] += 1
            k4[vid] = seen[lab] <= cap
        else:
            k4[vid] = False

    def stage(flags):
        labs = {vecs[vid][1] for vid in vecs if flags[vid]}
        return (sum(1 for vid in vecs if flags[vid]), len(labs))

    exp = {
        "s0_raw": (len(vecs), len({lab for _, lab in vecs.values()})),
        "s1_valid": stage(k1),
        "s2_central": stage(k2),
        "s3_diverse": stage(k3),
        "s4_balanced": stage(k4),
    }
    assert got == exp


def test_rank_fusion_matches_bruteforce(spark):
    """RRF recomputed end to end in plain Python: BM25 per-doc scores
    (exact-int tf/df/dl stats, per-term round(6) + Decimal fold),
    cosine ranking against vec 0, top-100 truncation, 1/(60+r) fusion."""
    import math
    from collections import Counter, defaultdict
    from decimal import Decimal

    from dataframe_expressions_spark.operators.tier7 import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        rank_fusion_hybrid,
    )

    got = [
        (r["rk"], r["doc_id"], r["rrf"])
        for r in rank_fusion_hybrid(spark, SF_SMOKE).collect()
    ]

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    toks = {d: [t for t in t_.split() if t] for d, t_ in docs}
    dl = {d: len(ts) for d, ts in toks.items()}
    n_docs = len(docs)
    avgdl = sum(dl.values()) / n_docs
    tf = defaultdict(Counter)
    for d, ts in toks.items():
        for t in ts:
            if t in _BM25_TERMS:
                tf[d][t] += 1
    df_ = Counter()
    for d in tf:
        for t in tf[d]:
            df_[t] += 1
    scores = {}
    for d in tf:
        s = Decimal(0)
        for t, f in tf[d].items():
            idf = math.log(1 + (n_docs - df_[t] + 0.5) / (df_[t] + 0.5))
            term = (
                idf
                * (f * (_BM25_K1 + 1))
                / (f + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl[d] / avgdl))
            )
            s += Decimal(str(round(term, 6)))
        scores[d] = float(s)
    lex_rank = {
        d: r + 1
        for r, (d, _) in enumerate(
            sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        )
        if r < 100
    }

    emb = con.execute(
        f"SELECT vec_id, embedding FROM '{SF_SMOKE}/embeddings.parquet'"
    ).fetchall()
    vecs = {vid: [float(x) for x in v] for vid, v in emb}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    q = vecs[0]
    qn = math.sqrt(dot(q, q))
    sims = {}
    for vid, v in vecs.items():
        if vid == 0:
            continue
        nv = math.sqrt(dot(v, v))
        if nv <= 0:
            continue
        sims[vid] = round(dot(q, v) / (qn * nv), 4)
    vec_rank = {
        vid: r + 1
        for r, (vid, _) in enumerate(
            sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))
        )
        if r < 100
    }

    fused = {}
    for d in set(lex_rank) | set(vec_rank):
        fused[d] = (1.0 / (60 + lex_rank[d]) if d in lex_rank else 0.0) + (
            1.0 / (60 + vec_rank[d]) if d in vec_rank else 0.0
        )
    exp = [
        (r + 1, d, round(s, 6))
        for r, (d, s) in enumerate(
            sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        )
    ]
    assert got == exp


def test_recall_audit_matches_bruteforce(spark):
    """Both legs recomputed in Python: exact cosine top-10 and the
    LCG-hyperplane LSH bucket top-10, hit counts compared exactly."""
    import math
    from collections import defaultdict

    from dataframe_expressions_spark.functions.similarity import (
        _LSH_A,
        _LSH_B,
        _LSH_C,
        _LSH_M,
    )
    from dataframe_expressions_spark.operators.tier7 import (
        sim_search_recall_audit,
    )

    got = {
        r["qid"]: (r["n_exact"], r["n_lsh"], r["n_hit"])
        for r in sim_search_recall_audit(spark, SF_SMOKE).collect()
    }

    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding FROM '{SF_SMOKE}/embeddings.parquet'"
    ).fetchall()
    vecs = {vid: [float(x) for x in v] for vid, v in emb}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    nrm = {vid: math.sqrt(dot(v, v)) for vid, v in vecs.items()}
    valid = {vid for vid in vecs if nrm[vid] > 0}

    def bucket(v):
        out = 0
        for b in range(4):
            acc = 0.0
            for i, x in enumerate(v):
                odd = ((_LSH_A * (i + _LSH_B * b) + _LSH_C) % _LSH_M) % 2 == 1
                acc += x if odd else -x
            if acc > 0:
                out |= 1 << b
        return out

    buckets = {vid: bucket(vecs[vid]) for vid in valid}

    def topk(qid, cands):
        scored = sorted(
            (
                (-round(dot(vecs[qid], vecs[v]) / (nrm[qid] * nrm[v]), 4), v)
                for v in cands
            ),
        )[:10]
        return [v for _, v in scored]

    exp = {}
    for qid in range(5):
        if qid not in valid:
            continue
        ex = topk(qid, [v for v in valid if v != qid])
        ls = topk(
            qid,
            [v for v in valid if v != qid and buckets[v] == buckets[qid]],
        )
        exp[qid] = (len(ex), len(ls), len(set(ex) & set(ls)))
    assert got == exp


def test_bpe_merge_matches_bruteforce(spark):
    """The 8 learned merges recomputed with the textbook algorithm in
    plain Python (Counter over words, list-of-symbols sequences, greedy
    left-to-right merge) — structurally INDEPENDENT of both the Spark
    wrapped-string replace encoding and the oracle's CTE chain."""
    import re
    from collections import Counter

    from dataframe_expressions_spark.operators.tier7 import (
        text_token_bpe_merge,
    )

    got = [
        (r["step"], r["lft"], r["rgt"], r["merged"], r["pair_n"],
         r["corpus_symbols"])
        for r in text_token_bpe_merge(spark, SF_SMOKE)
        .orderBy("step")
        .collect()
    ]

    con = duckdb.connect()
    texts = [t for (t,) in con.execute(
        f"SELECT text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()]
    words = Counter()
    for t in texts:
        words.update(w for w in re.split(r"\s+", t) if w != "")
    seqs = {w: list(w) for w in words}

    exp = []
    for step in range(1, 9):
        pairs = Counter()
        for w, seq in seqs.items():
            n = words[w]
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += n
        if not pairs:
            break
        (l, r), pn = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
        n_syms = sum(words[w] * len(seq) for w, seq in seqs.items())
        exp.append((step, l, r, l + r, pn, n_syms))
    assert got == exp


def test_quality_model_matches_bruteforce(spark):
    """Per-doc logits recomputed in plain Python floats (sequential
    accumulation, exact unrounded quotient) — independent of numpy,
    Arrow batching, and the oracle's list folds."""
    import re

    from dataframe_expressions_spark.operators.tier7 import (
        _QM_BUCKETS,
        _QM_HASH_MOD,
        text_quality_model,
    )

    got = {
        r["doc_id"]: (r["n_toks"], r["score"], r["keep"])
        for r in text_quality_model(spark, SF_SMOKE).collect()
    }

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    exp = {}
    for doc_id, text in rows:
        toks = [w for w in re.split(r"\s+", text) if w != ""]
        if not toks:
            exp[doc_id] = (0, None, None)
            continue
        z = 0.0
        for tok in toks:
            h = 0
            for ch in tok:
                h = (h * 31 + ord(ch)) % _QM_HASH_MOD
            b = h % _QM_BUCKETS
            z += ((b * 1103515245 + 12345) % 2147483647 % 2001 - 1000) / 1000.0
        # the operator emits the UNROUNDED quotient (one IEEE division
        # of bit-identical doubles) — its first cut rounded to 6 dp and
        # the sf0.1 sweep caught a round-half tie, the r5 lesson
        score = z / len(toks)
        exp[doc_id] = (len(toks), score, 1 if score >= 0 else 0)
    assert got == exp


def _bruteforce_bpe(texts, k=8):
    """Textbook BPE trainer on the word-frequency table (shared by the
    merge-table and apply brute-force tests)."""
    import re
    from collections import Counter

    words = Counter()
    for t in texts:
        words.update(w for w in re.split(r"\s+", t) if w != "")
    seqs = {w: list(w) for w in words}
    merges = []
    for step in range(1, k + 1):
        pairs = Counter()
        for w, seq in seqs.items():
            n = words[w]
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += n
        if not pairs:
            break
        (l, r), pn = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
        merges.append((step, l, r, pn))
    return words, seqs, merges


def test_bpe_apply_matches_bruteforce(spark):
    """Per-source token accounting recomputed from the textbook trainer —
    independent of the wrapped-string encoding AND the oracle chain."""
    import re

    from dataframe_expressions_spark.operators.tier7 import (
        text_token_bpe_apply,
    )

    got = {
        r["source"]: (r["n_docs"], r["n_chars"], r["ws_tokens"],
                      r["bpe_tokens"])
        for r in text_token_bpe_apply(spark, SF_SMOKE).collect()
    }

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, text, n_chars FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    _, seqs, _ = _bruteforce_bpe([t for _, t, _ in rows])
    exp = {}
    for src, text, n_chars in rows:
        toks = [w for w in re.split(r"\s+", text) if w != ""]
        d = exp.setdefault(src, [0, 0, 0, 0])
        d[0] += 1
        d[1] += n_chars
        d[2] += len(toks)
        d[3] += sum(len(seqs[w]) for w in toks)
    assert got == {k: tuple(v) for k, v in exp.items()}


def test_band_calibration_matches_bruteforce(spark):
    """Candidate/verified/missed counts per banding config recomputed in
    plain Python dict-buckets — independent of the join plans and the
    oracle's CTE simulation."""
    import re
    from collections import defaultdict

    from dataframe_expressions_spark.operators.tier7 import (
        _CAL_CONFIGS,
        _CAL_LANES,
        _CAL_P,
        _CAL_THRESHOLD,
        dedup_band_calibration,
    )

    got = {
        (r["bands"], r["rows_per_band"]): (
            r["n_candidates"], r["n_verified"], r["n_missed"])
        for r in dedup_band_calibration(spark, SF_SMOKE).collect()
    }

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    sh = {}
    for doc_id, text in rows:
        toks = [w for w in re.split(r"\s+", text) if w != ""]
        th = []
        for t in toks:
            h = 0
            for ch in t:
                h = (h * 31 + ord(ch)) % _CAL_P
            th.append(h)
        if len(th) < 3:
            continue
        sh[doc_id] = list(dict.fromkeys(
            ((th[i] * 31 + th[i + 1]) * 31 + th[i + 2]) % _CAL_P
            for i in range(len(th) - 2)
        ))
    sig = {}
    for doc_id, hs in sh.items():
        sig[doc_id] = [
            min(((2 * i + 1) * h + i * i) % _CAL_P for h in hs)
            for i in range(_CAL_LANES)
        ]
    cand = {}
    for bands, rws in _CAL_CONFIGS:
        buckets = defaultdict(list)
        for doc_id, s in sig.items():
            for b in range(bands):
                acc = 0
                for k in range(rws):
                    acc = (acc * 131 + s[b * rws + k]) % _CAL_P
                buckets[(b, acc)].append(doc_id)
        pairs = set()
        for ids in buckets.values():
            ids = sorted(ids)
            for i, a in enumerate(ids):
                for b2 in ids[i + 1:]:
                    pairs.add((a, b2))
        cand[(bands, rws)] = pairs
    pool = set().union(*cand.values())

    def jac(a, b):
        sa, sb = set(sh[a]), set(sh[b])
        return len(sa & sb) / len(sa | sb)

    ver = {p for p in pool if jac(*p) >= _CAL_THRESHOLD}
    exp = {
        cfg: (len(pairs), len(ver & pairs), len(ver - pairs))
        for cfg, pairs in cand.items()
    }
    assert got == exp
