"""Independent brute-force references for tier-8 operators whose DuckDB
oracles mirror the SAME algorithm (greedy MMR chain, wedge joins,
fingerprint weighting, ntile bucketing, stage-anchored funnel) — a
shared-structure bug would pass parity, so these recompute the answer a
different way in plain Python (the test_property_tier7 discipline)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from conftest import SF_SMOKE


def _docs(con=None):
    con = con or duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text, source FROM '{SF_SMOKE}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()


def test_rank_mmr_matches_bruteforce(spark):
    """Operator runs the greedy loop in one applyInPandas group over
    JVM-prerounded inputs; reference recomputes pool, pairwise sims and
    the greedy argmax chain with plain Python floats."""
    from dataframe_expressions_spark.operators.tier8 import (
        _MMR_K,
        _MMR_LAMBDA,
        _MMR_POOL,
        rank_mmr,
    )

    got = {
        r["rk"]: (r["vid"], r["rel"], r["max_sim_sel"], r["mmr_score"])
        for r in rank_mmr(spark, SF_SMOKE).collect()
    }

    con = duckdb.connect()
    vecs = {
        vid: v
        for vid, v in con.execute(
            "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
            f" FROM '{SF_SMOKE}/embeddings.parquet'"
        ).fetchall()
        if sum(x * x for x in v) > 0
    }
    q = vecs[0]

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return round(
            num
            / (
                math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(y * y for y in b))
            ),
            4,
        )

    rel = {vid: cos(q, v) for vid, v in vecs.items() if vid != 0}
    pool = sorted(rel, key=lambda vid: (-rel[vid], vid))[:_MMR_POOL]
    sim = {
        (a, b): cos(vecs[a], vecs[b]) for a in pool for b in pool if a != b
    }
    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 10)
    selected, remaining = [], set(pool)
    for rk in range(1, _MMR_K + 1):
        best = None
        for vid in sorted(remaining):
            ms = max((sim[(vid, s)] for s in selected), default=0.0)
            score = lam * rel[vid] - mu * ms
            if best is None or (-score, vid) < (-best[3], best[0]):
                best = (vid, rel[vid], ms, score)
        vid, r, ms, score = best
        selected.append(vid)
        remaining.discard(vid)
        assert got[rk] == (vid, r, round(ms, 4), round(score, 6)), (
            rk,
            got[rk],
            (vid, r, ms, score),
        )
    assert len(got) == _MMR_K


def test_common_neighbors_matches_bruteforce(spark):
    """Operator scores via wedge self-joins; reference intersects
    Python neighbor sets for every non-edge pair."""
    from dataframe_expressions_spark.operators.tier8 import (
        _LP_TOPK,
        graph_common_neighbors,
    )

    got = [
        (r["rk"], r["u"], r["w"], r["common_neighbors"], r["jaccard_ppm"])
        for r in graph_common_neighbors(spark, SF_SMOKE).collect()
    ]

    con = duckdb.connect()
    pairs = set(
        con.execute(
            f"""
            SELECT DISTINCT least(o_custkey % 4096, o_orderkey % 4096),
                            greatest(o_custkey % 4096, o_orderkey % 4096)
            FROM '{SF_SMOKE}/orders.parquet'
            WHERE o_custkey % 4096 <> o_orderkey % 4096
            """
        ).fetchall()
    )
    adj = defaultdict(set)
    for lo, hi in pairs:
        adj[lo].add(hi)
        adj[hi].add(lo)
    scored = []
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for w in nodes[i + 1:]:
            if (u, w) in pairs:
                continue
            c = len(adj[u] & adj[w])
            if c == 0:
                continue
            jp = math.floor(1000000.0 * c / (len(adj[u]) + len(adj[w]) - c))
            scored.append((-jp, u, w, c))
    scored.sort()
    want = [
        (rk + 1, u, w, c, -njp)
        for rk, (njp, u, w, c) in enumerate(scored[:_LP_TOPK])
    ]
    assert got == want


def test_softdedup_matches_bruteforce(spark):
    """Operator weights via the fingerprint rollup; reference groups by
    the raw TEXT itself (different cluster key derivation — catches a
    fingerprint collision or a fingerprint-expression bug)."""
    from dataframe_expressions_spark.operators.tier8 import (
        sample_importance_softdedup,
    )

    got = {
        r["source"]: (r["n_docs"], r["n_clusters"], r["total_weight_ppm"])
        for r in sample_importance_softdedup(spark, SF_SMOKE).collect()
    }

    by_text = Counter(t for _, t, _ in _docs())
    per_source = defaultdict(lambda: [0, set(), 0])
    for _, text, source in _docs():
        st = per_source[source]
        st[0] += 1
        st[1].add(text)
        st[2] += math.floor(1000000.0 / by_text[text])
    want = {s: (n, len(c), w) for s, (n, c, w) in per_source.items()}
    assert got == want


def test_perplexity_bucket_matches_bruteforce(spark):
    """Operator buckets via ntile; reference computes surprisal sums and
    SQL-ntile sizing (first n%b buckets take the extra row) in Python."""
    from dataframe_expressions_spark.operators.tier8 import (
        _PPL_BUCKETS,
        text_perplexity_bucket,
    )

    got = {
        r["bucket"]: (r["n_docs"], r["n_tokens"], r["sum_surprisal"])
        for r in text_perplexity_bucket(spark, SF_SMOKE).collect()
    }

    toks = {d: t.split() for d, t, _ in _docs()}
    toks = {d: tk for d, tk in toks.items() if tk}
    vocab = Counter(t for tk in toks.values() for t in tk)
    total = sum(vocab.values())
    srp = {t: round(math.log(total) - math.log(n), 6) for t, n in vocab.items()}
    docs = []
    for d, tk in toks.items():
        s = round(sum(srp[t] for t in tk), 6)  # decimal fold is exact
        docs.append((s / len(tk), d, len(tk), s))
    docs.sort(key=lambda x: (x[0], x[1]))
    n, b = len(docs), _PPL_BUCKETS
    base, extra = divmod(n, b)
    want, i = {}, 0
    for bucket in range(1, b + 1):
        size = base + (1 if bucket <= extra else 0)
        chunk = docs[i : i + size]
        i += size
        want[bucket] = (
            len(chunk),
            sum(c[2] for c in chunk),
            round(sum(c[3] for c in chunk), 6),
        )
    assert set(got) == set(want)
    for bucket in want:
        g, w = got[bucket], want[bucket]
        assert g[0] == w[0] and g[1] == w[1], (bucket, g, w)
        assert abs(g[2] - w[2]) < 1e-6, (bucket, g, w)


def test_funnel_time_bounded_matches_bruteforce(spark):
    """Operator anchors stages via joins; reference walks each user's
    event list in Python."""
    from dataframe_expressions_spark.operators.tier8 import (
        _FUNNEL_WINDOW_US,
        funnel_time_bounded,
    )

    row = funnel_time_bounded(spark, SF_SMOKE).collect()[0]

    con = duckdb.connect()
    evs = con.execute(
        f"""
        SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM '{SF_SMOKE}/events.parquet'
        """
    ).fetchall()
    by_user = defaultdict(list)
    for u, et, us in evs:
        by_user[u].append((et, us))
    n_view = n_click = n_purch = lat_vc = lat_cp = 0
    for u, es in by_user.items():
        views = [us for et, us in es if et == "view"]
        if not views:
            continue
        n_view += 1
        t1 = min(views)
        clicks = [
            us
            for et, us in es
            if et == "click" and t1 <= us <= t1 + _FUNNEL_WINDOW_US
        ]
        if not clicks:
            continue
        n_click += 1
        t2 = min(clicks)
        lat_vc += t2 - t1
        purchases = [
            us
            for et, us in es
            if et == "purchase" and t2 <= us <= t2 + _FUNNEL_WINDOW_US
        ]
        if not purchases:
            continue
        n_purch += 1
        lat_cp += min(purchases) - t2
    assert row["n_view"] == n_view
    assert row["n_click"] == n_click
    assert row["n_purchase"] == n_purch
    assert row["click_rate"] == round(n_click / n_view, 6)
    assert row["avg_view_to_click_s"] == round(lat_vc / n_click / 1e6, 6)


def test_line_dedup_matches_bruteforce(spark):
    """Operator drops boilerplate via fingerprint rollups; reference
    chunks and counts with raw CHUNK STRINGS as the identity."""
    from dataframe_expressions_spark.operators.tier8 import (
        _LINE_CHUNK,
        _LINE_MIN_DOCS,
        text_line_dedup,
    )

    got = {
        r["source"]: (
            r["n_docs"],
            r["n_chunks"],
            r["n_dropped"],
            r["tokens_kept"],
        )
        for r in text_line_dedup(spark, SF_SMOKE).collect()
    }

    chunk_docs = defaultdict(set)
    rows = []
    for d, text, source in _docs():
        tk = text.split()
        for i in range(0, len(tk), _LINE_CHUNK):
            chunk = " ".join(tk[i : i + _LINE_CHUNK])
            chunk_docs[chunk].add(d)
            rows.append((source, d, chunk, len(tk[i : i + _LINE_CHUNK])))
    common = {c for c, ds in chunk_docs.items() if len(ds) >= _LINE_MIN_DOCS}
    per_source = defaultdict(lambda: [set(), 0, 0, 0])
    for source, d, chunk, cnt in rows:
        st = per_source[source]
        st[0].add(d)
        st[1] += 1
        if chunk in common:
            st[2] += 1
        else:
            st[3] += cnt
    # n_docs counts ALL docs of the source (empty ones too)
    all_docs = Counter(s for _, _, s in _docs())
    want = {
        s: (all_docs[s], st[1], st[2], st[3]) for s, st in per_source.items()
    }
    assert got == want


def test_xi_correlation_matches_bruteforce(spark):
    """Operator builds ranks via two window passes; reference sorts each
    priority group twice in Python and walks the rank sequence."""
    from dataframe_expressions_spark.operators.tier8 import (
        stats_xi_correlation,
    )

    got = {
        r["grp"]: (r["n"], r["sdiff"], r["xi"])
        for r in stats_xi_correlation(spark, SF_SMOKE).collect()
    }

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT o_orderpriority, o_orderkey,
               datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)),
               o_totalprice
        FROM '{SF_SMOKE}/orders.parquet'
        """
    ).fetchall()
    groups = defaultdict(list)
    for grp, ok, xd, y in rows:
        groups[grp].append((ok, xd, y))
    want = {}
    for grp, g in groups.items():
        # y-rank with (y, orderkey) tie-break
        by_y = sorted(g, key=lambda t: (t[2], t[0]))
        rank = {t[0]: i + 1 for i, t in enumerate(by_y)}
        # walk in (x, orderkey) order
        by_x = sorted(g, key=lambda t: (t[1], t[0]))
        seq = [rank[t[0]] for t in by_x]
        sdiff = sum(abs(b - a) for a, b in zip(seq, seq[1:]))
        n = len(g)
        want[grp] = (n, sdiff, round(1.0 - 3.0 * sdiff / (float(n) * n - 1), 6))
    assert got == want


def test_temporal_split_matches_bruteforce(spark):
    """Operator folds via one conditional-aggregate pass; reference
    filters the day list per fold in Python."""
    from dataframe_expressions_spark.operators.tier8 import (
        _TS_EMBARGO_DAYS,
        _TS_FOLDS,
        data_temporal_split,
    )

    got = {
        r["fold"]: (
            r["train_end"], r["test_start"], r["test_end"],
            r["train_n"], r["test_n"], r["embargoed_n"],
            r["max_train_day"], r["min_test_day"],
        )
        for r in data_temporal_split(spark, SF_SMOKE).collect()
    }

    con = duckdb.connect()
    days = [
        d
        for (d,) in con.execute(
            "SELECT datediff('day', DATE '1995-01-01', "
            f"CAST(o_orderdate AS DATE)) FROM '{SF_SMOKE}/orders.parquet'"
        ).fetchall()
    ]
    d0, d1 = min(days), max(days)
    seg = (d1 - d0) // (_TS_FOLDS + 1)
    want = {}
    for fold in range(1, _TS_FOLDS + 1):
        te = d0 + fold * seg
        ts_ = te + _TS_EMBARGO_DAYS
        tend = d0 + (fold + 1) * seg
        train = [d for d in days if d < te]
        test = [d for d in days if ts_ <= d < tend]
        emb = [d for d in days if te <= d < ts_]
        want[fold] = (
            te, ts_, tend, len(train), len(test), len(emb),
            max(train) if train else None,
            min(test) if test else None,
        )
        # protocol invariant: the embargo actually held
        if train and test:
            assert min(test) - max(train) >= _TS_EMBARGO_DAYS
    assert got == want


def test_bootstrap_ci_matches_bruteforce(spark):
    """Operator folds Poisson weights via conditional aggregates;
    reference recomputes the LCG weights and replicate means row by row
    in Python (exact ints + Decimal sums)."""
    from decimal import Decimal

    from dataframe_expressions_spark.operators.tier8 import (
        _BOOT_B,
        _POIS_CDF,
        stats_bootstrap_ci,
    )

    row = stats_bootstrap_ci(spark, SF_SMOKE).collect()[0]

    con = duckdb.connect()
    data = con.execute(
        "SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(38,6)) "
        f"FROM '{SF_SMOKE}/orders.parquet'"
    ).fetchall()
    cdf = [float(t) for t in _POIS_CDF]
    means = []
    for b in range(_BOOT_B):
        sw, swx = 0, Decimal(0)
        for ok, x in data:
            u = (((ok * _BOOT_B + b) % 2147483647) * 1103515245 + 12345) \
                % 2147483647 / 2147483647.0
            wt = 5
            for k, t in enumerate(cdf):
                if u < t:
                    wt = k
                    break
            sw += wt
            swx += wt * x
        means.append((round(float(swx) / float(sw), 6), b))
    means.sort()
    ms = [m for m, _ in means]
    assert row["n_rows"] == len(data)
    assert row["n_reps"] == _BOOT_B
    assert abs(row["ci_lo"] - ms[1]) < 1e-9
    assert abs(row["ci_hi"] - ms[_BOOT_B - 2]) < 1e-9
    sm = sum(Decimal(str(m)) for m in ms)
    sm2 = sum(Decimal(str(m)) * Decimal(str(m)) for m in ms)
    se = math.sqrt(
        (_BOOT_B * float(sm2) - float(sm) * float(sm))
        / (_BOOT_B * (_BOOT_B - 1))
    )
    assert abs(row["boot_se"] - round(se, 6)) < 2e-6
    point = sum(x for _, x in data)
    assert abs(row["point_est"] - round(float(point) / len(data), 6)) < 1e-9


def test_seasonal_decompose_matches_bruteforce(spark):
    """Operator decomposes via windows; reference walks the daily series
    in Python (list-slice moving average, dict-of-dow means)."""
    import datetime as dt

    from dataframe_expressions_spark.operators.tier8 import (
        _MONDAY_EPOCH,
        stats_seasonal_decompose,
    )

    got = {
        r["dow"]: (r["n_obs"], r["seasonal_idx"])
        for r in stats_seasonal_decompose(spark, SF_SMOKE).collect()
    }

    con = duckdb.connect()
    daily = con.execute(
        "SELECT CAST(ts AS DATE) AS day, count(*) FROM "
        f"'{SF_SMOKE}/events.parquet' GROUP BY 1 ORDER BY day"
    ).fetchall()
    anchor = dt.date.fromisoformat(_MONDAY_EPOCH)
    xs = [x for _, x in daily]
    by_dow = defaultdict(list)
    for i, (day, x) in enumerate(daily):
        lo, hi = i - 3, i + 4
        if lo < 0 or hi > len(daily):
            continue
        trend = sum(xs[lo:hi]) / 7.0
        dow = ((day - anchor).days % 7 + 7) % 7
        by_dow[dow].append(round(x - trend, 6))
    raw = {
        dow: (len(v), round(sum(v) / len(v), 6)) for dow, v in by_dow.items()
    }
    g = round(sum(s for _, s in raw.values()) / 7.0, 6)
    assert set(got) == set(raw)
    for dow, (n, s) in raw.items():
        assert got[dow][0] == n
        assert abs(got[dow][1] - round(s - g, 6)) < 2e-6, (dow, got[dow], s, g)


def test_xi_two_phase_rank_path_identical(spark):
    """The range-partitioned rank fallback (functions/ranks.py
    two_phase_rank; r7 VERDICT item 4 made it code, not prose) must be
    row-identical to the native window path — cut placement moves work
    between buckets, never ranks across them — and the generic primitive
    must agree with row_number on a skewed, tie-heavy frame."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from dataframe_expressions_spark.functions.ranks import two_phase_rank
    from dataframe_expressions_spark.operators.tier8 import _xi_correlation

    native = sorted(
        tuple(r) for r in _xi_correlation(spark, SF_SMOKE, two_phase=False).collect()
    )
    fallback = sorted(
        tuple(r) for r in _xi_correlation(spark, SF_SMOKE, two_phase=True).collect()
    )
    assert native == fallback and len(native) > 0

    # adversarial primitive check: 2 groups, heavy key ties (key = id%7,
    # so every quantile cut lands ON a tie run), unique tie-break
    df = spark.range(2000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 7).cast("long").alias("k"),
        F.col("id").alias("t"),
    )
    want = df.select(
        "g",
        "t",
        F.row_number().over(W.partitionBy("g").orderBy("k", "t")).alias("r"),
    )
    got = two_phase_rank(df, ["g"], "k", "t", "r", n_buckets=8).select(
        "g", "t", "r"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_common_neighbors_sampled_matches_bruteforce(spark):
    """Operator builds the sample with a window rank and the estimate
    with a DECIMAL wedge fold; reference recomputes the whole thing —
    graph, exact top-20, LCG neighbor sample, Horvitz–Thompson weights,
    clamped ppm — with Python dicts and floats."""
    from dataframe_expressions_spark.operators.tier8 import (
        _LP_SAMPLE,
        _LP_TOPK,
        graph_common_neighbors_sampled,
    )

    got = [tuple(r) for r in graph_common_neighbors_sampled(spark, SF_SMOKE).collect()]

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_custkey % 4096, o_orderkey % 4096 FROM '{SF_SMOKE}/orders.parquet'"
    ).fetchall()
    edges = {
        (min(a, b), max(a, b)) for a, b in rows if a != b
    }
    adj = defaultdict(set)
    for lo, hi in edges:
        adj[lo].add(hi)
        adj[hi].add(lo)
    # exact common neighbors over non-edges
    cn = Counter()
    for s, ns in adj.items():
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for w in ns_sorted[i + 1 :]:
                cn[(u, w)] += 1
    sc = []
    for (u, w), c in cn.items():
        if (u, w) in edges:
            continue
        du, dw = len(adj[u]), len(adj[w])
        jp = math.floor(1000000.0 * c / (du + dw - c))
        sc.append((-jp, u, w, c, du, dw, jp))
    sc.sort()
    topk = sc[:_LP_TOPK]
    # LCG neighbor sample per center + HT estimate
    sample = {}
    for s, ns in adj.items():
        ranked = sorted(
            ns, key=lambda d: (((s * 8191 + d) * 1103515245 + 12345) % 2147483647, d)
        )
        sample[s] = set(ranked[:_LP_SAMPLE])
    # accumulate in exact 1e-6 units — the operator's DECIMAL(38,6) fold
    # is exact, so the reference must be too (a float += chain can drift
    # in the last ulp and flake the 6dp compare)
    est = defaultdict(int)
    for s, ns in adj.items():
        dg = len(ns)
        if dg < 2:
            continue
        ss = min(dg, _LP_SAMPLE)
        wgt_u = int(round(round(dg * (dg - 1) / (ss * (ss - 1)), 6) * 1e6))
        smp = sorted(sample[s])
        for i, u in enumerate(smp):
            for w in smp[i + 1 :]:
                est[(u, w)] += wgt_u
    want = []
    for rk, (_, u, w, c, du, dw, jp) in enumerate(topk, start=1):
        ce = round(est.get((u, w), 0) / 1e6, 6)
        ej = int(
            min(math.floor(1000000.0 * ce / max(du + dw - ce, 1.0)), 1000000.0)
        )
        want.append((rk, u, w, c, jp, ce, ej, abs(jp - ej)))
    assert sorted(got) == sorted(want)


def test_ols_trend_matches_bruteforce(spark):
    """Operator folds BIGINT moments in one aggregate; reference
    recomputes them row-by-row in Python and re-derives the fit."""
    from dataframe_expressions_spark.operators.tier8 import stats_ols_trend

    got = [tuple(r) for r in stats_ols_trend(spark, SF_SMOKE).collect()]
    assert len(got) == 1

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT datediff('day', DATE '1995-01-01', CAST(ts AS DATE)), "
        f"count(*) FROM '{SF_SMOKE}/events.parquet' GROUP BY 1"
    ).fetchall()
    n = len(rows)
    sx = sum(x for x, _ in rows)
    sy = sum(y for _, y in rows)
    sxy = sum(x * y for x, y in rows)
    sxx = sum(x * x for x, _ in rows)
    syy = sum(y * y for _, y in rows)
    num = float(n * sxy - sx * sy)
    denx = float(n) * sxx - float(sx) * sx
    deny = float(n) * syy - float(sy) * sy
    slope = num / denx
    want = (
        n, sx, sy, sxy, sxx, syy,
        slope, (sy - slope * sx) / n, num * num / (denx * deny),
    )
    assert got[0] == want


def test_langid_confusion_matches_bruteforce(spark):
    """Operator shares the staged stopword-vote predictor with
    text_lang_id; reference recomputes the vote, the argmax chain and
    the confusion rollup in plain Python over the raw parquet."""
    from dataframe_expressions_spark.operators.tier3 import (
        dq_langid_confusion,
    )

    got = {
        (r["lang_true"], r["pred_lang"]): (r["n_docs"], r["share_ppm"])
        for r in dq_langid_confusion(spark, SF_SMOKE).collect()
    }

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT lang, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    votes = {
        "en": {"the", "and", "of", "to", "a"},
        "de": {"der", "die", "und", "das", "ist"},
        "es": {"el", "la", "de", "que", "y"},
    }
    cells = Counter()
    for lang, text in rows:
        toks = text.split()
        s = {k: sum(t in v for t in toks) for k, v in votes.items()}
        if s["en"] >= s["de"] and s["en"] >= s["es"] and s["en"] > 0:
            pred = "en"
        elif s["de"] >= s["es"] and s["de"] > 0:
            pred = "de"
        elif s["es"] > 0:
            pred = "es"
        else:
            pred = "unknown"
        cells[(lang, pred)] += 1
    tot = Counter()
    for (lang, _), n in cells.items():
        tot[lang] += n
    want = {
        k: (n, math.floor(1000000.0 * n / tot[k[0]]))
        for k, n in cells.items()
    }
    assert got == want and len(got) > 0


def test_perplexity_two_phase_path_identical(spark):
    """text_perplexity_bucket's range-partitioned fallback (two_phase_rank
    + SQL-ntile sizing arithmetic) must be row-identical to the native
    ntile window — the second consumer of the round-8 fallback pattern
    (stats_xi_correlation is the first)."""
    from dataframe_expressions_spark.operators.tier8 import (
        _perplexity_bucket,
    )

    native = sorted(
        tuple(r) for r in _perplexity_bucket(spark, SF_SMOKE, two_phase=False).collect()
    )
    fallback = sorted(
        tuple(r) for r in _perplexity_bucket(spark, SF_SMOKE, two_phase=True).collect()
    )
    assert native == fallback and len(native) > 0


def test_autocorr_lag_matches_bruteforce(spark):
    """stats_autocorr_lag (tier 7) computes Pearson acf at lags 1 and 7
    from DECIMAL-folded moment sums; reference recomputes each lag's
    correlation in plain Python floats over the (y_d, y_{d+k}) pair
    lists — a shared moment-algebra bug would pass the DuckDB parity
    (which mirrors the same algebra) but not this.  (Round 9: this test
    was written for a tier-8 re-implementation that turned out to
    shadow this operator; the duplicate was deleted and the independent
    reference kept, pointed at the original.)"""
    from dataframe_expressions_spark.operators.tier7 import stats_autocorr_lag

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(ts AS DATE) AS d, count(*) FROM "
        f"'{SF_SMOKE}/events.parquet' GROUP BY 1"
    ).fetchall()
    y = {d.toordinal(): n for d, n in rows}

    def ref_acf(k):
        pairs = [(y[d], y[d + k]) for d in y if d + k in y]
        n = len(pairs)
        if n < 2:
            return None
        ma = sum(a for a, _ in pairs) / n
        mb = sum(b for _, b in pairs) / n
        va = sum((a - ma) ** 2 for a, _ in pairs)
        vb = sum((b - mb) ** 2 for _, b in pairs)
        if va <= 0 or vb <= 0:
            return None
        cov = sum((a - ma) * (b - mb) for a, b in pairs)
        return cov / math.sqrt(va * vb)

    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in stats_autocorr_lag(spark, SF_SMOKE).collect()
    }
    assert sorted(got) == [1, 7]
    for k in (1, 7):
        n_pairs, acf = got[k]
        ref = ref_acf(k)
        assert n_pairs == sum(1 for d in y if d + k in y)
        if ref is None:
            assert acf is None, k
        else:
            # operator rounds acf to 6dp
            assert acf is not None and abs(acf - round(ref, 6)) < 2e-6, (
                k, acf, ref,
            )


def test_zipf_audit_matches_bruteforce(spark):
    """Operator fits ln f ~ ln rk through rounded DECIMAL-folded moments;
    reference tokenizes in Python, ranks with the same (freq DESC, term)
    tie-break, and fits with plain unrounded least squares — slopes must
    agree to well inside the 6dp rounding envelope."""
    from dataframe_expressions_spark.operators.tier8 import (
        _ZIPF_TOP,
        text_zipf_audit,
    )

    freq = Counter()
    for _, text, _ in _docs():
        freq.update(t for t in text.split() if t != "")
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:_ZIPF_TOP]
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(f) for _, f in ranked]
    n = len(ranked)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    den = n * sxx - sx * sx
    ref_slope = (n * sxy - sx * sy) / den
    ref_icpt = (sy - ref_slope * sx) / n

    row = text_zipf_audit(spark, SF_SMOKE).collect()[0]
    assert row["n_terms"] == n
    assert row["top_term"] == ranked[0][0]
    assert row["top_freq"] == ranked[0][1]
    # per-term 6dp rounding perturbs each moment by <= 5e-7; propagated
    # through the fit that stays far under 1e-4 on a 31-term head
    assert abs(row["zipf_slope"] - ref_slope) < 1e-4
    assert abs(row["zipf_intercept"] - ref_icpt) < 1e-4
