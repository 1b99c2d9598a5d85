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
