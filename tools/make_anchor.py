"""Regenerate the committed quiet-machine bench anchor, hardened
against its own noise (round 12, r11 VERDICT item 6).

The r11 anchor shipped two values the driver bench later disproved
(`dedup_fuzzy_edit` 1.17 s vs 0.66 s, `tpch_q5_local_supplier` 1.85 s
vs 1.21 s — both >1.4x of their own r10 anchors): a single noisy sample
became the committed truth because the adaptive passes inside bench.py
only re-run ids that exceed the PREVIOUS anchor, and the final
statistic can still ship a one-sided outlier when later passes were
budget-dropped.  This script applies the same adaptive rule ONE LEVEL
UP, anchor-to-anchor:

1. refuse to start unless the machine is idle (1-min load < 0.5 — see
   the bench-contamination discipline: nothing else may run);
2. run ``bench.py`` (writes BENCH_DETAIL.json);
3. compare every fresh value against the newest COMMITTED anchor: any
   id above ``RERUN_RATIO`` (1.3x) of its previous anchor value gets
   extra in-process samples until it is multi-sampled, and its anchor
   value becomes the MIN over all samples — under strictly one-sided
   noise (CPU-steal bursts only ever ADD time) the minimum is the
   defensible quiet-machine cost, and it is exactly the statistic the
   r11 judge used to disprove the noisy entries;
4. write ``bench_anchor_r<N>.json``; the contract test
   (test_bench_anchor_covers_every_registered_id) then holds the file
   to full registry coverage.

HOST-DRIFT CANARY (round 13, r12 VERDICT item 7): the round-12 anchor
analysis burned real effort distinguishing a broad +12% host slowdown
from a code regression.  A FIXED 5-id canary block — one id per plan
family (scan+filter, shuffle agg, window, Arrow cogroup, streaming) —
now runs FIRST in every anchor session, 3 samples each, min taken, and
its median ratio against the previous anchor's canary is recorded in
the anchor JSON as ``canary.ratio_vs_prev``.  Reading rule (documented
in BASELINE.md): the canary ids' code never changes in a round unless
said so, so ``ratio_vs_prev`` IS the host-drift number — a round's
per-id anchor-to-anchor ratios are read DIVIDED by it; "host moved" is
one number instead of an investigation.

Usage:  python tools/make_anchor.py <round_number> [note]
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RERUN_RATIO = 1.3
EXTRA_SAMPLES = 2
MAX_LOAD = 0.5
# one id per plan family; changing this set breaks anchor-to-anchor
# canary comparability, so extend only by APPENDING and note the round
CANARY_IDS = (
    "filter_mask",          # parquet scan + pushed filter
    "agg_groupby",          # hash-partial shuffle aggregate
    "window_top_movers",    # window exchange + sort
    "grouped_map_pandas",   # Arrow worker-pool round trip
    "stream_tumbling",      # micro-batch streaming engine
)
CANARY_SAMPLES = 3


def _round_num(path: str) -> int:
    stem = os.path.basename(path).split("bench_anchor_r")[1]
    return int(stem.split(".")[0])


def _newest_committed_anchor() -> tuple[str, dict]:
    cands = glob.glob(os.path.join(REPO, "bench_anchor_r*.json"))
    if not cands:
        return "", {}
    best = max(cands, key=_round_num)
    with open(best) as fh:
        return os.path.basename(best), json.load(fh)


def _run_canary(prev_name: str, prev_anchor: dict) -> dict:
    """The host-drift canary: CANARY_IDS sampled CANARY_SAMPLES times
    each in a dedicated session (min taken — one-sided noise), ratioed
    per-id against the previous anchor's canary block (falling back to
    its main per-query values for anchors predating the canary)."""
    sys.path.insert(0, REPO)
    from dataframe_expressions_spark.operators.registry import load_all
    from dataframe_expressions_spark.session import get_spark

    spark = get_spark("anchor-canary")
    qs = load_all()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # UNTIMED warm-up pass first (one execution per canary id): the
    # canary session is cold — first-query JVM/codegen/pool/listing
    # costs would otherwise ride in the timed samples and read as
    # host drift against the warm-session numbers the ratio compares
    # to (the very first canary run showed filter_mask at 3.7x purely
    # from cold-start; the full bench's median ratio was 1.016)
    for q in CANARY_IDS:
        qs[q].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    vals: dict = {}
    for q in CANARY_IDS:
        samples = []
        for _ in range(CANARY_SAMPLES):
            t = time.perf_counter()
            qs[q].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t, 4))
        vals[q] = round(min(samples), 4)
        print(f"canary {q}: min {vals[q]} over {sorted(samples)}")
    spark.stop()
    prev_can = (prev_anchor.get("canary") or {}).get("queries") or {}
    basis = f"canary block of {prev_name}"
    if not prev_can:
        prev_can = prev_anchor.get("queries") or {}
        basis = f"main per-query values of {prev_name} (pre-canary anchor)"
    per_id = {
        q: round(vals[q] / prev_can[q], 3)
        for q in CANARY_IDS
        if prev_can.get(q)
    }
    ratio = round(statistics.median(per_id.values()), 3) if per_id else None
    out = {
        "ids": list(CANARY_IDS),
        "queries": vals,
        "per_id_ratio": per_id,
        "ratio_vs_prev": ratio,
        "basis": basis if per_id else "no previous anchor",
    }
    print(f"canary ratio vs prev: {ratio} (per-id {per_id})")
    return out


def _await_idle(max_wait: float = 180.0) -> bool:
    """Let the canary session's load drain before bench.py starts —
    the bench-contamination rule applies to our own canary too.
    Returns False (caller ABORTS) if the host is still loaded after
    ``max_wait``: proceeding would commit a contaminated anchor whose
    canary block then poisons every future round's host-drift
    denominator (round-13 review — same hard gate as startup)."""
    t0 = time.time()
    while os.getloadavg()[0] >= MAX_LOAD and time.time() - t0 < max_wait:
        time.sleep(5)
    return os.getloadavg()[0] < MAX_LOAD


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    round_n = int(sys.argv[1])
    note_extra = sys.argv[2] if len(sys.argv) > 2 else ""
    load1 = os.getloadavg()[0]
    if load1 >= MAX_LOAD:
        print(
            f"REFUSING: load1 {load1:.2f} >= {MAX_LOAD} — anchors must "
            "be generated on a strictly idle machine"
        )
        return 1
    prev_name, prev_anchor = _newest_committed_anchor()
    prev = prev_anchor.get("queries", {})
    t0 = time.time()
    canary = _run_canary(prev_name, prev_anchor)
    if not _await_idle():
        print(
            f"REFUSING: load1 {os.getloadavg()[0]:.2f} still >= "
            f"{MAX_LOAD} after the canary drain window — aborting "
            "before bench.py (a contaminated anchor would poison the "
            "canary denominator for every future round)"
        )
        return 1
    subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                   check=True, cwd=REPO)
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
        detail = json.load(fh)
    timings = dict(detail["queries"])
    runs = {q: list(s) for q, s in detail.get("runs", {}).items()}

    flagged = sorted(
        q
        for q, v in timings.items()
        if q in prev and prev[q] > 0 and v > RERUN_RATIO * prev[q]
    )
    if flagged:
        print(f"anchor-to-anchor outliers vs {prev_name}: {flagged}")
        sys.path.insert(0, REPO)
        from dataframe_expressions_spark.operators.registry import (
            load_all,
        )
        from dataframe_expressions_spark.session import get_spark

        spark = get_spark("anchor-rerun")
        qs = load_all()
        sf_dir = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        for q in flagged:
            need = max(0, EXTRA_SAMPLES - max(0, len(runs.get(q, [])) - 1))
            for _ in range(need + 1):
                t = time.perf_counter()
                # identical statistic to bench.py's _run_one: noop sink
                # (JVM-side full evaluation, no Python driver transfer)
                # — a collect() here would mix incomparable samples and
                # mis-flag large-result queries forever (round-12
                # review)
                qs[q].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.setdefault(q, []).append(
                    round(time.perf_counter() - t, 4)
                )
            new_v = round(min(runs[q]), 4)
            print(
                f"  {q}: {timings[q]} -> {new_v} "
                f"(samples {sorted(runs[q])}, prev anchor {prev[q]})"
            )
            timings[q] = new_v
        spark.stop()
        still = sorted(
            q
            for q in flagged
            if prev.get(q, 0) > 0 and timings[q] > 1.4 * prev[q]
        )
        if still:
            print(
                f"NOTE: {still} remain >1.4x of their previous anchor "
                "after multi-sampling — treat as REAL regressions, not "
                "noise (each value is now the min over >=3 samples)"
            )
    anchor = {
        "canary": canary,
        "load1_at_start": detail.get("load1_at_start", round(load1, 2)),
        "note": (
            f"round-{round_n} full-protocol anchor via tools/"
            f"make_anchor.py: bench.py over all {len(timings)} "
            f"registered queries at sf{detail.get('sf')} on an idle "
            f"machine; anchor-to-anchor outliers (> {RERUN_RATIO}x of "
            f"{prev_name or 'none'}) re-sampled in-process and "
            f"anchored at their min ({len(flagged)} flagged); canary "
            f"host-drift ratio vs prev = {canary.get('ratio_vs_prev')} "
            "(read per-id ratios divided by it — BASELINE.md rule). "
            + note_extra
        ).strip(),
        "passes_completed": detail.get("passes_completed"),
        "queries": timings,
        "sf": detail.get("sf"),
    }
    out = os.path.join(REPO, f"bench_anchor_r{round_n:02d}.json")
    with open(out, "w") as fh:
        json.dump(anchor, fh, indent=1, sort_keys=True)
    print(
        f"wrote {out}: {len(timings)} ids, total "
        f"{round(sum(timings.values()), 1)} s, wall {round(time.time() - t0)} s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
