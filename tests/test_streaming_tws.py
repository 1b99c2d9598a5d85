"""The transformWithStateInPandas branch of ``tws_user_summary``
(streaming/windows.py) is environment-gated: its protobuf state-server
protocol can't run in a container without ``google.protobuf``, so only
the applyInPandasWithState fallback gets exercised by oracle parity
here.  Per the r4 advisor note, BOTH arms need verification:

- ``test_processor_logic_*`` drive the hoisted ``UserSummary``
  processor's handleInputRows directly against a fake ValueState —
  protobuf-free, so the tuple shapes the advisor flagged (ValueState
  get/update) are checked in THIS container on every pytest run.
- ``test_tws_branch_end_to_end`` runs the real TWS streaming branch and
  is skipped unless protobuf exists (CI job / equipped host).
"""

from __future__ import annotations

import importlib.util

import pandas as pd
import pytest

from dataframe_expressions_spark.streaming.windows import (
    make_tws_user_summary,
)


def _has_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


class FakeValueState:
    """Mimics pyspark's ValueState surface: exists()/get()/update().

    get() returns the stored row as a tuple and update() takes a tuple
    matching the declared state schema — the exact contract the
    processor's ``(n, vmin, vmax)`` packing must satisfy."""

    def __init__(self) -> None:
        self._v = None

    def exists(self) -> bool:
        return self._v is not None

    def get(self):
        return self._v

    def update(self, value) -> None:
        assert isinstance(value, tuple), (
            f"ValueState.update must receive a tuple, got {type(value)}"
        )
        assert len(value) == 3, f"state schema has 3 fields, got {len(value)}"
        self._v = value


class FakeHandle:
    def __init__(self) -> None:
        self.states: dict[str, FakeValueState] = {}

    def getValueState(self, name: str, schema) -> FakeValueState:
        return self.states.setdefault(name, FakeValueState())


def _make_inited():
    cls, out_schema = make_tws_user_summary()
    proc = cls()
    handle = FakeHandle()
    proc.init(handle)
    return proc, handle, out_schema


def test_processor_logic_first_batch():
    proc, handle, out_schema = _make_inited()
    rows = [pd.DataFrame({"user_id": [7, 7], "value": [2.0, 5.0]})]
    out = pd.concat(list(proc.handleInputRows((7,), iter(rows), None)))
    assert out.to_dict("records") == [
        {"user_id": 7, "n": 2, "vmin": 2.0, "vmax": 5.0}
    ]
    assert handle.states["agg"].get() == (2, 2.0, 5.0)
    assert [f.name for f in out_schema.fields] == list(out.columns)


def test_processor_logic_accumulates_across_batches():
    proc, handle, _ = _make_inited()
    list(proc.handleInputRows((1,), iter([pd.DataFrame({"value": [3.0]})]), None))
    out = pd.concat(
        list(
            proc.handleInputRows(
                (1,), iter([pd.DataFrame({"value": [9.0, 1.0]})]), None
            )
        )
    )
    # second call must READ state back through get() and fold onto it
    assert out.to_dict("records") == [
        {"user_id": 1, "n": 3, "vmin": 1.0, "vmax": 9.0}
    ]
    assert handle.states["agg"].get() == (3, 1.0, 9.0)


def test_processor_logic_multiple_chunks_one_call():
    proc, _, _ = _make_inited()
    chunks = [
        pd.DataFrame({"value": [4.0, 6.0]}),
        pd.DataFrame({"value": [0.5]}),
    ]
    out = pd.concat(list(proc.handleInputRows((2,), iter(chunks), None)))
    assert out.to_dict("records") == [
        {"user_id": 2, "n": 3, "vmin": 0.5, "vmax": 6.0}
    ]


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs google.protobuf "
    "(state-server protocol); fallback arm is covered by oracle parity",
)
def test_tws_branch_end_to_end(spark):
    from conftest import SF_SMOKE

    from dataframe_expressions_spark.streaming.windows import tws_user_summary

    out = tws_user_summary(spark, SF_SMOKE)
    pdf = out.toPandas()
    assert len(pdf) > 0
    assert set(pdf.columns) == {"user_id", "n", "vmin", "vmax"}
    assert (pdf["n"] > 0).all()
    assert (pdf["vmin"] <= pdf["vmax"]).all()
