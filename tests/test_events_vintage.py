"""events.ts schema-drift tolerance (VERDICT r2 item 4).

The driver regenerated testdata between rounds with a different parquet
physical type for ``events.ts`` (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)),
which broke a loader hard-coded to one vintage.  These tests write the
same logical rows in three vintages and assert ``load_table`` normalizes
all of them to identical TIMESTAMP_NTZ values — the way a 100 TB lake
reader must tolerate schema-evolved partitions.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dataframe_expressions_spark.sources.tables import epoch_us, load_table

# Wall-clock instants (naive UTC) incl. a sub-second component that
# exercises ns→us truncation.
_TS = [
    dt.datetime(2024, 1, 1, 0, 0, 0, 0),
    dt.datetime(2024, 6, 15, 12, 30, 45, 123456),
    dt.datetime(2025, 12, 31, 23, 59, 59, 999999),
]
_ROWS = {
    "event_id": [1, 2, 3],
    "user_id": [10, 20, 30],
    "event_type": ["view", "click", "purchase"],
    "value": [1.0, 2.0, 3.0],
    "props": ["{}", "{}", "{}"],
}


def _write_events(tmp_path, ts_type) -> str:
    ts = pa.array(_TS, type=ts_type)
    table = pa.table({**{k: pa.array(v) for k, v in _ROWS.items()}, "ts": ts})
    d = tmp_path / ts_type.unit / (ts_type.tz or "ntz")
    d.mkdir(parents=True)
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "ts_type",
    [pa.timestamp("ns"), pa.timestamp("us"), pa.timestamp("us", tz="UTC")],
    ids=["nanos-as-long", "micros-ntz", "micros-utc-ltz"],
)
def test_vintage_normalizes_to_ntz(spark, tmp_path, ts_type):
    sf_dir = _write_events(tmp_path, ts_type)
    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    got = [r.ts for r in df.orderBy("event_id").select("ts").collect()]
    assert got == _TS


def test_vintages_agree_on_epoch_us(spark, tmp_path):
    """The exact-int64 epoch extraction (epoch_us) must agree bit-for-bit
    across vintages — it feeds the applyInPandas/sessionize operators."""
    epochs = []
    for t in (pa.timestamp("ns"), pa.timestamp("us")):
        sf_dir = _write_events(tmp_path, t)
        df = load_table(spark, sf_dir, "events")
        epochs.append(
            [r.t for r in df.select(epoch_us("ts").alias("t")).orderBy("t").collect()]
        )
    assert epochs[0] == epochs[1]
    want = [
        (t - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1) for t in _TS
    ]
    assert sorted(want) == epochs[0]
