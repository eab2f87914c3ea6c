"""The events ts-unit footer probe must re-probe when the file changes
(a regenerated testdata file with a different timestamp resolution was
served a stale cached unit before the mtime key — the exact cross-round
failure mode the probe exists to prevent)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from facebook_ad_library_data_pipeline_spark.catalog import events_ts_unit


def _write_events(path, unit):
    table = pa.table({"ts": pa.array([1, 2, 3], type=pa.timestamp(unit))})
    pq.write_table(table, path)


def test_events_ts_unit_reprobes_on_regeneration(tmp_path):
    f = tmp_path / "events.parquet"
    _write_events(f, "us")
    assert events_ts_unit(str(tmp_path)) == "us"

    _write_events(f, "ns")
    # force a distinct mtime even on coarse-resolution filesystems
    st = os.stat(f)
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert events_ts_unit(str(tmp_path)) == "ns"
