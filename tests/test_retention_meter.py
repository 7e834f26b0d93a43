"""Shape pins for the retention-delete meter (tools/retention_meter.py)
— the committed RETENTION_SCALE.json records sf0.1 numbers; this pins
the invariants at test scale so the artifact can't drift from the
mechanism:

- whole-file drops FIRE on a clustered table (the point of the claim);
- the planner's pre-delete accounting reconciles exactly with the
  manifest diff (planned drops == dropped-by-reference, planned
  boundary == rewritten);
- bytes physically moved stay bounded by the boundary files' bytes —
  the bulk of the deleted bytes leave by reference;
- the metadata COUNT twin agrees with the full scan (asserted inside
  the meter itself).
"""

from __future__ import annotations

import datetime

from tools.retention_meter import meter


def test_meter_invariants_on_clustered_table(spark, tmp_path):
    base = datetime.date(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(days=i // 10), float(i))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id int, d date, fare double")
    out = meter(
        spark, df, "d", str(tmp_path / "ret"), n_files=8, cutoff_frac=0.4
    )

    assert out["rows_deleted"] == out["count_value"] > 0
    assert abs(out["rows_deleted_frac"] - 0.4) < 0.1
    # the claim: drops by reference fire, and they dominate the
    # deleted bytes on a clustered table
    assert out["files_dropped_by_reference"] >= 1
    assert out["bytes_dropped_by_reference"] > out["bytes_rewritten_in"]
    # planner accounting == manifest diff, exactly
    assert out["planned_whole_file_drops"] == out[
        "files_dropped_by_reference"
    ]
    assert out["planned_boundary_rewrites"] == out["files_rewritten"]
    assert out["planned_carried"] == out["files_carried"]
    # total file conservation
    assert (
        out["files_dropped_by_reference"]
        + out["files_rewritten"]
        + out["files_carried"]
        == out["table_files"]
    )
    # bytes moved are boundary-bounded: nothing carried ever moves
    assert (
        out["bytes_rewritten_in"] + out["bytes_rewritten_out"]
        < out["bytes_dropped_by_reference"] + 2 * out["bytes_rewritten_in"]
    )
    # the survivors really are the complement
    assert out["table_rows"] - out["rows_deleted"] > 0
