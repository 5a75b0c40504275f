"""Drill-run record writer regression tests.

Round 5 found the fullshape eval arms crashing at the very last line:
`record_drill_run` received np.float32 GAP deltas and json.dump raised
TypeError AFTER a 20-minute eval pass, leaving a truncated JSON behind.
Pin both fixes: numpy scalars serialize, and writes are atomic (no partial
file on failure).
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def gd(monkeypatch, tmp_path):
    from tests.integration import gap_drill_common as gd

    monkeypatch.setattr(gd, "REPO_ROOT", str(tmp_path))
    return gd


def test_record_drill_run_numpy_scalars(gd):
    path = gd.record_drill_run(
        "t", {"f32": np.float32(1.5), "i64": np.int64(7), "py": 0.25}
    )
    with open(path) as f:
        rec = json.load(f)
    assert rec["f32"] == 1.5 and rec["i64"] == 7 and rec["py"] == 0.25
    # commit is "" here (REPO_ROOT monkeypatched outside any git repo)
    assert "commit" in rec and rec["date_utc"]


def test_record_drill_run_never_truncates(gd, tmp_path):
    with pytest.raises(TypeError):
        gd.record_drill_run("bad", {"x": object()})
    assert not os.path.exists(
        str(tmp_path / "docs" / "drill_runs" / "bad.json")
    ), "a failed record write must not leave a (truncated) file"
