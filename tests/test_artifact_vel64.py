"""The committed BASELINE config-4 artifact (64^3 joint position+velocity
training step, artifacts/r5final_queue.log) parses and says what PERF.md
claims: both storage legs ran to rc=0 with zero lattice-coverage
violations and a falling loss, and the 64^3 winner storage (index masks,
no remat) beats the 32^3 default (auto + remat).

Reference scale being exceeded: /root/reference/utils.py:148 (the
reference caps at 32^3; config-4 is BASELINE.json configs[3])."""

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LOG = REPO / "artifacts" / "r5final_queue.log"


def _records():
    recs = {}
    for line in LOG.read_text().splitlines():
        if line.startswith("{"):
            rec = json.loads(line)
            recs[(rec["mask_dtype"], rec["remat"])] = rec
    return recs


def test_vel64_artifact_parses_and_is_healthy():
    text = LOG.read_text()
    assert "VEL64_DONE" in text
    assert re.search(r"### rc=0 vel64_idx888", text)
    assert re.search(r"### rc=0 vel64_auto_remat", text)
    recs = _records()
    assert len(recs) == 2
    for rec in recs.values():
        assert rec["family"] == "shiftinv_vel"
        assert rec["cells"] == 64 and rec["batch"] == 1
        assert rec["pps"] > 0 and 0.0 < rec["mfu"] < 1.0
        assert rec["coverage_violations"] == 0
        assert rec["loss_last"] < rec["loss_first"]


def test_vel64_winner_is_index_no_remat():
    recs = _records()
    idx = recs[("index", False)]
    auto = recs[("auto", True)]
    assert idx["step_ms"] < auto["step_ms"]
    # The PERF.md headline numbers for this artifact.
    assert abs(idx["step_ms"] - 563.8) < 0.1
    assert abs(auto["step_ms"] - 700.9) < 0.1
