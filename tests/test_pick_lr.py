"""scripts/pick_lr.py picks the long-train LR from the chip queue log —
a parsing bug would silently mis-steer the 6000-iter quality train, so the
section scoping, the median-beats-checkpoint precedence, and the fallback
are pinned here against synthetic logs in the exact queue format
(scripts/round5_resume.sh: `### <tag> <ts>` opens a section, the train
CLI's tail -14 lands inside it)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PICK = REPO / "scripts" / "pick_lr.py"


def _run(log_text: str, tmp_path, *args):
    log = tmp_path / "queue.log"
    log.write_text(log_text)
    out = subprocess.run([sys.executable, str(PICK), str(log), *args],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    return out.stdout.strip(), out.stderr


def test_picks_lowest_test_median(tmp_path):
    log = """### probe_lr01 2026-08-19T09:20:38Z
Checkpoint 700 : 0.5
  median :  0.40000
### rc=0 probe_lr01
### probe_lr003 2026-08-19T09:30:00Z
Checkpoint 700 : 0.9
  median :  0.20000
### rc=0 probe_lr003
### probe_lr001 2026-08-19T09:40:00Z
  median :  0.30000
### rc=0 probe_lr001
"""
    got, err = _run(log, tmp_path, "probe_lr01=0.01", "probe_lr003=0.003",
                    "probe_lr001=0.001")
    # 0.003's final test median (0.2) wins even though its train
    # checkpoint loss (0.9) is the worst — eval medians take precedence
    assert got == "0.003"
    assert "ranking" in err


def test_checkpoints_stand_in_when_eval_missing(tmp_path):
    log = """### probe_lr01 2026-08-19T09:20:38Z
Checkpoint 600 : 0.8
Checkpoint 700 : 0.7
### rc=124 probe_lr01
### probe_lr003 2026-08-19T09:30:00Z
Checkpoint 600 : 0.4
Checkpoint 700 : 0.3
### rc=124 probe_lr003
"""
    got, _ = _run(log, tmp_path, "probe_lr01=0.01", "probe_lr003=0.003")
    assert got == "0.003"


def test_fallback_is_middle_lr_when_no_scores(tmp_path):
    log = "### probe_lr01 2026-08-19T09:20:38Z\n### rc=124 probe_lr01\n"
    got, err = _run(log, tmp_path, "probe_lr01=0.01", "probe_lr003=0.003",
                    "probe_lr001=0.001")
    assert got == "0.003"          # sorted-by-value middle
    assert "falling back" in err


def test_lines_outside_sections_are_ignored(tmp_path):
    # a stray median from a later queue entry must not credit a probe
    log = """### probe_lr01 2026-08-19T09:20:38Z
  median :  0.50000
### rc=0 probe_lr01
### quality_train 2026-08-19T10:00:00Z
  median :  0.00001
### rc=0 quality_train
"""
    got, _ = _run(log, tmp_path, "probe_lr01=0.01", "probe_lr003=0.003")
    assert got == "0.01"
