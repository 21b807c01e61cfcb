"""bench.py probe->fallback routing (VERDICT r3 #1 / r4 weak #3): with a
dead tunnel the bench must still land a parsed JSON number via the CPU
fallback.  The end-to-end artifact is BENCH_DEADTUNNEL.json (committed,
produced by NBODY_BENCH_SIMULATE_DEAD_TUNNEL=1 python bench.py); this test
pins the ROUTING fast — no measurement subprocesses."""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def test_bench_dead_tunnel_routes_to_cpu_fallback(monkeypatch, capsys):
    import bench

    monkeypatch.setenv("NBODY_BENCH_SIMULATE_DEAD_TUNNEL", "1")
    calls = {}

    def fake_measure(timeout_s, force_cpu, cells=bench.CELLS):
        calls["force_cpu"] = force_cpu
        calls["cells"] = cells
        return 1234.5, [0.1, 0.2, 0.3]

    monkeypatch.setattr(bench, "_measure_in_subprocess", fake_measure)
    monkeypatch.setattr(bench, "load_or_measure_baseline", lambda: {})
    monkeypatch.setattr(bench, "baseline_pps", lambda base, cells: 100.0)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert calls["force_cpu"] is True
    assert calls["cells"] == bench.FALLBACK_CELLS
    assert "CPU_FALLBACK" in rec["metric"]
    assert rec["value"] == 1234.5
    assert abs(rec["vs_baseline"] - 12.35) < 0.02
    assert rec["step_secs_sorted"] == [0.1, 0.2, 0.3]
    assert rec["unit"] == "particle-steps/s"
    assert 0.0 < rec["mfu"] < 1.0


def test_bench_committed_dead_tunnel_artifact():
    """The committed end-to-end artifact parses and is honestly labeled."""
    p = REPO / "BENCH_DEADTUNNEL.json"
    rec = json.loads(p.read_text())
    assert "CPU_FALLBACK_tpu_tunnel_down" in rec["metric"]
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
