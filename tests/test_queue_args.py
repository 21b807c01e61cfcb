"""The chip measurement queue runs unattended behind the tunnel-wait loop
(scripts/wait_and_run_queue.sh) — a flag typo in any entry would only
surface hours later on the real chip.  This dry-parses every command in
EVERY scripts/round*_*.sh queue script against the ACTUAL parsers, with
parse errors turned into test failures (ADVICE r4: the round-4 version
only covered round4_queue.sh, leaving resume/followup edits unprotected)."""

import re
import shlex
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))
sys.path.insert(0, str(REPO))

_ENV_ASSIGN = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*=")


def _queue_commands():
    cmds = []
    for script in sorted((REPO / "scripts").glob("round*_*.sh")):
        # join continuation lines, then collect `run <tag> <timeout> <cmd...>`
        text = script.read_text().replace("\\\n", " ")
        # simple NAME="..." shell variables used as command shorthands
        shellvars = {m.group(1): shlex.split(m.group(2)) for m in
                     re.finditer(r'^([A-Z][A-Z0-9_]*)="([^"]*)"$', text,
                                 re.MULTILINE)}
        for line in text.splitlines():
            line = line.strip()
            if not line.startswith("run "):
                continue
            parts = shlex.split(line)
            tag, cmd = parts[1], parts[3:]
            # strip a leading `env VAR=... [VAR=...]` prefix
            if cmd and cmd[0] == "env":
                cmd = cmd[1:]
                while cmd and _ENV_ASSIGN.match(cmd[0]):
                    cmd = cmd[1:]
            # expand $NAME shorthands ($B = bench_step, $Q = shared flags)
            expanded = []
            for tok in cmd:
                if tok.startswith("$") and tok[1:] in shellvars:
                    expanded.extend(shellvars[tok[1:]])
                else:
                    expanded.append(tok)
            cmd = expanded
            cmds.append((f"{script.stem}:{tag}", cmd))
    assert len(cmds) >= 20, "queue parsing found suspiciously few commands"
    return cmds


class _Exit(Exception):
    pass


def _parse_with(parser, argv):
    # argparse calls sys.exit(2) on bad args — surface it as a failure
    def die(status=0, message=None):
        raise _Exit(message or str(status))

    parser.exit = die
    parser.error = lambda msg: die(2, msg)
    return parser.parse_args(argv)


@pytest.mark.parametrize("tag,cmd", _queue_commands(),
                         ids=[t for t, _ in _queue_commands()])
def test_queue_entry_parses(tag, cmd):
    prog = cmd[1] if cmd[0].startswith("python") else cmd[0]
    argv = cmd[2:] if cmd[0] == "python" else cmd[1:]
    if prog == "scripts/bench_step.py":
        import bench_step
        args = _parse_with(bench_step.build_parser(), argv)
        assert args.family in ("shiftinv", "shiftinv15", "shiftinv_vel",
                               "set", "attn")
    elif prog == "scripts/profile_step4.py":
        import profile_step4
        _parse_with(profile_step4.build_parser(), argv)
    elif prog == "scripts/profile_step15.py":
        import profile_step15
        args = _parse_with(profile_step15.build_parser(), argv)
        assert set(args.impls) <= {"gather", "scatter", "scan"}
    elif prog == "scripts/profile15_parts.py":
        import profile15_parts
        args = _parse_with(profile15_parts.build_parser(), argv)
        known = {n for n, _ in profile15_parts.ABLATIONS}
        assert not args.only or set(args.only) <= known
    elif prog == "scripts/stencil_stats.py":
        import stencil_stats
        _parse_with(stencil_stats.build_parser(), argv)
    elif prog == "scripts/pick_winner.py":
        import pick_winner
        _parse_with(pick_winner.build_parser(), argv)
    elif prog == "scripts/bench_knn.py":
        import bench_knn
        args = _parse_with(bench_knn.build_parser(), argv)
        assert set(args.variants) <= {"sort", "iter", "pallas"}
    elif prog == "-m":
        mod = cmd[2]
        argv = cmd[3:]
        if mod == "nbody_tpu.cli.rollout":
            from nbody_tpu.cli.rollout import build_chain_parser
            _parse_with(build_chain_parser(), argv)
        elif mod == "nbody_tpu.cli.train":
            from nbody_tpu import config as C
            _parse_with(C.build_parser(), argv)
        elif mod == "nbody_tpu.cli.eval":
            # the eval CLI adds --plot on top of the shared parser
            from nbody_tpu import config as C
            p = C.build_parser()
            p.add_argument("--plot", type=str, default="")
            args = _parse_with(p, argv)
            assert args.name, "eval entries must pass -n"
        else:
            pytest.fail(f"queue entry {tag} runs unknown module {mod}")
    elif prog == "bench.py":
        assert argv == []
    else:
        pytest.fail(f"queue entry {tag} runs unknown program {prog}")


def test_bench_fused_parser():
    """scripts/bench_fused.py (the round-5 ledger measurement) parses its
    production invocation."""
    import bench_fused
    args = _parse_with(bench_fused.build_parser(),
                       ["--cells", "32", "--batch", "4", "--k", "14",
                        "--channels", "32", "--passes", "10"])
    assert (args.cells, args.batch, args.k) == (32, 4, 14)
