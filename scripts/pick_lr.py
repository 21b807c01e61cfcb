"""Pick the best learning rate from chip LR-probe checkpoint losses.

Usage: pick_lr.py QUEUE_LOG tag=lr [tag=lr ...] [--fallback LR]

Scans the queue log (scripts/round5_quality3.sh format): a `### <tag> ...`
line opens a section; lines inside it belong to that tag.  The score for
each tag=lr pair is the probe's final TEST error (`median :  X` from the
train CLI's end-of-run evaluation — the queue keeps only the tail of each
probe's output, and the eval block is what survives); when a probe's eval
is missing, the last two `Checkpoint N : loss` lines stand in.  Prints
the winning lr to stdout (the queue script substitutes it into the long
train), and a one-line ranking to stderr for the log.  Falls back to
--fallback (default: the middle lr given) when no probe produced a score
— e.g. after a tunnel outage — so the long train still runs.
"""

from __future__ import annotations

import re
import sys


def main(argv) -> int:
    fallback = None
    if "--fallback" in argv:
        i = argv.index("--fallback")
        fallback = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    log_path, pairs = argv[0], argv[1:]
    tag_lr = dict(p.split("=", 1) for p in pairs)
    if fallback is None:
        vals = sorted(tag_lr.values(), key=float)
        fallback = vals[len(vals) // 2]

    losses: dict[str, list[float]] = {t: [] for t in tag_lr}
    medians: dict[str, float] = {}
    current = None
    ckpt = re.compile(r"Checkpoint\s+\d+\s*:\s*([0-9.eE+-]+)")
    med = re.compile(r"median\s*:\s*([0-9.eE+-]+)")
    with open(log_path) as f:
        for line in f:
            if line.startswith("### "):
                word = line.split()[1]
                current = word if word in tag_lr else None
                continue
            if current:
                m = ckpt.search(line)
                if m:
                    losses[current].append(float(m.group(1)))
                m = med.search(line)
                if m:
                    medians[current] = float(m.group(1))

    scored = {t: sum(v[-2:]) / len(v[-2:]) for t, v in losses.items() if v}
    scored.update(medians)  # test error beats train loss where both exist
    if not scored:
        print(f"pick_lr: no checkpoints found, falling back to {fallback}",
              file=sys.stderr)
        print(fallback)
        return 0
    ranking = sorted(scored.items(), key=lambda kv: kv[1])
    print("pick_lr ranking: " + ", ".join(
        f"{tag_lr[t]} -> {s:.5f} ({len(losses[t])} ckpts)"
        for t, s in ranking), file=sys.stderr)
    print(tag_lr[ranking[0][0]])
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
