#!/usr/bin/env python
"""ONE command for the round-closing checklist (VERDICT r10 directive
#7): regenerate the driver-attestation ledger, verify the next-round
queue covers the whole never-attested tail, and rewrite the README
closing-numbers block (registry counts + pytest/bench numbers + the
machine-derived attestation ETA) — so queue, ledger, and prose cannot
drift from each other.

Usage (after the last code commit of the round, on frozen HEAD):
  python -m pytest tests/ -q 2>&1 | tee /tmp/pytest_final.log
  python bench.py | tee /tmp/bench_final.json
  python tools/round_close.py --round 11 \
      --pytest-log /tmp/pytest_final.log --bench /tmp/bench_final.json

Steps, in order:
  1. DRIVER_LEDGER.md <- tools/driver_ledger.py render (from the
     driver's CORRECTNESS_r*.json files);
  2. assert window + queue + ledger covers EVERY oracle-backed natural
     name (the same invariant tests/test_oracle_parity.py pins) and
     compute rotations-to-close at 42 first-time slots/round;
  3. README closing block <- tools/closing_record.py (which embeds the
     ETA from step 2, so the prose claim IS the queue arithmetic).

The start-of-round rotation itself stays a separate reviewed edit
(tools/window_rotation.py --apply); this tool is the end-of-round half.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--pytest-log")
    ap.add_argument("--bench")
    ap.add_argument(
        "--check", action="store_true",
        help="verify only: regenerate nothing, exit non-zero on drift",
    )
    args = ap.parse_args()

    import closing_record
    import driver_ledger

    if args.check:
        want = driver_ledger.render(ROOT)
        have = open(os.path.join(ROOT, "DRIVER_LEDGER.md")).read()
        if want != have:
            raise SystemExit("DRIVER_LEDGER.md is stale — rerun round_close")
    else:
        driver_ledger.main()

    eta = closing_record.attestation_eta()
    if eta["uncovered"]:
        raise SystemExit(
            f"{len(eta['uncovered'])} never-attested names outside "
            f"window+queue: {eta['uncovered'][:10]}..."
        )
    print(
        f"attestation tail: {eta['never_attested']} never-attested "
        f"({eta['in_window']} windowed, {eta['queued']} queued) — "
        f"closes in {eta['rotations_to_close']} rotation(s)",
        file=sys.stderr,
    )

    cmd = [
        sys.executable, os.path.join(ROOT, "tools", "closing_record.py"),
        "--round", str(args.round),
    ]
    if args.pytest_log:
        cmd += ["--pytest-log", args.pytest_log]
    if args.bench:
        cmd += ["--bench", args.bench]
    cmd.append("--check" if args.check else "--update-readme")
    subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
