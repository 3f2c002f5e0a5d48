"""Per-query bench regression diff between rounds.

Usage:
    python scripts/bench_diff.py BENCH_r01.json BENCH_r02.json
    python scripts/bench_diff.py old.json   # vs a fresh local bench run

Accepts either the driver's BENCH_r{N}.json wrapper ({"parsed": {...}})
or a raw bench.py JSON line. Prints one row per query with the delta and
flags regressions beyond the noise band (timings are ±2x run-to-run on
this box — BENCH.md; the band below is deliberately generous, the point
is to make big regressions visible per query, not to gate on noise).
"""

from __future__ import annotations

import json
import subprocess
import sys

NOISE_FACTOR = 1.6  # flag only > 60% slowdowns (run-to-run noise is large)


def load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    return data.get("parsed", data)


def fresh_run() -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, check=True,
    ).stdout.strip().splitlines()[-1]
    return json.loads(out)


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    old = load(sys.argv[1])
    new = load(sys.argv[2]) if len(sys.argv) > 2 else fresh_run()
    qo, qn = old.get("queries", {}), new.get("queries", {})
    print(f"{'query':28} {'old_s':>8} {'new_s':>8} {'ratio':>7}  flag")
    regressions = []
    for name in sorted(set(qo) | set(qn)):
        a, b = qo.get(name), qn.get(name)
        if a is None or b is None:
            print(f"{name:28} {a or '-':>8} {b or '-':>8} {'':>7}  {'added' if a is None else 'removed'}")
            continue
        ratio = b / a if a else float("inf")
        flag = "REGRESSION" if ratio > NOISE_FACTOR else ""
        if flag:
            regressions.append(name)
        print(f"{name:28} {a:8.3f} {b:8.3f} {ratio:7.2f}  {flag}")
    to, tn = old.get("value"), new.get("value")
    if to and tn:
        print(f"{'TOTAL':28} {to:8.3f} {tn:8.3f} {tn / to:7.2f}")
    print(f"\n{len(regressions)} flagged: {regressions}")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
