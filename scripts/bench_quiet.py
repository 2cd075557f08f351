"""Load-gated wrapper around bench_one: wait for load_1m below a
threshold before each rep burst, so best-of numbers are comparable on a
host with periodic external contention.

    python scripts/bench_quiet.py [--reps N] [--load X] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--load", type=float, default=2.0)
    ap.add_argument("--timeout", type=float, default=1800)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    t0 = time.time()
    while os.getloadavg()[0] > args.load:
        if time.time() - t0 > args.timeout:
            print(f"# gave up waiting for load < {args.load}", flush=True)
            break
        time.sleep(20)
    print(f"# load at start: {os.getloadavg()}", flush=True)
    cmd = [
        sys.executable,
        str(Path(__file__).with_name("bench_one.py")),
        "--reps",
        str(args.reps),
        *args.queries,
    ]
    env = dict(os.environ)
    p = subprocess.run(cmd, capture_output=True, text=True, env=env)
    for line in p.stdout.splitlines():
        print(line, flush=True)
    print(f"# load at end: {os.getloadavg()}", flush=True)


if __name__ == "__main__":
    main()
