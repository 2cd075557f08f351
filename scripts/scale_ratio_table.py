"""Emit the sf0.1 → sf1 per-row wall-ratio table for SCALE.md from two
CHECK_ORACLE_WALLS dumps (round 12, verdict #1).

Usage:
    python scripts/scale_ratio_table.py .scratch/walls_sf01.json \
        .scratch/walls_sf1.json [ratio_flag_threshold]

Prints a markdown table sorted by descending ratio, a summary line, and
the list of rows above the flag threshold (default 2.0) — each of those
must be named, explained, and either fixed or carried `weak` in
SCALE.md.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    lo = json.loads(open(sys.argv[1]).read())
    hi = json.loads(open(sys.argv[2]).read())
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    lw, hw = lo["walls"], hi["walls"]
    rows = []
    for name, a in lw.items():
        b = hw.get(name)
        if b is None:
            continue
        # sub-0.3 s rows are session/JIT noise at both SFs; ratio is
        # meaningless there — report but never flag
        ratio = b / a if a > 0 else float("inf")
        rows.append((name, a, b, ratio))
    rows.sort(key=lambda r: -r[3])
    flagged = [r for r in rows if r[3] > thresh and r[2] >= 0.5]
    print(f"| query | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for name, a, b, ratio in rows:
        mark = " **" if (name, a, b, ratio) in flagged else " "
        print(f"| {name} | {a:.2f} | {b:.2f} |{mark}{ratio:.2f}x{mark.rstrip()} |")
    n = len(rows)
    import statistics

    med = statistics.median(r[3] for r in rows)
    print(
        f"\n{n} rows; median ratio {med:.2f}x; "
        f"{len(flagged)} rows > {thresh}x (and >= 0.5 s at sf1): "
        f"{[r[0] for r in flagged]}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
