"""Build BENCH/TIMINGS.md: per-entry Spark + oracle seconds at sf0.01.

Inputs: a selfcheck sweep log (tools/selfcheck.py, full run) and an
oracle timing log (tools/time_oracles.py). The driver's per-entry cost
is ~ the sum of the two columns (it runs the Spark query, then the
DuckDB oracle, in one long-lived session like the sweep does).
Usage: python tools/time_entries.py <selfcheck.log> <oracles.log> [probe notes...]
"""

from __future__ import annotations

import re
import sys


def main():
    sc_log, or_log = sys.argv[1], sys.argv[2]
    notes = " ".join(sys.argv[3:])
    spark = {}
    order = []
    for line in open(sc_log):
        m = re.search(r"(\w+) \{'status': '(\w+)'.*?'sec': ([\d.]+)", line)
        if m:
            spark[m.group(1)] = (m.group(2), float(m.group(3)))
            order.append(m.group(1))
    oracle = {}
    for line in open(or_log):
        m = re.match(r"(\w+)\s+([\d.]+)s rows=(-?\d+)", line.strip())
        if m:
            oracle[m.group(1)] = float(m.group(2))
    rows = []
    for name in order:
        st, ss = spark[name]
        os_ = oracle.get(name)
        tot = ss + (os_ or 0.0)
        rows.append((tot, name, st, ss, os_))
    print("# Per-entry driver-gate cost, sf0.01 (judge item r5-#4)\n")
    if notes:
        print(notes + "\n")
    print("| entry | status | spark s | oracle s | total s |")
    print("|---|---|---|---|---|")
    for tot, name, st, ss, os_ in rows:
        o = f"{os_:.2f}" if os_ is not None else "-"
        print(f"| {name} | {st} | {ss:.1f} | {o} | {tot:.1f} |")
    worst = sorted(rows, reverse=True)[:5]
    print("\nSlowest 5 (total): " +
          ", ".join(f"{n} {t:.1f}s" for t, n, *_ in worst))
    bad = [n for t, n, *_ in rows if t >= 30.0]
    print(f"Entries >= 30 s: {bad if bad else 'none'}")


if __name__ == "__main__":
    main()
