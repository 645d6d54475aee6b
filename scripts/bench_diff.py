"""Per-query regression diff between two bench result files.

Usage:
    python scripts/bench_diff.py BENCH_r01.json current.json [--ratio 1.3]

Accepts either the driver's wrapped format ({"parsed": {...}}) or the
raw one-line JSON bench.py prints.  Exits 1 if any query regresses by
more than --ratio (default 1.3x, the round-over-round budget from the
round-1 review), so CI / the per-round loop can gate on it.
"""

import argparse
import json
import os
import sys


def load_bench(path: str, with_sidecar: bool = False) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    if not isinstance(d, dict) or "queries" not in d:
        # covers driver records with "parsed": null (the round-3
        # tail-buffer overflow) as a clean exit, not a TypeError
        raise SystemExit(f"{path}: no parsed 'queries' — not a usable bench result")
    # bench.py moved the non-headline tier out of the final line into a
    # BENCH_EXTRA.json sidecar (the single line outgrew the driver's
    # tail capture) — but the sidecar is a single MUTABLE file
    # overwritten by every run, so it can only ever describe the
    # LATEST run.  Fold it into the `current` side only; folding it
    # into both sides would compare the sidecar against itself and
    # report 1.00x for every extra-tier query (a false PASS).
    if with_sidecar and "extra_queries" not in d and d.get("extras_file"):
        sidecar = os.path.join(os.path.dirname(os.path.abspath(path)),
                               d["extras_file"])
        try:
            with open(sidecar) as f:
                d["extra_queries"] = json.load(f).get("queries", {})
        except OSError:
            print(f"warning: {sidecar} missing — extras not gated",
                  file=sys.stderr)
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("current")
    ap.add_argument("--ratio", type=float, default=1.3)
    args = ap.parse_args()

    base = load_bench(args.baseline)
    cur = load_bench(args.current, with_sidecar=True)
    bq, cq = dict(base["queries"]), dict(cur["queries"])
    # fold in the non-headline tier when both sides report it, so new
    # operators get regression-gated from their second round onward
    for d, q in ((base, bq), (cur, cq)):
        q.update(d.get("extra_queries") or {})
    regressions = []
    print(f"{'query':<28} {'base':>8} {'cur':>8} {'ratio':>7}")
    for name in sorted(set(bq) | set(cq)):
        b, c = bq.get(name), cq.get(name)
        if b is None or c is None:
            print(f"{name:<28} {b or '-':>8} {c or '-':>8}    (only one side)")
            continue
        ratio = c / b if b else float("inf")
        flag = "  << REGRESSION" if ratio > args.ratio else ""
        print(f"{name:<28} {b:>8.3f} {c:>8.3f} {ratio:>6.2f}x{flag}")
        if ratio > args.ratio:
            regressions.append((name, b, c, ratio))
    tb, tc = base.get("value"), cur.get("value")
    if tb and tc:
        print(f"{'TOTAL':<28} {tb:>8.3f} {tc:>8.3f} {tc / tb:>6.2f}x")
    if regressions:
        print(f"\n{len(regressions)} querie(s) over the {args.ratio}x budget", file=sys.stderr)
        return 1
    print("\nno regressions over budget")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
