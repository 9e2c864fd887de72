"""Cross-round floor-rule audit, like-vs-like (VERDICT r11 item 1).

Usage::

    python tools/floor_audit.py "bench_runs/r11_detail*.json" \
                                "bench_runs/r12_detail*.json" [--rule 1.25]

For each query, the CROSS-RUN WARM floor per round is
``min over detail files of min(samples)`` — RAW seconds, the protocol
the r10/r11 judges applied line-by-line (cross-run minima are already
the quietest the host gave; ``--normalize`` divides each run by its
anchor drift instead, but with sub-second anchors that can paint a
uniform residual host shift onto every row — use it only when the two
rounds ran on visibly different-speed hosts). Rows whose
new/old ratio exceeds ``--rule`` are flagged for diagnosis (normalized
plan-hash diff + interleaved fresh-session A/B; see DESIGN.md
"Floor-rule audit").

Two-floor protocol (r12): warm floors are only comparable warm-to-warm —
the in-bench session is deeply warmed by dozens of prior queries, and
min-of-samples floors tighten with run count, so a round with fewer runs
reads slower on warm-state-sensitive rows without any code change
(r11's nearest_partitioned 1.54x "breach" was exactly this). Where both
rounds recorded ``fresh_floors`` (bench.py --fresh-one subprocesses),
this audit also prints the fresh-to-fresh comparison, which has no
run-count dependence. The per-round run counts are printed with every
flagged row so warm-floor breaches carry their caveat inline.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def load_round(pattern: str, normalize: bool = False):
    files = sorted(glob.glob(pattern))
    if not files:
        raise SystemExit(f"no files match {pattern!r}")
    warm: dict[str, float] = {}
    fresh: dict[str, float] = {}
    for path in files:
        with open(path) as fh:
            d = json.load(fh)
        d = d.get("detail", d)
        drift = ((d.get("anchors") or {}).get("drift") or 1.0) if normalize else 1.0
        for q, s in (d.get("samples") or {}).items():
            if s:
                f = min(s) / drift
                warm[q] = min(warm.get(q, f), f)
        for q, rec in (d.get("fresh_floors") or {}).items():
            if isinstance(rec, dict) and rec.get("floor"):
                f = rec["floor"] / drift
                fresh[q] = min(fresh.get(q, f), f)
    return warm, fresh, len(files)


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old", help="glob of the previous round's detail files")
    ap.add_argument("new", help="glob of this round's detail files")
    ap.add_argument("--rule", type=float, default=1.25,
                    help="flag rows slower than RULE x old floor")
    ap.add_argument("--normalize", action="store_true",
                    help="divide each run's floors by its anchor drift "
                         "(cross-host comparisons only)")
    args = ap.parse_args(argv)

    warm_a, fresh_a, n_a = load_round(args.old, args.normalize)
    warm_b, fresh_b, n_b = load_round(args.new, args.normalize)

    rows = []
    for q in sorted(set(warm_a) & set(warm_b)):
        r = warm_b[q] / warm_a[q] if warm_a[q] else float("inf")
        rows.append((q, warm_a[q], warm_b[q], r))
    rows.sort(key=lambda x: -x[3])

    if not rows:
        # Compact r*_run*.json files carry no `samples` key, and disjoint
        # rounds share no queries — either way there is nothing to audit.
        raise SystemExit(
            "no overlapping warm-sample queries between the two globs — "
            "point them at DETAIL files (bench_runs/r*_detail*.json), "
            "not compact run lines")
    w = max(len(q) for q in (*warm_a, *warm_b, *fresh_a, *fresh_b))
    fmt = "{:<%d} {:>8} {:>8} {:>7}  {}" % w
    kind = "drift-normalized" if args.normalize else "raw sec"
    print(f"warm floors ({kind}, min across {n_a} old / {n_b} new runs):")
    print(fmt.format("query", "old", "new", "ratio", ""))
    flagged = []
    for q, a, b, r in rows:
        tag = ""
        if r > args.rule:
            tag = f"BREACH >{args.rule}x — diagnose (plan-hash + A/B)"
            flagged.append(q)
        elif r < 1 / args.rule:
            tag = "improved"
        print(fmt.format(q, f"{a:.2f}", f"{b:.2f}", f"{r:.2f}x", tag))

    common_fresh = sorted(set(fresh_a) & set(fresh_b))
    if common_fresh:
        print("\nfresh-session floors (like-vs-like, run-count independent):")
        for q in common_fresh:
            r = fresh_b[q] / fresh_a[q]
            print(fmt.format(q, f"{fresh_a[q]:.2f}", f"{fresh_b[q]:.2f}",
                             f"{r:.2f}x",
                             "BREACH" if r > args.rule else ""))
    else:
        print("\n(no overlapping fresh_floors rows — first round with the "
              "two-floor protocol has nothing to compare fresh-to-fresh)")

    missing = sorted(set(warm_a) - set(warm_b))
    if missing:
        print(f"\nGONE from new round (diagnose, don't ignore): {missing}")
    print(f"\n{len(flagged)} warm-floor breach(es): {flagged}")
    if flagged and n_a != n_b:
        print(f"note: run counts differ ({n_a} vs {n_b}) — min-of-samples "
              f"floors tighten with more runs; check fresh floors / "
              f"cross-run spread before treating a warm breach as real")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
