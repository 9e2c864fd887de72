"""Diff two bench detail files and rank per-query movement, noise-aware.

Usage::

    python tools/compare_bench.py OLD_DETAIL.json NEW_DETAIL.json [--floor]

Each file is a ``BENCH_DETAIL.json`` (written by ``bench.py`` per run) or a
``{"detail": {...}}`` stdout capture. Comparison uses the NORMALIZED seconds
(``queries_normalized`` — raw / median-anchor host drift) so cross-round host
speed changes don't read as regressions; ``--floor`` instead takes
``min(samples)/drift`` per query, the right view when comparing a single
noisy run against a multi-run floor.

The host has 2-3x within-run noise on this box (see samples arrays), so
movements under NOISE_BAND (default 1.30x) are reported as flat. Exit code is
0 unless ``--gate RATIO`` is given — then any query slower than RATIO x old
(normalized) exits 1, mirroring the reference CI's 150% alert-threshold +
fail-on-alert benchmark gate (its benchmark workflow, reimplemented for
bench.py output instead of cargo-bench output).
"""

from __future__ import annotations

import argparse
import json
import sys

NOISE_BAND = 1.30


def load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    return d.get("detail", d)


def norm_times(d: dict, floor: bool) -> dict[str, float]:
    drift = (d.get("anchors") or {}).get("drift") or 1.0
    if floor and d.get("samples"):
        return {q: min(s) / drift for q, s in d["samples"].items() if s}
    if d.get("queries_normalized"):
        return dict(d["queries_normalized"])
    return {q: t / drift for q, t in d.get("queries", {}).items()}


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--floor", action="store_true",
                    help="compare min(samples)/drift instead of last-sample")
    ap.add_argument("--band", type=float, default=NOISE_BAND,
                    help="ratio under which movement is reported flat")
    ap.add_argument("--gate", type=float, default=None, metavar="RATIO",
                    help="CI mode: exit 1 if any query's normalized time "
                         "exceeds RATIO x old (the reference CI's "
                         "alert-threshold + fail-on-alert semantics; its "
                         "own workflow used 150%%, i.e. --gate 1.5)")
    ap.add_argument("--allow-gone", action="store_true",
                    help="with --gate, tolerate queries present in old but "
                         "missing from new (default: GONE rows alert too — "
                         "a query that errors out of the new run must not "
                         "read as green)")
    args = ap.parse_args(argv)

    a, b = load(args.old), load(args.new)
    ta, tb = norm_times(a, args.floor), norm_times(b, args.floor)

    rows = []
    for q in sorted(set(ta) | set(tb)):
        if q not in ta:
            rows.append((q, None, tb[q], "NEW"))
        elif q not in tb:
            rows.append((q, ta[q], None, "GONE"))
        else:
            r = tb[q] / ta[q] if ta[q] else float("inf")
            tag = ("flat" if 1 / args.band <= r <= args.band
                   else "SLOWER" if r > 1 else "faster")
            rows.append((q, ta[q], tb[q], f"{tag} {r:.2f}x"))

    rows.sort(key=lambda r: -(r[2] / r[1]) if r[1] and r[2] else 0)
    w = max(len(r[0]) for r in rows)
    fmt = "{:<%d} {:>8} {:>8}  {}" % w
    print(fmt.format("query", "old", "new", "movement (normalized sec)"))
    for q, x, y, tag in rows:
        print(fmt.format(q, f"{x:.2f}" if x is not None else "-",
                         f"{y:.2f}" if y is not None else "-", tag))

    da = (a.get("anchors") or {}).get("drift")
    db = (b.get("anchors") or {}).get("drift")
    print(f"\nhost drift: old={da} new={db} "
          f"(normalized columns already divide this out)")
    ratios = sorted(r[2] / r[1] for r in rows if r[1] and r[2])
    if ratios:
        med = ratios[len(ratios) // 2]
        near_med = sum(1 for r in ratios if med / 1.15 <= r <= med * 1.15)
        print(f"median movement {med:.2f}x; {near_med}/{len(ratios)} queries "
              f"within 1.15x of it")
        if abs(med - 1.0) > 0.2 and near_med >= 0.6 * len(ratios):
            # Sub-second anchor queries saturate differently than the
            # multi-second rows, so the median-anchor drift can under- or
            # over-correct a whole-host speed change. A shift this uniform
            # is the host, not the code — judge per-query movement against
            # the median, not against 1.0.
            print(f"UNIFORM SHIFT: residual host drift ~{med:.2f}x beyond "
                  f"the anchor correction — compare queries to the median, "
                  f"not to 1.0")
    moved = [r for r in rows if "SLOWER" in r[3]]
    print(f"{len(moved)} queries beyond the {args.band}x noise band slower")
    if args.gate is not None:
        alerts = [(q, x, y) for q, x, y, _ in rows
                  if x and y and y / x > args.gate]
        for q, x, y in alerts:
            print(f"ALERT {q}: {y:.2f} vs {x:.2f} normalized "
                  f"= {y / x:.2f}x > {args.gate}x gate")
        gone = [q for q, x, y, tag in rows if tag == "GONE"]
        if gone and not args.allow_gone:
            # A query that errored out of (or was dropped from) the new run
            # has no timing to gate — it must alert, not silently pass.
            for q in gone:
                print(f"ALERT {q}: present in old run but GONE from new run")
            alerts.extend((q, None, None) for q in gone)
        print(f"gate {args.gate}x: {len(alerts)} alert(s)")
        return 1 if alerts else 0
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
