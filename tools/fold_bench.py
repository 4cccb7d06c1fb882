#!/usr/bin/env python3
"""Fold per-query minima across several bench visits of the SAME code.

Usage: python3 tools/fold_bench.py out.json visit1.json visit2.json ...

The steady-state methodology (see Bench.scala) already takes min over
passes within one run and a rescue sweep; this folds ACROSS runs, the
"second/third clean visit" defense against the box's multi-minute
external load windows (a window can contaminate one whole visit but
not independent visits hours apart). Queries present in only some
visits (newly registered ones) carry the min over the visits that have
them. build_seconds folds the same way. The folded total is the sum of
folded per-query minima.
"""
import json, sys


def main(out, paths):
    visits = [json.load(open(p)) for p in paths]
    queries, builds = {}, {}
    for v in visits:
        for k, t in v.get("queries", {}).items():
            queries[k] = min(queries.get(k, t), t)
        for k, t in v.get("build_seconds", {}).items():
            builds[k] = min(builds.get(k, t), t)
    failed = sorted(set(visits[-1].get("failed", [])))
    rec = {
        "metric": "total",
        "value": sum(queries.values()),
        "unit": "sec",
        "queries": dict(sorted(queries.items())),
        "build_seconds": dict(sorted(builds.items())),
        "failed": failed,
        "failed_count": len(failed),
        "sf": visits[-1].get("sf"),
        "folded_visits": len(visits),
    }
    with open(out, "w") as f:
        json.dump(rec, f, separators=(",", ":"))
        f.write("\n")
    print(f"folded {len(visits)} visits -> {out}: "
          f"total {rec['value']:.1f}s over {len(queries)} queries, "
          f"failed {len(failed)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
