#!/usr/bin/env python
"""SCALING_r12.json (r11 verdict item 8): same-host per-query scaling
ratios from a 32-core side (the round's frozen per-query medians) and
an 8-core bench run made back-to-back in the same session, so
serial/driver-bound entries are identified without cross-host
confounds.

Usage:
    python scripts/make_scaling_table.py <c32_medians.json> \
        <c8_detail.json> <out.json>
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    c32_path, c8_path, out_path = sys.argv[1:4]
    with open(c32_path) as f:
        c32_doc = json.load(f)
    with open(c8_path) as f:
        c8_doc = json.load(f)
    c32 = c32_doc["queries"]
    c8 = c8_doc["queries"]
    per_query = {}
    for name, t32 in sorted(c32.items()):
        t8 = c8.get(name)
        if t8 is None or t32 <= 0:
            continue
        per_query[name] = {
            "c32_sec": round(t32, 4),
            "c8_sec": round(t8, 4),
            "ratio_c8_over_c32": round(t8 / t32, 3),
        }
    ratios = [v["ratio_c8_over_c32"] for v in per_query.values()]
    doc = {
        "cpus_main": 32,
        "cpus_low": 8,
        "c32_source": c32_path.split("/")[-1],
        "c8_source": c8_path.split("/")[-1],
        "c32_calibration_sec": c32_doc.get("calibration_sec"),
        "c8_calibration_sec": c8_doc.get("calibration_sec"),
        "n_queries": len(per_query),
        "median_ratio": round(statistics.median(ratios), 3),
        "note": ("ratio ~1 = serial/driver-bound at sf0.1; "
                 ">~2 = genuinely parallel compute. The c32 side is "
                 "the round's frozen per-query MEDIANS; the c8 side "
                 "is one bench run in the same session."),
        "per_query": per_query,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    top_serial = sorted(
        ((v["c32_sec"], n) for n, v in per_query.items()
         if v["ratio_c8_over_c32"] < 1.15), reverse=True)[:8]
    print(f"wrote {out_path}: {len(per_query)} queries, "
          f"median c8/c32 = {doc['median_ratio']}")
    print("most expensive near-serial (ratio<1.15):",
          [n for _, n in top_serial])
    return 0


if __name__ == "__main__":
    sys.exit(main())
