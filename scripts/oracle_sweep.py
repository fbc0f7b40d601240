"""Local emulation of the driver's CORRECTNESS gate.

Runs registry queries at sf0.01 side-by-side with their DuckDB oracle
SQL and compares row count, sorted-by-name schema, and a value hash
computed over rows sorted by their full value tuple — the same shape
the driver records in CORRECTNESS_r{N}.json.

Usage:
    python scripts/oracle_sweep.py [name ...]      # default: all oracle-backed
    python scripts/oracle_sweep.py --sf /root/testdata/sf0.01 name
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _canon(v):
    """Canonicalise one cell so Spark and DuckDB values hash alike."""
    import datetime
    import decimal

    if v is None:
        return "\x00"
    if isinstance(v, bool):
        return "1" if v else "0"
    # repr-strict on numerics, mirroring the driver's compare: a
    # Decimal on one side and a float on the other MUST mismatch (the
    # r6 unimax oracle typed capacity as DECIMAL via a bare 2.0
    # literal — the old 6-sig-fig coercion hid it here while the
    # driver-shaped harness caught it), and 6-sig-fig rounding would
    # similarly mask sub-ppm float divergence the driver flags
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{_canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _hash(cols: list[str], rows: list) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        tuple(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in canon_rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return len(rows), h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from hummingbird_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qmap, omap = entry.queries(), entry.oracle_sql()
    names = args.names or [n for n in qmap if n in omap]

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name in names:
        if name not in omap:
            print(f"{name}: SKIP (rows-only, no oracle)")
            continue
        try:
            sdf = qmap[name](spark, args.sf)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
            rel = con.execute(omap[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        sn, sh = _hash(scols, srows)
        on, oh = _hash(ocols, orows)
        schema_ok = sorted(scols) == sorted(ocols)
        ok = schema_ok and sn == on and sh == oh
        tag = "MATCH" if ok else "MISMATCH"
        print(f"{name}: {tag} rows={sn}/{on} hash={sh}/{oh}"
              + ("" if schema_ok else
                 f" schema {sorted(scols)} vs {sorted(ocols)}"))
        if not ok:
            failures.append(name)
    print(f"== {len(names) - len(failures)}/{len(names)} green ==")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
