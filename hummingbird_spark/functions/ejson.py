"""MongoDB extended-JSON normalization (pure Column expressions).

When oplog/change-stream frames are JSON-encoded, BSON types arrive as
type wrappers — `{"$numberLong": "5"}`, `{"$oid": "..."}`, `{"$date":
{"$numberLong": "1700000000000"}}` (canonical) or `{"$date":
"2023-11-14T22:13:20Z"}` (relaxed). The reference replays oplogs as
native BSON so it never sees these (oplog_utils.go:208-281 operates on
bson.D); a JSON-transported pipeline must strip them before field
extraction, or `json_tuple`/`from_json` yield structs where scalars
belong.

`normalize_extended_json` rewrites wrappers to plain JSON scalars with
chained `regexp_replace` — JVM-side, codegen-friendly, streaming-safe.
Nested wrappers collapse because inner number wrappers are rewritten
before `$date`: `{"$date":{"$numberLong":"-5"}}` -> `{"$date":-5}` ->
`-5` (epoch millis).

Not handled (left intact, by design): `$binary`, `$timestamp`,
`$regularExpression` — these have no scalar JSON equivalent; downstream
schemas that need them declare a struct column instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# wrapper -> "replace with the captured group" rules, applied in order
_RULES: list[tuple[str, str]] = [
    # integer wrappers: {"$numberLong": "5"} / {"$numberInt": "5"} -> 5
    (r'\{\s*"\$numberLong"\s*:\s*"(-?\d+)"\s*\}', "$1"),
    (r'\{\s*"\$numberInt"\s*:\s*"(-?\d+)"\s*\}', "$1"),
    # float wrappers (finite values; NaN/Infinity stay quoted strings,
    # which plain JSON cannot represent as numbers anyway)
    (r'\{\s*"\$numberDouble"\s*:\s*"(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"\s*\}',
     "$1"),
    (r'\{\s*"\$numberDecimal"\s*:\s*"(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"\s*\}',
     "$1"),
    # canonical $date collapsed to epoch millis once the inner
    # $numberLong rule above has fired
    (r'\{\s*"\$date"\s*:\s*(-?\d+)\s*\}', "$1"),
    # relaxed $date -> the ISO string
    (r'\{\s*"\$date"\s*:\s*("[^"]*")\s*\}', "$1"),
    # ObjectId -> its hex string
    (r'\{\s*"\$oid"\s*:\s*("[0-9a-fA-F]{24}")\s*\}', "$1"),
]


def normalize_extended_json(col: Column | str) -> Column:
    """Collapse extended-JSON type wrappers in a JSON string column to
    plain JSON scalars. Idempotent; null-safe (null passes through)."""
    out = F.col(col) if isinstance(col, str) else col
    for pattern, repl in _RULES:
        out = F.regexp_replace(out, pattern, repl)
    return out
