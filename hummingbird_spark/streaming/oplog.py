"""Oplog stream-event filtering (SURVEY §2.9, §2.2 F5).

Reference: `SkipOplog` (oplog_utils.go:40-76) drops events for
local/config databases, resolves `$cmd` command events (dropDatabase,
create, createIndexes, drop, renameCollection) to the namespace they
affect, and applies the include-namespace match. `applyOps` transaction
events carry nested oplogs to unnest (oplog_utils.go:212-236).

Here those become Column predicates / explode over the oplog frame —
fully streamable (no state), applied before any stateful stage so
filtered events never reach the shuffle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# command-document key -> how the affected namespace is derived
# (oplog_utils.go:48-56): value is the collection name within the $cmd db.
_CMD_KEYS = ("drop", "create", "createIndexes", "renameCollection",
             "dropDatabase")


def namespace_match_column(ns_col: Column, patterns: list[str] | None) -> Column:
    """Column-level SkipNamespace (migrator.go:237-251): does the event's
    namespace match any include pattern? Empty list -> match all.
    Wildcards db.* / *.coll compile to anchored regexes evaluated
    JVM-side (rlike) — no per-row Python."""
    if not patterns:
        return F.lit(True)
    conds = []
    for p in patterns:
        if p == "*" or p == "*.*":
            conds.append(F.lit(True))
        elif "*" in p:
            regex = "^" + p.replace(".", r"\.").replace("*", "[^.]+") + "$"
            conds.append(ns_col.rlike(regex))
        else:
            conds.append(ns_col == F.lit(p))
    return reduce(lambda a, b: a | b, conds)


def skip_oplog(df: DataFrame, includes: list[str] | None = None) -> DataFrame:
    """Filter an oplog frame to applicable events (oplog_utils.go:40-76):
      - drop ""/local.*/config.* namespaces,
      - resolve `db.$cmd` command events to their affected namespace
        (from the command body's collection argument),
      - keep only events whose resolved namespace matches `includes`.
    """
    db = F.split(F.col("ns"), r"\.", 2).getItem(0)
    is_cmd = F.col("ns").endswith(".$cmd")

    # resolved collection for $cmd events: first present command key's value
    cmd_coll = F.coalesce(
        *[F.get_json_object(F.col("o"), f"$.{k}") for k in _CMD_KEYS]
    )
    resolved_ns = F.when(
        is_cmd & cmd_coll.isNotNull(), F.concat(db, F.lit("."), cmd_coll)
    ).otherwise(F.col("ns"))

    out = df.withColumn("resolved_ns", resolved_ns)
    out = out.filter(
        (F.col("resolved_ns") != "")
        & (~db.isin("local", "config"))
        & F.col("resolved_ns").isNotNull()
    )
    # applyOps transactions pass through here regardless of include match:
    # each member carries its own namespace and is routed after unnesting
    # (oplog_utils.go:212-236).
    is_apply_ops = (F.col("op") == "c") & F.get_json_object(
        F.col("o"), "$.applyOps"
    ).isNotNull()
    return out.filter(
        namespace_match_column(F.col("resolved_ns"), includes) | is_apply_ops
    )


def unnest_apply_ops(df: DataFrame, max_depth: int = 2) -> DataFrame:
    """Expand `c`/applyOps transaction events into their member oplogs
    (oplog_utils.go:212-236) and pass every other op through unchanged.

    The nested ops live in o as JSON: {"applyOps": [{op,ns,o,o2}, ...]}.
    Uses explode over from_json — streaming-safe, no state. The
    reference recurses for applyOps-inside-applyOps (GetWriteModels
    calls itself, oplog_utils.go:232); a plan cannot recurse unboundedly,
    so unnesting is applied `max_depth` times (nested transactions
    deeper than that are not a thing MongoDB emits).
    """
    nested_schema = (
        "array<struct<op:string,ns:string,o:string,o2:string>>"
    )

    def one_level(frame: DataFrame) -> DataFrame:
        plain = frame.filter(F.col("op") != "c")
        cmds = (
            frame.filter(F.col("op") == "c")
            .withColumn(
                "__ops",
                F.from_json(
                    F.get_json_object(F.col("o"), "$.applyOps"),
                    nested_schema,
                ),
            )
            .filter(F.col("__ops").isNotNull())
            .withColumn("__e", F.explode(F.col("__ops")))
            .withColumn("op", F.col("__e.op"))
            .withColumn("ns", F.col("__e.ns"))
            .withColumn("o", F.col("__e.o"))
            .withColumn("o2", F.col("__e.o2"))
            .drop("__ops", "__e")
        )
        if "resolved_ns" in frame.columns:
            # members carry their own namespace (oplog_utils.go:223-232)
            cmds = cmds.withColumn("resolved_ns", F.col("ns"))
        return plain.unionByName(cmds)

    out = df
    for _ in range(max_depth):
        out = one_level(out)
    return out
