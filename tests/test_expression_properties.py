"""Randomized differential test for the Mongo expression translator
(pipeline._expr): 200 seeded random expression trees over int columns
with nulls, evaluated by Spark in ONE select and by a tiny Python
reference evaluator implementing the declared semantics (Spark 3VL:
null-propagating arithmetic/comparisons, Kleene and/or, when() treating
a null condition as false). Any divergence prints the failing tree."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from hummingbird_spark.pipeline import _expr

COLS = ["a", "b", "c"]
N_TREES = 200
MAX_DEPTH = 4


def _gen(rng: random.Random, depth: int, kind: str = "num"):
    """Type-aware tree generation: Spark is strictly typed where Mongo
    coerces, so numeric slots get numeric subtrees and boolean slots
    get comparisons/connectives (the translator's supported domain)."""
    num = lambda: _gen(rng, depth + 1, "num")  # noqa: E731
    boolean = lambda: _gen(rng, depth + 1, "bool")  # noqa: E731
    if kind == "bool":
        if depth >= MAX_DEPTH:
            return {"$gte": ["$" + rng.choice(COLS), rng.randint(-5, 5)]}
        op = rng.choice(["$gte", "$lt", "$eq", "$and", "$or", "$not"])
        if op in ("$gte", "$lt", "$eq"):
            return {op: [num(), num()]}
        if op in ("$and", "$or"):
            return {op: [boolean(), boolean()]}
        return {"$not": boolean()}
    if depth >= MAX_DEPTH or rng.random() < 0.3:
        if rng.random() < 0.6:
            return "$" + rng.choice(COLS)
        return rng.randint(-5, 5)
    op = rng.choice(
        ["$add", "$subtract", "$multiply", "$cond", "$ifNull", "$abs",
         "$max", "$min"])
    if op in ("$add", "$multiply"):
        return {op: [num() for _ in range(rng.randint(2, 3))]}
    if op in ("$max", "$min"):
        # variadic scalar form: null-SKIPPING (greatest/least), unlike
        # the null-propagating arithmetic ops
        return {op: [num() for _ in range(rng.randint(2, 3))]}
    if op == "$subtract":
        return {op: [num(), num()]}
    if op == "$cond":
        return {"$cond": {"if": boolean(), "then": num(),
                          "else": num()}}
    if op == "$ifNull":
        return {"$ifNull": [num(), num()]}
    if op == "$abs":
        return {"$abs": num()}
    raise AssertionError(op)


def _pyeval(tree, row: dict):
    if isinstance(tree, str) and tree.startswith("$"):
        return row[tree[1:]]
    if isinstance(tree, (int, float)):
        return tree
    op, arg = next(iter(tree.items()))
    if op == "$cond":
        c = _pyeval(arg["if"], row)
        return _pyeval(arg["then"] if c else arg["else"], row)
    if op == "$ifNull":
        for a in arg:
            v = _pyeval(a, row)
            if v is not None:
                return v
        return None
    vals = [_pyeval(a, row) for a in (arg if isinstance(arg, list)
                                      else [arg])]
    if op in ("$add", "$subtract", "$multiply", "$abs",
              "$gte", "$lt", "$eq"):
        if any(v is None for v in vals):
            return None
        if op == "$add":
            s = vals[0]
            for v in vals[1:]:
                s = s + v
            return s
        if op == "$subtract":
            return vals[0] - vals[1]
        if op == "$multiply":
            p = vals[0]
            for v in vals[1:]:
                p = p * v
            return p
        if op == "$abs":
            return abs(vals[0])
        if op == "$gte":
            return vals[0] >= vals[1]
        if op == "$lt":
            return vals[0] < vals[1]
        if op == "$eq":
            return vals[0] == vals[1]
    if op == "$and":  # Kleene
        if any(v is False for v in vals):
            return False
        if any(v is None for v in vals):
            return None
        return True
    if op == "$or":
        if any(v is True for v in vals):
            return True
        if any(v is None for v in vals):
            return None
        return False
    if op == "$not":
        return None if vals[0] is None else (not vals[0])
    if op in ("$max", "$min"):
        nn = [v for v in vals if v is not None]
        if not nn:
            return None
        return max(nn) if op == "$max" else min(nn)
    raise AssertionError(op)


def test_expression_translator_matches_reference_semantics(spark):
    rng = random.Random(3629)
    trees = [_gen(rng, 0) for _ in range(N_TREES)]

    rows = []
    for _ in range(20):
        rows.append(tuple(
            None if rng.random() < 0.2 else rng.randint(-9, 9)
            for _ in COLS
        ))
    df = spark.createDataFrame(rows, "a int, b int, c int")

    out = df.select(
        *COLS,
        *[_expr(t).alias(f"e{i}") for i, t in enumerate(trees)],
    ).collect()

    for r in out:
        row = {c: r[c] for c in COLS}
        for i, t in enumerate(trees):
            want = _pyeval(t, row)
            got = r[f"e{i}"]
            assert got == want, (
                f"tree {t!r} on row {row}: spark={got!r} py={want!r}"
            )


def test_set_operator_family_matches_python_sets(spark):
    """Randomized differential test for the set-expression family:
    Spark results must equal Python's set algebra (order-insensitive —
    Mongo leaves set ORDER unspecified and so do we)."""
    rng = random.Random(1729)
    rows = []
    for _ in range(60):
        mk = lambda: [rng.randint(0, 6)  # noqa: E731
                      for _ in range(rng.randint(0, 5))]
        rows.append((mk(), mk()))
    df = spark.createDataFrame(rows, "x array<int>, y array<int>")

    out = df.select(
        "x", "y",
        _expr({"$setUnion": ["$x", "$y"]}).alias("u"),
        _expr({"$setIntersection": ["$x", "$y"]}).alias("i"),
        _expr({"$setDifference": ["$x", "$y"]}).alias("d"),
        _expr({"$setEquals": ["$x", "$y"]}).alias("eq"),
        _expr({"$setIsSubset": ["$x", "$y"]}).alias("sub"),
        _expr({"$size": "$x"}).alias("n"),
    ).collect()
    for r in out:
        sx, sy = set(r.x), set(r.y)
        assert set(r.u) == sx | sy
        assert set(r.i) == sx & sy
        assert set(r.d) == sx - sy
        assert r.eq == (sx == sy)
        assert r.sub == (sx <= sy)
        assert r.n == len(r.x)
