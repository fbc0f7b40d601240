"""Differential matrix test for terminal $merge semantics.

The r3 advice pass found two real bugs in corner combinations
(fail+discard inserting rows; pipeline-$project {_id:0} clobbering the
merge key), so this locks the WHOLE option matrix against a small,
obviously-correct Python model of Mongo's documented semantics:

    whenMatched  in  replace | merge | keepExisting | fail
    whenNotMatched in insert | discard | fail

over fixtures that include a null-key row (Spark's join is eqNullSafe —
Mongo treats missing/null as a matchable value), a column only the
incoming side has (additive schema evolution), and disjoint/overlapping
key sets. Incoming keys are unique (run_pipeline dedupes duplicates
first; dedup row choice is arbitrary, so the matrix keeps it
deterministic by construction).
"""

from __future__ import annotations

import itertools

import pytest

TARGET_ROWS = [
    # _id, tag, v
    (1, "t1", 10),
    (2, "t2", 20),
    (None, "tnull", 30),
]
INCOMING_ROWS = [
    # _id, v, score   (score: column the target lacks; tag absent)
    (2, 200, "s2"),
    (None, 300, "snull"),
    (9, 900, "s9"),
]
T_COLS = ["_id", "tag", "v"]
I_COLS = ["_id", "v", "score"]
ALL_COLS = ["_id", "tag", "v", "score"]  # target fields first, then new


def model_merge(when_matched: str, when_not: str):
    """Reference semantics over plain dicts; returns sorted row tuples
    over ALL_COLS, or raises RuntimeError like the engine."""
    target = [dict(zip(T_COLS, r)) for r in TARGET_ROWS]
    incoming = [dict(zip(I_COLS, r)) for r in INCOMING_ROWS]
    tkeys = {t["_id"] for t in target}
    ikeys = {i["_id"] for i in incoming}
    matched_keys = tkeys & ikeys
    if when_matched == "fail" and matched_keys:
        raise RuntimeError("whenMatched: fail")
    if when_not == "fail" and (ikeys - tkeys):
        raise RuntimeError("whenNotMatched: fail")
    out = []
    for t in target:
        if t["_id"] in matched_keys:
            inc = next(i for i in incoming if i["_id"] == t["_id"])
            if when_matched == "replace":
                out.append({c: inc.get(c) for c in ALL_COLS})
            elif when_matched == "merge":
                row = {c: t.get(c) for c in ALL_COLS}
                for c in I_COLS:  # pipeline-produced columns win
                    row[c] = inc.get(c)
                out.append(row)
            else:  # keepExisting
                out.append({c: t.get(c) for c in ALL_COLS})
        else:
            out.append({c: t.get(c) for c in ALL_COLS})
    if when_not == "insert":
        for i in incoming:
            if i["_id"] not in tkeys:
                out.append({c: i.get(c) for c in ALL_COLS})
    return sorted(
        (tuple(r[c] for c in ALL_COLS) for r in out),
        key=lambda t: (t[0] is None, t[0], str(t)),
    )


@pytest.mark.parametrize(
    "when_matched,when_not",
    list(itertools.product(
        ["replace", "merge", "keepExisting", "fail"],
        ["insert", "discard", "fail"],
    )),
)
def test_merge_matrix_matches_model(spark, tmp_path, when_matched,
                                    when_not):
    from hummingbird_spark.pipeline import run_pipeline

    data_dir = str(tmp_path / f"{when_matched}_{when_not}")
    import os

    os.makedirs(data_dir)
    spark.createDataFrame(
        TARGET_ROWS, "_id long, tag string, v long"
    ).write.parquet(f"{data_dir}/tgt.parquet")
    src = spark.createDataFrame(
        INCOMING_ROWS, "_id long, v long, score string")
    stage = [{"$merge": {"into": "tgt", "on": "_id",
                         "whenMatched": when_matched,
                         "whenNotMatched": when_not}}]

    try:
        expected = model_merge(when_matched, when_not)
    except RuntimeError as e:
        with pytest.raises(RuntimeError, match=str(e).split(":")[0]):
            run_pipeline(spark, src, stage, data_dir=data_dir)
        # aborted merges must leave the target untouched
        got = spark.read.parquet(f"{data_dir}/tgt.parquet").collect()
        assert sorted(
            (tuple(r) for r in got),
            key=lambda t: (t[0] is None, t[0], str(t)),
        ) == sorted(
            TARGET_ROWS, key=lambda t: (t[0] is None, t[0], str(t)))
        return

    out = run_pipeline(spark, src, stage, data_dir=data_dir)
    got = sorted(
        (tuple(r[c] for c in ALL_COLS) for r in
         out.select(*ALL_COLS).collect()),
        key=lambda t: (t[0] is None, t[0], str(t)),
    )
    assert got == expected, (
        f"whenMatched={when_matched} whenNotMatched={when_not}")
