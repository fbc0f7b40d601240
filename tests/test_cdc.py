"""CDC decode/fold/merge tests — the Spark analogue of
oplog_utils_test.go (update variants v4/v5, bulk-apply counts) and
oplog_streamer_test.go (stream convergence)."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hummingbird_spark.streaming.cdc import (
    OPLOG_SCHEMA,
    apply_cdc_batch,
    decode_write_models,
    reduce_write_models,
    start_cdc_stream,
)
from hummingbird_spark.streaming.oplog import skip_oplog, unnest_apply_ops

TARGET_SCHEMA = T.StructType([
    T.StructField("_id", T.LongType()),
    T.StructField("x", T.StringType()),
    T.StructField("n", T.LongType()),
])

T0 = dt.datetime(2024, 1, 1)


def _ev(seq, op, o, o2=None, ns="db.c", ts=None):
    return (
        ts or (T0 + dt.timedelta(seconds=seq)),
        seq,
        ns,
        op,
        json.dumps(o) if isinstance(o, dict) else o,
        json.dumps(o2) if isinstance(o2, dict) else o2,
    )


def _oplog_df(spark, rows):
    return spark.createDataFrame(rows, OPLOG_SCHEMA)


def _decode(spark, rows, includes=None):
    return decode_write_models(_oplog_df(spark, rows), includes).collect()


# --- decode semantics (GetWriteModels, oplog_utils.go:208-281) ---

def test_decode_insert_delete_noop(spark):
    out = _decode(spark, [
        _ev(1, "i", {"_id": 1, "x": "a"}),
        _ev(2, "d", {"_id": 1}),
        _ev(3, "n", {"msg": "periodic noop"}),
    ])
    assert [(r.kind, r.key) for r in out] == [("replace", "1"), ("delete", "1")]


def test_decode_v2_diff_update(spark):
    # oplog_utils_test.go v5 format: {$v:2, diff:{u:{...}}}
    out = _decode(spark, [
        _ev(1, "u", {"$v": 2, "diff": {"u": {"x": "b"}}}, {"_id": 7}),
        _ev(2, "u", {"$v": 2, "diff": {"i": {"n": 9}}}, {"_id": 7}),
        _ev(3, "u", {"$v": 2, "diff": {"d": {"x": True}}}, {"_id": 7}),
    ])
    assert [r.kind for r in out] == ["patch"] * 3
    assert json.loads(out[0].set_json) == {"x": "b"}
    assert json.loads(out[1].set_json) == {"n": 9}
    assert out[2].set_json is None
    assert json.loads(out[2].unset_json) == {"x": True}


def test_decode_v4_set_and_replace(spark):
    out = _decode(spark, [
        _ev(1, "u", {"$set": {"x": "c"}}, {"_id": 3}),
        _ev(2, "u", {"$unset": {"n": 1}}, {"_id": 3}),
        _ev(3, "u", {"_id": 3, "x": "whole", "n": 1}, {"_id": 3}),
    ])
    assert [r.kind for r in out] == ["patch", "patch", "replace"]
    assert json.loads(out[0].set_json) == {"x": "c"}
    assert json.loads(out[1].unset_json) == {"n": 1}
    assert json.loads(out[2].doc)["x"] == "whole"


def test_decode_applyops_unnest(spark):
    # multi-statement transaction (sim.go:361-394 / oplog_utils.go:212-236)
    tx = {"applyOps": [
        {"op": "i", "ns": "db.c", "o": {"_id": 10, "x": "t1"}},
        {"op": "u", "ns": "db.c", "o": {"$set": {"x": "t2"}}, "o2": {"_id": 10}},
        {"op": "d", "ns": "db.other", "o": {"_id": 5}},
    ]}
    out = _decode(spark, [_ev(1, "c", tx, ns="db.$cmd")])
    kinds = sorted((r.ns, r.kind) for r in out)
    assert kinds == [("db.c", "patch"), ("db.c", "replace"),
                     ("db.other", "delete")]


def test_decode_nested_applyops(spark):
    # applyOps inside applyOps: the reference recurses
    # (oplog_utils.go:232); we unnest to depth 2
    inner = {"applyOps": [
        {"op": "i", "ns": "db.c", "o": {"_id": 20, "x": "deep"}},
    ]}
    outer = {"applyOps": [
        {"op": "i", "ns": "db.c", "o": {"_id": 21, "x": "shallow"}},
        {"op": "c", "ns": "db.$cmd", "o": inner},
    ]}
    out = _decode(spark, [_ev(1, "c", outer, ns="db.$cmd")])
    keys = sorted(r.key for r in out)
    assert keys == ["20", "21"]


def test_multi_namespace_stream_routing(spark, tmp_path):
    """One stream applying to two target tables simultaneously —
    per-namespace routing inside foreachBatch."""
    import shutil
    oplog_dir = str(tmp_path / "oplogs")
    target_root = str(tmp_path / "target")
    os.makedirs(oplog_dir)
    os.makedirs(target_root)
    with open(os.path.join(oplog_dir, "0.json"), "w") as f:
        for seq, ns, o in [
            (1, "db.users", {"_id": 1, "x": "u1", "n": 1}),
            (2, "db.items", {"_id": 5, "x": "i5", "n": 5}),
            (3, "db.users", {"_id": 2, "x": "u2", "n": 2}),
            (4, "db.ignored", {"_id": 9, "x": "no", "n": 9}),
        ]:
            f.write(json.dumps({
                "ts": (T0 + dt.timedelta(seconds=seq)).strftime(
                    "%Y-%m-%dT%H:%M:%S.000Z"),
                "seq": seq, "ns": ns, "op": "i",
                "o": json.dumps(o), "o2": None,
            }) + "\n")
    schemas = {"db.users": TARGET_SCHEMA, "db.items": TARGET_SCHEMA}
    q = start_cdc_stream(spark, oplog_dir, target_root, schemas,
                         includes=["db.users", "db.items"], key="_id",
                         checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    users = spark.read.parquet(f"{target_root}/users.parquet")
    items = spark.read.parquet(f"{target_root}/items.parquet")
    assert sorted(r._id for r in users.collect()) == [1, 2]
    assert [r._id for r in items.collect()] == [5]
    assert not os.path.exists(f"{target_root}/ignored.parquet")
    shutil.rmtree(target_root)


def test_skip_oplog_filters_system_and_resolves_cmd(spark):
    df = _oplog_df(spark, [
        _ev(1, "i", {"_id": 1}, ns="local.oplog.rs"),
        _ev(2, "i", {"_id": 2}, ns="config.chunks"),
        _ev(3, "i", {"_id": 3}, ns="db.keep"),
        _ev(4, "c", {"drop": "gone"}, ns="db.$cmd"),
        _ev(5, "c", {"create": "made"}, ns="db.$cmd"),
    ])
    out = skip_oplog(df).select("resolved_ns").collect()
    assert sorted(r.resolved_ns for r in out) == ["db.gone", "db.keep", "db.made"]
    # include routing (F5 + F3): only db.keep matches
    out2 = skip_oplog(df, ["db.keep"]).collect()
    assert [r.resolved_ns for r in out2] == ["db.keep"]


# --- per-key fold (ST6 ordering discipline) ---

def _reduce(spark, rows):
    models = decode_write_models(_oplog_df(spark, rows))
    return {r.key: r for r in reduce_write_models(models).collect()}


def test_fold_insert_then_update_same_batch(spark):
    # SURVEY §7 hard-part: update-after-insert-in-same-batch
    red = _reduce(spark, [
        _ev(1, "i", {"_id": 1, "x": "a", "n": 1}),
        _ev(2, "u", {"$set": {"x": "b"}}, {"_id": 1}),
    ])
    assert red["1"].action == "replace"
    assert json.loads(red["1"].doc) == {"_id": 1, "x": "b", "n": 1}


def test_fold_insert_update_delete(spark):
    red = _reduce(spark, [
        _ev(1, "i", {"_id": 2, "x": "a"}),
        _ev(2, "u", {"$set": {"x": "b"}}, {"_id": 2}),
        _ev(3, "d", {"_id": 2}),
    ])
    assert red["2"].action == "delete"


def test_fold_patch_only_accumulates(spark):
    red = _reduce(spark, [
        _ev(1, "u", {"$set": {"x": "p"}}, {"_id": 3}),
        _ev(2, "u", {"$set": {"n": 5}}, {"_id": 3}),
        _ev(3, "u", {"$unset": {"x": 1}}, {"_id": 3}),
    ])
    r = red["3"]
    assert r.action == "patch"
    assert json.loads(r.set_json) == {"n": 5}
    assert json.loads(r.unset_json) == {"x": 1}


def test_fold_same_event_set_and_unset_nets_to_unset(spark):
    # Pinned r3-verdict regression: a single legacy {$set, $unset} event
    # touching the same field applies sets-then-unsets, so the unset wins.
    # Falsifying example from test_cdc_fold_properties:
    # [patch({}, unset=[x]), patch({x:0}, unset=[x])] must leave x unset,
    # not fold to a no-op patch.
    red = _reduce(spark, [
        _ev(1, "u", {"$unset": {"x": 1}}, {"_id": 9}),
        _ev(2, "u", {"$set": {"x": 0}, "$unset": {"x": 1}}, {"_id": 9}),
    ])
    r = red["9"]
    assert r.action == "patch"
    assert r.set_json is None
    assert json.loads(r.unset_json) == {"x": 1}


def test_fold_delete_then_reinsert(spark):
    red = _reduce(spark, [
        _ev(1, "d", {"_id": 4}),
        _ev(2, "i", {"_id": 4, "x": "back", "n": 2}),
    ])
    assert red["4"].action == "replace"
    assert json.loads(red["4"].doc)["x"] == "back"


def test_fold_patch_after_delete_is_noop(spark):
    red = _reduce(spark, [
        _ev(1, "d", {"_id": 5}),
        _ev(2, "u", {"$set": {"x": "ghost"}}, {"_id": 5}),
    ])
    assert red["5"].action == "delete"


# --- merge-apply into parquet target (BulkWriteOplogs semantics) ---

@pytest.fixture()
def target(tmp_path, spark):
    path = str(tmp_path / "c.parquet")
    spark.createDataFrame(
        [(1, "one", 10), (2, "two", 20), (3, "three", 30)], TARGET_SCHEMA
    ).write.parquet(path)
    return path


def _apply(spark, target_path, rows):
    models = decode_write_models(_oplog_df(spark, rows))
    apply_cdc_batch(
        spark, reduce_write_models(models), target_path, "_id", TARGET_SCHEMA
    )
    return {
        r._id: r for r in spark.read.parquet(target_path).collect()
    }


def test_apply_insert_update_delete(spark, target):
    state = _apply(spark, target, [
        _ev(1, "i", {"_id": 4, "x": "four", "n": 40}),
        _ev(2, "u", {"$set": {"x": "TWO"}}, {"_id": 2}),
        _ev(3, "d", {"_id": 3}),
        _ev(4, "u", {"$unset": {"n": 1}}, {"_id": 1}),
    ])
    assert set(state) == {1, 2, 4}
    assert state[2].x == "TWO" and state[2].n == 20
    assert state[4].x == "four"
    assert state[1].n is None  # $unset -> null (declared deviation)


def test_apply_patch_on_missing_key_is_noop(spark, target):
    state = _apply(spark, target, [
        _ev(1, "u", {"$set": {"x": "nope"}}, {"_id": 99}),
    ])
    assert set(state) == {1, 2, 3}



def test_apply_set_null_value(spark, target):
    """$set {"field": null} stores null (key presence, not value,
    decides — matches MongoDB; the previous value-null check skipped it)."""
    state = _apply(spark, target, [
        _ev(1, "u", {"$set": {"x": None}}, {"_id": 1}),
    ])
    assert state[1].x is None and state[1].n == 10

def test_apply_replace_existing(spark, target):
    state = _apply(spark, target, [
        _ev(1, "u", {"_id": 1, "x": "replaced", "n": 111}, {"_id": 1}),
    ])
    assert state[1].x == "replaced" and state[1].n == 111


def test_apply_is_idempotent(spark, target):
    rows = [
        _ev(1, "i", {"_id": 7, "x": "seven", "n": 70}),
        _ev(2, "u", {"$set": {"x": "SEVEN"}}, {"_id": 7}),
        _ev(3, "d", {"_id": 2}),
    ]
    s1 = _apply(spark, target, rows)
    s2 = _apply(spark, target, rows)  # replay the same batch (ST7)
    assert {k: (v.x, v.n) for k, v in s1.items()} == {
        k: (v.x, v.n) for k, v in s2.items()
    }


# --- end-to-end streaming convergence (oplog_streamer_test.go analogue) ---

@pytest.mark.parametrize("num_buckets", [None, 8])
def test_stream_convergence_with_checkpoint_restart(spark, tmp_path,
                                                    num_buckets):
    oplog_dir = str(tmp_path / "oplogs")
    target_root = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(oplog_dir)
    os.makedirs(target_root)

    def write_file(name, rows):
        with open(os.path.join(oplog_dir, name), "w") as f:
            for ts, seq, ns, op, o, o2 in rows:
                f.write(json.dumps({
                    "ts": ts.strftime("%Y-%m-%dT%H:%M:%S.000Z"),
                    "seq": seq, "ns": ns, "op": op, "o": o, "o2": o2,
                }) + "\n")

    schemas = {"db.c": TARGET_SCHEMA}

    # phase 1: backfill-time capture (spool) — inserts + a transaction
    write_file("00.json", [
        _ev(1, "i", {"_id": 1, "x": "a", "n": 1}),
        _ev(2, "i", {"_id": 2, "x": "b", "n": 2}),
        _ev(3, "c", {"applyOps": [
            {"op": "i", "ns": "db.c", "o": {"_id": 3, "x": "tx", "n": 3}},
            {"op": "u", "ns": "db.c", "o": {"$set": {"x": "tx2"}},
             "o2": {"_id": 3}},
        ]}, ns="db.$cmd"),
    ])
    q = start_cdc_stream(spark, oplog_dir, target_root, schemas,
                         includes=["db.c"], checkpoint=ckpt,
                         num_buckets=num_buckets)
    q.awaitTermination(120)
    from hummingbird_spark.streaming.cdc import read_cdc_target
    state = {r._id: r for r in
             read_cdc_target(spark, f"{target_root}/c.parquet").collect()}
    assert set(state) == {1, 2, 3}
    assert state[3].x == "tx2"

    # phase 2: restart from checkpoint — only the new file is applied
    write_file("01.json", [
        _ev(10, "u", {"$v": 2, "diff": {"u": {"x": "A"}}}, {"_id": 1}),
        _ev(11, "d", {"_id": 2}),
        _ev(12, "i", {"_id": 4, "x": "d", "n": 4}),
    ])
    q2 = start_cdc_stream(spark, oplog_dir, target_root, schemas,
                          includes=["db.c"], checkpoint=ckpt,
                          num_buckets=num_buckets)
    q2.awaitTermination(120)
    state = {r._id: r for r in
             read_cdc_target(spark, f"{target_root}/c.parquet").collect()}
    assert set(state) == {1, 3, 4}
    assert state[1].x == "A" and state[1].n == 1


# ---------------------------------------------------------------------------
# Bucketed (partition-pruned) merge
# ---------------------------------------------------------------------------

def _apply_bucketed(spark, target_path, rows, num_buckets=8, evolve=False):
    from hummingbird_spark.streaming.cdc import (
        apply_cdc_batch_bucketed, read_cdc_target,
    )
    models = decode_write_models(_oplog_df(spark, rows))
    apply_cdc_batch_bucketed(
        spark, reduce_write_models(models), target_path, "_id",
        TARGET_SCHEMA, num_buckets=num_buckets, evolve=evolve,
    )
    return {r._id: r for r in
            read_cdc_target(spark, target_path, TARGET_SCHEMA).collect()}


def test_bucketed_apply_matches_flat(spark, tmp_path):
    """The bucketed merge must converge to the same state as the flat
    merge over a multi-batch history."""
    batches = [
        [_ev(i, "i", {"_id": i, "x": f"v{i}", "n": i * 10}) for i in range(20)],
        [_ev(30, "u", {"$set": {"x": "patched"}}, {"_id": 3}),
         _ev(31, "d", {"_id": 7}),
         _ev(32, "u", {"$unset": {"n": 1}}, {"_id": 11})],
        [_ev(40, "i", {"_id": 100, "x": "new", "n": 1}),
         _ev(41, "u", {"_id": 5, "x": "replaced", "n": 555}, {"_id": 5})],
    ]
    flat, bucketed = str(tmp_path / "flat"), str(tmp_path / "bucketed")
    for rows in batches:
        models = decode_write_models(_oplog_df(spark, rows))
        apply_cdc_batch(spark, reduce_write_models(models), flat, "_id",
                        TARGET_SCHEMA)
        _apply_bucketed(spark, bucketed, rows)
    from hummingbird_spark.streaming.cdc import read_cdc_target
    a = {tuple(r) for r in spark.read.parquet(flat).collect()}
    b = {tuple(r) for r in read_cdc_target(spark, bucketed).collect()}
    assert a == b and len(a) == 20


def test_bucketed_apply_prunes_untouched_partitions(spark, tmp_path):
    """A batch touching one key must not rewrite (or even re-read) the
    other buckets: untouched partition files stay byte-identical."""
    import glob as g
    target = str(tmp_path / "t")
    _apply_bucketed(spark, target, [
        _ev(i, "i", {"_id": i, "x": f"v{i}", "n": i}) for i in range(50)
    ])
    before = {p: os.stat(p).st_mtime_ns
              for p in g.glob(f"{target}/__bucket=*/*.parquet")}
    assert len(g.glob(f"{target}/__bucket=*")) > 1

    state = _apply_bucketed(spark, target, [
        _ev(100, "u", {"$set": {"x": "hot"}}, {"_id": 17}),
    ])
    assert state[17].x == "hot" and len(state) == 50

    from pyspark.sql import functions as FF
    from hummingbird_spark.streaming.cdc import _bucket_col
    hot_bucket = spark.range(1).select(
        _bucket_col(FF.lit("17"), 8).alias("b")).collect()[0].b
    after = {p: os.stat(p).st_mtime_ns
             for p in g.glob(f"{target}/__bucket=*/*.parquet")}
    untouched_before = {p: t for p, t in before.items()
                        if f"__bucket={hot_bucket}/" not in p}
    assert untouched_before  # there are other buckets
    for p, t in untouched_before.items():
        assert after[p] == t, f"untouched partition rewritten: {p}"


def test_bucketed_apply_clears_emptied_bucket(spark, tmp_path):
    """Deleting every key of a bucket must empty it — not leave stale
    files behind (the dynamic-partition-overwrite trap)."""
    target = str(tmp_path / "t")
    state = _apply_bucketed(spark, target, [
        _ev(1, "i", {"_id": 1, "x": "a", "n": 1}),
        _ev(2, "i", {"_id": 2, "x": "b", "n": 2}),
    ], num_buckets=2)
    state = _apply_bucketed(spark, target, [
        _ev(10, "d", {"_id": 1}),
        _ev(11, "d", {"_id": 2}),
    ], num_buckets=2)
    assert state == {}


# --- schema evolution (schemaless-source parity, SURVEY §1.2) ---

def test_apply_evolves_schema_with_new_fields(spark, tmp_path):
    """A later batch introduces fields the target never saw: inserts
    with `extra`, a patch $set-ing `score`. With evolve=True the
    target gains the columns (inferred string/double), pre-existing
    rows read NULL there, and untouched columns are unchanged."""
    path = str(tmp_path / "t.parquet")
    b1 = reduce_write_models(decode_write_models(_oplog_df(spark, [
        _ev(1, "i", {"_id": 1, "x": "a", "n": 10}),
        _ev(2, "i", {"_id": 2, "x": "b", "n": 20}),
    ])))
    apply_cdc_batch(spark, b1, path, "_id", TARGET_SCHEMA, evolve=True)

    b2 = reduce_write_models(decode_write_models(_oplog_df(spark, [
        _ev(3, "i", {"_id": 3, "x": "c", "n": 30, "extra": "hello"}),
        _ev(4, "u", {"$set": {"score": 1.5}}, {"_id": 1}),
    ])))
    apply_cdc_batch(spark, b2, path, "_id", TARGET_SCHEMA, evolve=True)

    got = {r._id: r for r in spark.read.parquet(path).collect()}
    assert set(got) == {1, 2, 3}
    assert got[3].extra == "hello"
    assert got[1].extra is None and got[2].extra is None
    assert got[1].score == 1.5
    assert got[2].score is None
    assert dict(spark.read.parquet(path).dtypes)["score"] == "double"
    assert dict(spark.read.parquet(path).dtypes)["extra"] == "string"
    # untouched values survived both merges
    assert (got[1].x, got[1].n) == ("a", 10)


def test_evolve_type_conflict_degrades_to_string(spark):
    from hummingbird_spark.streaming.cdc import evolve_schema

    models = reduce_write_models(decode_write_models(_oplog_df(spark, [
        _ev(1, "i", {"_id": 1, "mixed": 5}),
        _ev(2, "i", {"_id": 2, "mixed": "five"}),
    ])))
    out = evolve_schema(models, TARGET_SCHEMA)
    assert dict((f.name, f.dataType.simpleString())
                for f in out.fields)["mixed"] == "string"


def test_evolve_no_new_fields_is_identity(spark):
    from hummingbird_spark.streaming.cdc import evolve_schema

    models = reduce_write_models(decode_write_models(_oplog_df(spark, [
        _ev(1, "i", {"_id": 1, "x": "a"}),
    ])))
    assert evolve_schema(models, TARGET_SCHEMA) == TARGET_SCHEMA


def test_bucketed_apply_evolves_across_buckets(spark, tmp_path):
    """Schema evolution on the bucketed sink: only touched buckets are
    rewritten, so old- and new-width files coexist; mergeSchema reads
    union them with NULL gaps. Keys are spread so batch 2 touches a
    strict subset of buckets."""
    from hummingbird_spark.streaming.cdc import (
        apply_cdc_batch_bucketed, read_cdc_target,
    )

    path = str(tmp_path / "bt.parquet")
    b1 = reduce_write_models(decode_write_models(_oplog_df(spark, [
        _ev(i, "i", {"_id": i, "x": f"x{i}", "n": i * 10})
        for i in range(1, 9)
    ])))
    apply_cdc_batch_bucketed(spark, b1, path, "_id", TARGET_SCHEMA,
                             num_buckets=4, evolve=True)

    b2 = reduce_write_models(decode_write_models(_oplog_df(spark, [
        _ev(100, "u", {"$set": {"grade": "A"}}, {"_id": 1}),
    ])))
    apply_cdc_batch_bucketed(spark, b2, path, "_id", TARGET_SCHEMA,
                             num_buckets=4, evolve=True)

    got = {r._id: r for r in read_cdc_target(spark, path).collect()}
    assert set(got) == set(range(1, 9))
    assert got[1].grade == "A"
    for i in range(2, 9):
        assert got[i].grade is None, i
    assert (got[1].x, got[1].n) == ("x1", 10)


def test_stream_with_evolve_picks_up_new_fields(spark, tmp_path):
    """End-to-end: a checkpointed stream with evolve=True widens the
    target when a later file introduces a new field."""
    oplog_dir = tmp_path / "oplog"
    oplog_dir.mkdir()
    target_root = str(tmp_path / "tgt")

    def write_file(name, events):
        with open(oplog_dir / name, "w") as fh:
            for ts, seq, ns, op, o, o2 in events:
                fh.write(json.dumps({
                    "ts": ts.isoformat(), "seq": seq, "ns": ns,
                    "op": op, "o": o, "o2": o2,
                }) + "\n")

    write_file("b1.json", [_ev(1, "i", {"_id": 1, "x": "a", "n": 1})])
    q = start_cdc_stream(
        spark, str(oplog_dir), target_root, {"db.c": TARGET_SCHEMA},
        evolve=True,
    )
    q.awaitTermination(120)

    write_file("b2.json", [
        _ev(2, "i", {"_id": 2, "x": "b", "n": 2, "tag": "new"}),
    ])
    q = start_cdc_stream(
        spark, str(oplog_dir), target_root, {"db.c": TARGET_SCHEMA},
        evolve=True,
    )
    q.awaitTermination(120)

    from hummingbird_spark.streaming.cdc import read_cdc_target
    got = {r._id: r for r in
           read_cdc_target(spark, f"{target_root}/c.parquet").collect()}
    assert got[2].tag == "new"
    assert got[1].tag is None


def test_bucketed_apply_one_file_per_bucket(spark, tmp_path):
    """Each bucket directory holds exactly ONE data file after seed and
    after incremental merges — without the pre-write repartition, every
    upstream task writes its own fragment per bucket and small files
    compound with every batch (the 100 TB killer for a streaming sink)."""
    import glob as g
    target = str(tmp_path / "t")
    _apply_bucketed(spark, target, [
        _ev(i, "i", {"_id": i, "x": f"v{i}", "n": i}) for i in range(200)
    ])
    for d in g.glob(f"{target}/__bucket=*"):
        files = g.glob(f"{d}/*.parquet")
        assert len(files) == 1, f"{d}: {len(files)} files after seed"

    _apply_bucketed(spark, target, [
        _ev(300 + i, "u", {"$set": {"x": "hot"}}, {"_id": i})
        for i in range(0, 200, 3)
    ])
    for d in g.glob(f"{target}/__bucket=*"):
        files = g.glob(f"{d}/*.parquet")
        assert len(files) == 1, f"{d}: {len(files)} files after merge"


def test_evolved_column_survives_later_batches(spark, tmp_path):
    """A batch that doesn't mention a previously-evolved field must not
    narrow the target: the column and its values survive later merges,
    with evolve on OR off (retention is unconditional)."""
    path = str(tmp_path / "t.parquet")

    def batch(rows, evolve):
        models = reduce_write_models(
            decode_write_models(_oplog_df(spark, rows)))
        apply_cdc_batch(spark, models, path, "_id", TARGET_SCHEMA,
                        evolve=evolve)

    batch([_ev(1, "i", {"_id": 1, "x": "a", "n": 1})], evolve=True)
    batch([_ev(2, "i", {"_id": 2, "x": "b", "n": 2, "tag": "new"})],
          evolve=True)
    # the regression: a tag-less batch used to rewrite the target
    # down to base width, dropping doc 2's tag entirely
    batch([_ev(3, "i", {"_id": 3, "x": "c", "n": 3})], evolve=True)
    got = {r._id: r for r in spark.read.parquet(path).collect()}
    assert got[2].tag == "new" and got[1].tag is None and got[3].tag is None

    # evolve=False on an already-evolved target: still retained
    batch([_ev(4, "i", {"_id": 4, "x": "d", "n": 4})], evolve=False)
    got = {r._id: r for r in spark.read.parquet(path).collect()}
    assert got[2].tag == "new" and got[4].tag is None


def test_bucketed_evolved_column_survives_bucket_rewrite(spark, tmp_path):
    """Rewriting an evolved doc's bucket with a batch that doesn't
    carry the evolved field must keep the field's values."""
    path = str(tmp_path / "t.parquet")
    _apply_bucketed(spark, path, [
        _ev(i, "i", {"_id": i, "x": f"v{i}", "n": i}) for i in range(10)
    ])
    state = _apply_bucketed(spark, path, [
        _ev(20, "i", {"_id": 2, "x": "v2", "n": 2, "grade": "A"}),
    ], evolve=True)
    assert state[2].grade == "A"
    # patch doc 2 itself (same bucket) WITHOUT mentioning grade
    state = _apply_bucketed(spark, path, [
        _ev(30, "u", {"$set": {"x": "patched"}}, {"_id": 2}),
    ], evolve=True)
    assert state[2].x == "patched"
    assert state[2].grade == "A", "evolved column lost in bucket rewrite"


def test_apply_stats_counters(spark, tmp_path):
    """A6/BulkWriteOplogsResult parity: per-batch inserted/updated/
    deleted/noop counts, observed on the merge plan (no extra pass)."""
    path = str(tmp_path / "t.parquet")

    def run(rows):
        models = reduce_write_models(
            decode_write_models(_oplog_df(spark, rows)))
        return apply_cdc_batch(spark, models, path, "_id", TARGET_SCHEMA)

    s1 = run([_ev(i, "i", {"_id": i, "x": f"v{i}", "n": i})
              for i in range(5)])
    assert (s1.inserted, s1.updated, s1.deleted, s1.noops) == (5, 0, 0, 0)

    s2 = run([
        _ev(10, "u", {"$set": {"x": "p"}}, {"_id": 1}),    # update hit
        _ev(11, "d", {"_id": 2}),                           # delete hit
        _ev(12, "u", {"$set": {"x": "q"}}, {"_id": 99}),    # patch miss
        _ev(13, "i", {"_id": 50, "x": "new", "n": 0}),      # insert
        _ev(14, "d", {"_id": 98}),                          # delete miss
    ])
    assert (s2.inserted, s2.updated, s2.deleted, s2.noops) == (1, 1, 1, 2)
    assert s2.total == 5

    # bucketed variant reports the same shape
    from hummingbird_spark.streaming.cdc import apply_cdc_batch_bucketed
    bpath = str(tmp_path / "b.parquet")
    models = reduce_write_models(decode_write_models(_oplog_df(spark, [
        _ev(i, "i", {"_id": i, "x": f"v{i}", "n": i}) for i in range(7)
    ])))
    sb = apply_cdc_batch_bucketed(spark, models, bpath, "_id",
                                  TARGET_SCHEMA, num_buckets=4)
    assert (sb.inserted, sb.updated, sb.deleted, sb.noops) == (7, 0, 0, 0)
    models2 = reduce_write_models(decode_write_models(_oplog_df(spark, [
        _ev(20, "d", {"_id": 3}),
        _ev(21, "u", {"$set": {"n": 99}}, {"_id": 4}),
    ])))
    sb2 = apply_cdc_batch_bucketed(spark, models2, bpath, "_id",
                                   TARGET_SCHEMA, num_buckets=4)
    assert (sb2.inserted, sb2.updated, sb2.deleted, sb2.noops) == (0, 1, 1, 0)


def test_apply_stats_survive_empty_result(spark, tmp_path):
    """Delete-everything batch: the merge result is runtime-empty, AQE
    drops the CollectMetrics node, and the counters come from the exact
    pre-swap recompute instead of silently failing."""
    path = str(tmp_path / "t.parquet")

    def run(rows):
        models = reduce_write_models(
            decode_write_models(_oplog_df(spark, rows)))
        return apply_cdc_batch(spark, models, path, "_id", TARGET_SCHEMA)

    run([_ev(1, "i", {"_id": 1, "x": "a", "n": 1}),
         _ev(2, "i", {"_id": 2, "x": "b", "n": 2})])
    s = run([_ev(10, "d", {"_id": 1}), _ev(11, "d", {"_id": 2})])
    assert (s.inserted, s.updated, s.deleted, s.noops) == (0, 0, 2, 0)
    assert spark.read.parquet(path).count() == 0


def test_stream_reports_apply_stats(spark, tmp_path):
    """The streaming entrypoint surfaces per-(namespace, batch)
    ApplyStats through on_stats — the reference's bulk-write counter
    log line."""
    oplog_dir = tmp_path / "oplog"
    oplog_dir.mkdir()
    with open(oplog_dir / "b1.json", "w") as fh:
        for ts, seq, ns, op, o, o2 in [
            _ev(1, "i", {"_id": 1, "x": "a", "n": 1}),
            _ev(2, "i", {"_id": 2, "x": "b", "n": 2}),
            _ev(3, "u", {"$set": {"x": "p"}}, {"_id": 1}),
            _ev(4, "d", {"_id": 9}),
        ]:
            fh.write(json.dumps({
                "ts": ts.isoformat(), "seq": seq, "ns": ns,
                "op": op, "o": o, "o2": o2,
            }) + "\n")

    seen = []
    q = start_cdc_stream(
        spark, str(oplog_dir), str(tmp_path / "tgt"),
        {"db.c": TARGET_SCHEMA},
        on_stats=lambda ns, bid, s: seen.append((ns, s)),
    )
    q.awaitTermination(120)
    assert len(seen) == 1
    ns, s = seen[0]
    assert ns == "db.c"
    # the fold collapses i+u on _id 1 to one replace-with-patch model
    assert (s.inserted, s.deleted, s.noops) == (2, 0, 1)
