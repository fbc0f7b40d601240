"""CLI surface tests (python -m hummingbird_spark ...) — the analogue
of the reference's entry-point tests (start_test.go, resume_test.go,
compare_test.go) run in-process against the main() function."""

from __future__ import annotations

import json

import pytest

from hummingbird_spark.__main__ import main
from tests.conftest import SF_SMOKE


@pytest.fixture()
def cfg_file(tmp_path):
    cfg = {
        "command": "data-only",
        "drop": True,
        "source": SF_SMOKE,
        "target": str(tmp_path / "target"),
        "includes": [
            {"namespace": "part",
             "filter": {"p_brand": {"$in": ["Brand#2"]}}, "limit": 30},
            {"namespace": "nation", "to": "nations"},
        ],
        "key": "p_partkey",
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_cli_start_resume_compare(spark, cfg_file, capsys):
    assert main(["start", cfg_file]) == 0
    started = json.loads(capsys.readouterr().out.strip())
    assert started["command"] == "start"
    by_ns = {t["ns"]: t for t in started["tables"]}
    assert by_ns["nation"]["rows"] == 25
    assert by_ns["nation"]["to"] == "nations"
    assert 0 < by_ns["part"]["rows"] <= 30

    assert main(["resume", cfg_file]) == 0
    resumed = json.loads(capsys.readouterr().out.strip())
    assert all(t["skipped"] for t in resumed["tables"])

    assert main(["compare", cfg_file]) == 0
    compared = json.loads(capsys.readouterr().out.strip())
    assert compared["all_equal"]


def test_cli_compare_detects_divergence(spark, cfg_file, tmp_path, capsys):
    from pyspark.sql import functions as F
    import shutil

    assert main(["start", cfg_file]) == 0
    capsys.readouterr()
    tgt = str(tmp_path / "target" / "nations.parquet")
    broken = spark.read.parquet(tgt).filter(F.col("n_nationkey") != 3)
    broken.write.mode("overwrite").parquet(tgt + ".tmp")
    shutil.rmtree(tgt)
    shutil.move(tgt + ".tmp", tgt)

    assert main(["compare", cfg_file]) == 1  # nonzero on divergence
    out = json.loads(capsys.readouterr().out.strip())
    bad = [n for n in out["namespaces"] if not n["equal"]]
    assert len(bad) == 1 and bad[0]["missing_in_target"] == 1


def test_cli_worker_and_version(cfg_file, capsys):
    assert main(["version"]) == 0
    ver = capsys.readouterr().out.strip()
    assert ver and "." in ver

    assert main(["worker", cfg_file]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["config_valid"] is True
    assert out["namespaces"] == 2


def test_cli_compact(spark, tmp_path, capsys):
    from hummingbird_spark.sources.tables import load_table

    target = str(tmp_path / "c")
    for _ in range(3):
        (load_table(spark, SF_SMOKE, "region")
         .repartition(4).write.mode("append").parquet(target))
    assert main(["compact", target, "--target-mb", "64"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["command"] == "compact"
    assert out["files_after"] == 1
    assert out["rows"] == 5 * 3


def test_cli_pipeline(spark, tmp_path, capsys):
    pl = tmp_path / "pl.json"
    pl.write_text(json.dumps([
        {"$match": {"o_orderstatus": "F"}},
        {"$group": {"_id": "$o_orderpriority", "n": {"$sum": 1}}},
        {"$sort": {"_id": 1}},
    ]))
    assert main(["pipeline", str(pl), "--table", "orders",
                 "--data", SF_SMOKE]) == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 5
    assert lines[0]["_id"] == "1-URGENT"
    assert all(set(l) == {"_id", "n"} for l in lines)


def test_cli_pipeline_lookup_uses_sibling_tables(spark, tmp_path, capsys):
    pl = tmp_path / "pl.json"
    pl.write_text(json.dumps([
        {"$match": {"n_nationkey": {"$lt": 3}}},
        {"$lookup": {"from": "region", "localField": "n_regionkey",
                     "foreignField": "r_regionkey", "as": "regions"}},
        {"$sort": {"n_nationkey": 1}},
    ]))
    assert main(["pipeline", str(pl), "--table", "nation",
                 "--data", SF_SMOKE]) == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3
    assert all(len(l["regions"]) == 1 for l in lines)


def test_cli_query_list_and_run(spark, capsys):
    assert main(["query", "--list"]) == 0
    listing = capsys.readouterr().out
    assert "status_counts\toracle" in listing
    assert "knn_lsh\toracle" in listing  # gained a full SQL oracle in r5
    assert "knn_ivf\trows-only" in listing

    assert main(["query", "status_counts", "--data", SF_SMOKE]) == 0
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert {r["status"] for r in rows} == {"F", "O", "P"}

    assert main(["query", "no_such_query"]) == 2


def test_cli_explain_shows_physical_plan(spark, capsys):
    assert main(["explain", "histogram_price", "--data", SF_SMOKE]) == 0
    plan = capsys.readouterr().out
    assert "Physical Plan" in plan
    assert "Scan parquet" in plan
    # the formatted view carries the scan detail the plan tests audit
    assert "ReadSchema" in plan


def test_cli_sql(spark, capsys):
    assert main(["sql",
                 "SELECT r_name, COUNT(*) AS n FROM region "
                 "JOIN nation ON n_regionkey = r_regionkey "
                 "GROUP BY r_name ORDER BY r_name",
                 "--data", SF_SMOKE]) == 0
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 5 and sum(r["n"] for r in rows) == 25

    assert main(["sql", "SELECT 1 AS one", "--data", SF_SMOKE,
                 "--explain"]) == 0
    assert "Physical Plan" in capsys.readouterr().out


def test_cli_start_with_port_serves_progress(spark, cfg_file, capsys):
    """--port N serves the progress UI during the migration (the
    reference's -port 3629 web server, web_server.go:19-84). Port 0
    binds ephemerally so the test never collides."""
    assert main(["start", cfg_file, "--port", "0"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["total_rows"] > 0


def test_web_server_endpoints():
    import urllib.request

    from hummingbird_spark.web import ProgressTracker, start_web_server

    tr = ProgressTracker()
    tr.add("db.a", "db.b")
    tr.start("db.a")
    tr.complete("db.a", rows=42)
    server = start_web_server(tr, port=0)
    try:
        port = server.server_address[1]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/progress"
        ) as resp:
            snap = json.loads(resp.read())
        assert snap["ok"] == 1
        assert snap["percent"] == 50.0
        assert snap["counts"] == {"added": 1, "processing": 0,
                                  "completed": 1, "failed": 0}
        assert snap["rows_copied"] == 42
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as resp:
            html = resp.read().decode()
        assert "50.0" in html and "progress" in html.lower()
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/favicon.ico"
        ) as resp:
            assert resp.status == 204
    finally:
        server.shutdown()


def test_progress_tracker_failure_and_eta():
    import time as _time

    from hummingbird_spark.web import ProgressTracker

    tr = ProgressTracker(started_at=_time.time() - 10)
    tr.add("a", "b", "c", "d")
    for ns in ("a", "b"):
        tr.start(ns)
        tr.complete(ns, rows=1)
    tr.start("c")
    tr.fail("c")
    snap = tr.snapshot()
    assert snap["counts"]["failed"] == 1
    assert snap["percent"] == 50.0
    # 2 done in ~10s -> ~10s for the remaining 2
    assert 5.0 < snap["eta_seconds"] < 20.0


def test_cli_retention(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    path = str(tmp_path / "cap.parquet")
    spark.range(400).select(F.col("id").alias("seq")).write.parquet(path)
    assert main(["retention", path, "--order-col", "seq",
                 "--max-rows", "150"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["enforced"] and out["rows_after"] == 150
    assert spark.read.parquet(path).count() == 150


def test_cli_profile(spark, capsys):
    from tests.conftest import SF_SMOKE

    assert main(["profile", f"{SF_SMOKE}/region.parquet"]) == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    by_col = {r["column"]: r for r in rows}
    assert by_col["r_regionkey"]["n_rows"] == 5
    assert by_col["r_regionkey"]["n_null"] == 0
    assert by_col["r_regionkey"]["n_distinct"] == 5
    assert by_col["r_regionkey"]["min_value"] == "0"
    assert by_col["r_regionkey"]["max_value"] == "4"


def test_cli_verify_subset(spark, capsys):
    assert main(["verify", "--data", SF_SMOKE,
                 "--only", "status_counts",
                 "--only", "knn_ivf",
                 "--only", "pricing_summary"]) == 0
    lines = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    by_q = {l["query"]: l for l in lines if "query" in l}
    assert by_q["status_counts"]["status"] == "match"
    assert by_q["pricing_summary"]["status"] == "match"
    # knn_ivf is genuinely probabilistic (sampled centroid training) —
    # it stays the representative rows-only entry now that simhash has
    # a full SQL oracle
    assert by_q["knn_ivf"]["status"] == "rows_only"
    assert lines[-1]["failures"] == 0


def test_cli_curate(spark, tmp_path, capsys):
    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "curated")
    assert main(["curate", f"{SF_SMOKE}/documents.parquet", out,
                 "--lang", "en", "--min-quality", "0.4"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_input"] == rep["n_kept"] + sum(rep["dropped"].values())
    assert rep["n_kept"] > 0
    assert spark.read.parquet(out).count() == rep["n_kept"]


def test_cli_search(spark, capsys):
    from tests.conftest import SF_SMOKE

    assert main(["search", "spark query", "--data",
                 f"{SF_SMOKE}/documents.parquet", "--k", "5"]) == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(rows) <= 5
    assert all(r["score"] > 0 for r in rows)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)

    assert main(["search", "spark query", "--data",
                 f"{SF_SMOKE}/documents.parquet", "--k", "5",
                 "--embeddings", f"{SF_SMOKE}/embeddings.parquet"]) == 0
    fused = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(fused) <= 5
    assert all("rrf_score" in r for r in fused)


def test_cli_analyze(spark, capsys):
    from tests.conftest import SF_SMOKE

    n = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert main(["analyze", f"{SF_SMOKE}/documents.parquet"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_docs"] == n
    assert rep["total_tokens"] > 0
    assert 0.0 <= rep["quality_keep_rate"] <= 1.0
    assert 0.0 <= rep["exact_dup_rate"] < 1.0
    assert sum(rep["languages"].values()) == n
    assert sum(s["n_docs"] for s in rep["sources"].values()) == n
    assert "dup_substring_token_rate" not in rep   # opt-in stage
    assert main(["analyze", f"{SF_SMOKE}/documents.parquet",
                 "--dup-substrings", "10"]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= rep2["dup_substring_token_rate"] < 1.0


def test_cli_dsir(spark, tmp_path, capsys):
    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "picked.parquet")
    assert main(["dsir", f"{SF_SMOKE}/documents.parquet", out,
                 "-k", "20", "--target-filter", "lang = 'en'",
                 "--seed", "cli"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_selected"] == 20
    picked = spark.read.parquet(out)
    assert {"doc_id", "text", "log_w", "gumbel_score"} <= set(picked.columns)

    # the distributed path must pick the identical docs
    out2 = str(tmp_path / "picked2.parquet")
    assert main(["dsir", f"{SF_SMOKE}/documents.parquet", out2,
                 "-k", "20", "--target-filter", "lang = 'en'",
                 "--seed", "cli", "--distributed"]) == 0
    ids = {r["doc_id"] for r in picked.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in
            spark.read.parquet(out2).select("doc_id").collect()}
    assert ids == ids2


def test_cli_cluster(spark, tmp_path, capsys):
    out = str(tmp_path / "clustered.parquet")
    assert main(["cluster", f"{SF_SMOKE}/embeddings.parquet", out,
                 "-k", "4", "--iterations", "2"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_output"] == rep["n_input"] > 0
    assert set(rep["cluster_sizes"]) == {str(c) for c in range(4)} or \
        set(rep["cluster_sizes"]) == set(range(4))
    full = spark.read.parquet(out)
    assert {"vec_id", "embedding", "cluster", "dist2"} <= set(full.columns)

    # balanced sample: exactly min(n_per, cluster size) per cluster
    out2 = str(tmp_path / "sampled.parquet")
    assert main(["cluster", f"{SF_SMOKE}/embeddings.parquet", out2,
                 "-k", "4", "--iterations", "2", "--sample", "10"]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    sizes = {int(c): n for c, n in rep["cluster_sizes"].items()} \
        if isinstance(next(iter(rep["cluster_sizes"])), str) \
        else rep["cluster_sizes"]
    expect = {c: min(10, n) for c, n in sizes.items()}
    got = {int(c): n for c, n in rep2["cluster_sizes"].items()}
    assert got == expect


def test_cli_sample(spark, tmp_path, capsys):
    out = str(tmp_path / "sampled")
    assert main(["sample", f"{SF_SMOKE}/documents.parquet", out,
                 "-k", "2", "--weight-col", "n_chars"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["command"] == "sample"
    assert all(v <= 2 for v in rep["per_stratum"].values())
    assert rep["n_output"] == sum(rep["per_stratum"].values())
    got = spark.read.parquet(out)
    assert {"doc_id", "source", "rk"} <= set(got.columns)
    # deterministic: a second run picks the identical docs
    out2 = str(tmp_path / "sampled2")
    assert main(["sample", f"{SF_SMOKE}/documents.parquet", out2,
                 "-k", "2", "--weight-col", "n_chars"]) == 0
    capsys.readouterr()
    a = {r.doc_id for r in got.collect()}
    b = {r.doc_id for r in spark.read.parquet(out2).collect()}
    assert a == b


def test_cli_quantiles(spark, capsys):
    assert main(["quantiles", f"{SF_SMOKE}/documents.parquet",
                 "n_chars", "-q", "0.5", "-q", "0.99"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["command"] == "quantiles"
    assert [e["q"] for e in rep["quantiles"]] == [0.5, 0.99]
    for e in rep["quantiles"]:
        assert e["lo"] <= e["hi"]
        if e["lo"] >= 32:
            assert e["hi"] / e["lo"] <= 1 + 2 ** -4


def test_cli_monitor(spark, tmp_path, capsys):
    """monitor: one stream dir -> four bounded-state stores -> JSON
    report; a second tick with new data resumes from the checkpoints
    and the report reflects everything ingested."""
    src = tmp_path / "in"
    src.mkdir()
    state = str(tmp_path / "state")

    def write(name, lo, hi):
        with open(src / name, "w") as fh:
            for i in range(lo, hi):
                words = ["hot"] * (3 if i % 2 == 0 else 1) + [f"t{i % 7}"]
                fh.write(json.dumps({
                    "doc_id": i, "source": f"s{i % 2}",
                    "n_chars": 10 + i % 50,
                    "text": " ".join(words)}) + "\n")

    write("0.json", 0, 40)
    assert main(["monitor", str(src), state, "-k", "5",
                 "--reservoir-k", "3"]) == 0
    rep1 = json.loads(capsys.readouterr().out.strip())
    assert rep1["command"] == "monitor"
    n1 = rep1["stream_weight_n"]
    assert n1 == sum((3 if i % 2 == 0 else 1) + 1 for i in range(40))
    assert rep1["topk"][0]["tok"] == "hot"
    lo, hi = rep1["topk"][0]["true_count_bound"]
    assert lo <= 80 <= hi  # true 'hot' count: 20*3 + 20*1
    assert set(rep1["reservoir_per_stratum"]) == {"s0", "s1"}
    assert all(v == 3 for v in rep1["reservoir_per_stratum"].values())

    write("1.json", 40, 60)
    assert main(["monitor", str(src), state]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip())
    assert rep2["stream_weight_n"] > n1
    assert [e["q"] for e in rep2["quantiles"]] == [0.5, 0.9, 0.99]
    for e in rep2["quantiles"]:
        assert e["lo"] <= e["hi"]


def test_cli_media_dedup(spark, tmp_path, capsys):
    """media-dedup: parquet stream of raw images -> band-store filter
    -> JSON report; planted perturbed copies drop."""
    from hummingbird_spark.operators.multimodal import synth_images

    src = tmp_path / "media_in"
    src.mkdir()
    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    synth_images(spark, 16).select("media_id", "data").coalesce(1) \
        .write.mode("overwrite").parquet(tmp)
    shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0],
                str(src / "b0.parquet"))

    out = str(tmp_path / "media_out")
    store = str(tmp_path / "media_store")
    assert main(["media-dedup", str(src), out, store]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    # 16 images, 4 planted perturbed copies (id%4==1) drop
    assert rep["n_accepted"] == 12
    assert rep["store_band_rows"] == 8 * 12


def test_cli_graph(spark, tmp_path, capsys):
    assert main(["graph", f"{SF_SMOKE}/documents.parquet",
                 str(tmp_path / "pr"), "--op", "pagerank"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["n_nodes"] > 0 and rep["n_edges"] > 0
    assert len(rep["top5"]) == 5
    ranks = [e["rank_scaled"] for e in rep["top5"]]
    assert ranks == sorted(ranks, reverse=True)

    assert main(["graph", f"{SF_SMOKE}/documents.parquet",
                 str(tmp_path / "lp"), "--op", "communities"]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip())
    assert rep2["n_nodes"] == rep["n_nodes"]
    assert rep2["top5_communities"][0]["size"] >= 2

    # edge-list mode on the written pagerank output? use a toy list
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"a": [1, 2, 1], "b": [2, 3, 3]}),
                   tmp_path / "edges.parquet")
    assert main(["graph", str(tmp_path / "edges.parquet"),
                 str(tmp_path / "pr2"), "--edges"]) == 0
    rep3 = json.loads(capsys.readouterr().out.strip())
    assert rep3["n_nodes"] == 3 and rep3["n_edges"] == 3


def test_cli_link_graph(spark, tmp_path, capsys):
    """link-graph: JSON doc stream -> postings + rare-edge stores ->
    JSON report; a second tick over new files drifts df across max_df
    and the report reflects the retraction."""
    import json as _json

    src = tmp_path / "lg_in"
    src.mkdir()
    batches = [
        [(1, "u1a u1b alpha beta gamma u1c"),
         (2, "u2a alpha beta gamma u2b u2c")],
        [(3, "u3a alpha beta gamma u3b"),
         (4, "u4a u4b alpha beta gamma"),
         (5, "u5a alpha beta gamma u5b u5c")],
    ]
    postings = str(tmp_path / "lg_postings")
    edges = str(tmp_path / "lg_edges")

    def write(name, batch):
        with open(src / name, "w") as fh:
            for doc_id, text in batch:
                fh.write(_json.dumps(
                    {"doc_id": doc_id, "text": text}) + "\n")

    write("0.json", batches[0])
    assert main(["link-graph", str(src), postings, edges,
                 "--max-df", "3"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["n_edges"] == 1 and rep["n_nodes"] == 2  # (1,2)

    # df("alpha beta gamma") -> 5 > max_df 3: the edge retracts
    write("1.json", batches[1])
    assert main(["link-graph", str(src), postings, edges,
                 "--max-df", "3"]) == 0
    rep2 = _json.loads(capsys.readouterr().out.strip())
    assert rep2["n_edges"] == 0 and rep2["n_nodes"] == 0
    assert rep2["postings_rows"] > rep["postings_rows"]


def test_cli_audio_dedup(spark, tmp_path, capsys):
    """audio-dedup: parquet stream of real WAVs -> fingerprint-store
    filter -> JSON report; planted volume-scaled copies drop."""
    import glob
    import json as _json
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hummingbird_spark.operators.multimodal import synth_wav_dups

    src = tmp_path / "audio_in"
    src.mkdir()
    tmp = tempfile.mkdtemp()
    synth_wav_dups(spark, 16).select("media_id", "data").coalesce(1) \
        .write.mode("overwrite").parquet(tmp)
    shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0],
                str(src / "b0.parquet"))

    out = str(tmp_path / "audio_out")
    store = str(tmp_path / "audio_store")
    assert main(["audio-dedup", str(src), out, store]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    # 16 clips, 4 planted scaled copies (id%4==1) drop
    assert rep["n_accepted"] == 12
    assert rep["store_fp_rows"] > 0


def test_cli_crawl(spark, tmp_path, capsys):
    """crawl: parquet stream of (url, html) pages -> canonical-URL
    store filter + blocklist + extraction -> JSON report; messy
    variants of one canonical land once, blocked domains never."""
    import glob
    import json as _json
    import shutil
    import tempfile

    from pyspark.sql import Row

    src = tmp_path / "crawl_in"
    src.mkdir()
    page = ('<html><body><nav><a href="/x">Home</a></nav>'
            '<p>page body text content here</p></body></html>')
    tmp = tempfile.mkdtemp()
    spark.createDataFrame([
        Row(url="https://a.example/p1", html=page),
        Row(url="HTTP://WWW.B.Example/p2/?utm_source=x", html=page),
        Row(url="http://b.example/p2?fbclid=9", html=page),
        Row(url="https://spam.example/p3", html=page),
    ]).coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0],
                str(src / "b0.parquet"))

    out = str(tmp_path / "crawl_out")
    store = str(tmp_path / "crawl_store")
    assert main(["crawl", str(src), out, store,
                 "--block-domain", "spam.example"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    # 4 pages: p2 variants collapse to one canonical, spam blocked
    assert rep["n_pages"] == 2
    assert rep["store_urls"] == 2


def test_cli_web_graph(spark, tmp_path, capsys):
    """web-graph: parquet stream of crawled pages -> maintained
    anchor-link edge store; report equals the from-scratch build."""
    import glob
    import json as _json
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hummingbird_spark.operators.graph import web_link_edges
    from hummingbird_spark.plans.queries_web import _with_link_page
    from hummingbird_spark.sources.tables import load_table

    pages = _with_link_page(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    ).filter(F.col("doc_id") < 80).localCheckpoint()

    src = tmp_path / "wg_in"
    src.mkdir()
    tmp = tempfile.mkdtemp()
    pages.coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0],
                str(src / "b0.parquet"))

    p, l, e = (str(tmp_path / x) for x in ("pg", "lk", "ed"))
    assert main(["web-graph", str(src), p, l, e]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["n_pages"] == 80
    assert rep["n_edges"] == web_link_edges(pages).count()

    # the update-aware twin reaches the same graph on version-1 input
    pv, lv, ev = (str(tmp_path / x) for x in ("pgv", "lkv", "edv"))
    assert main(["web-graph", str(src), pv, lv, ev,
                 "--versioned"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["n_edges"] == web_link_edges(pages).count()


def test_cli_warc_ingest_chains_into_crawl(spark, tmp_path, capsys):
    """warc-ingest: .warc.gz files -> (url, html) parquet, which the
    crawl subcommand then curates — the Common Crawl front door,
    end-to-end."""
    import gzip
    import json as _json

    CRLF = "\r\n"
    GAP = CRLF + CRLF

    def rec(uri, body, status="200 OK"):
        http = (f"HTTP/1.1 {status}" + CRLF
                + "Content-Type: text/html" + GAP + body)
        return ("WARC/1.0" + CRLF + "WARC-Type: response" + CRLF
                + f"WARC-Target-URI: {uri}" + CRLF
                + f"Content-Length: {len(http)}" + GAP + http + GAP)

    page = ("<html><body><p>enough body text to clear the length "
            "filter for page %d</p></body></html>")
    wdir = tmp_path / "warcs"
    wdir.mkdir()
    for f in range(2):
        with open(wdir / f"crawl-{f}.warc.gz", "wb") as fh:
            for i in range(3):
                fh.write(gzip.compress(rec(
                    f"https://w{f}.example/p/{i}",
                    page % (f * 3 + i)).encode("ascii")))
            # a 404 must be rejected by the ingest filter
            fh.write(gzip.compress(rec(
                f"https://w{f}.example/gone", "missing",
                status="404 Not Found").encode("ascii")))

    out = str(tmp_path / "wi_pages")
    assert main(["warc-ingest", str(wdir / "*.warc.gz"), out,
                 "--reader", "gz"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["n_records"] == 8
    assert rep["n_pages"] == 6 and rep["n_rejected"] == 2
    rows = spark.read.parquet(out)
    assert set(rows.columns) == {"url", "html"}

    # chain: the ingest output IS the crawl subcommand's input
    curated = str(tmp_path / "wi_curated")
    store = str(tmp_path / "wi_store")
    assert main(["crawl", out, curated, store]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["n_pages"] == 6 and rep["store_urls"] == 6

    # and back out: curated -> WET-style conversion records that the
    # gz reader roundtrips (decode -> curate -> encode closes)
    wet = str(tmp_path / "wi_wet")
    assert main(["wet-export", curated, wet]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["n_records"] == 6
    from hummingbird_spark.sources.warc import read_warc_gz

    back = read_warc_gz(spark, wet + "/*.warc.gz")
    assert back.count() == 6
    assert back.filter("warc_type = 'conversion' AND length_ok") \
        .count() == 6

    # warc-index: the exporter already wrote sidecars, so everything
    # skips; drop one sidecar and only that file re-indexes
    import glob as _glob
    import os as _os

    assert main(["warc-index", wet + "/*.warc.gz"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["n_indexed"] == 0 and rep["n_skipped"] >= 1
    victim = sorted(_glob.glob(wet + "/*.cdx.parquet"))[0]
    _os.remove(victim)
    assert main(["warc-index", wet + "/*.warc.gz"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["n_indexed"] == 1 and rep["n_records"] >= 1
    from hummingbird_spark.sources.warc import (
        fetch_warc_records,
        read_warc_gz_index,
    )

    idx = read_warc_gz_index(spark, wet)
    assert fetch_warc_records(spark, idx).count() == 6

    # warc-fetch: CDX point lookup straight from the CLI
    one = idx.head().target_uri
    fetched = str(tmp_path / "wi_fetched")
    assert main(["warc-fetch", wet, fetched, "--url", one]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["n_selected"] == 1 and rep["n_fetched"] == 1
    assert spark.read.parquet(fetched).head().target_uri == one


def test_cli_frontier(spark, tmp_path, capsys):
    """frontier: sitemap stream -> fetch-queue store + schedule
    report; crawled and disallowed URLs never queue."""
    import glob
    import json as _json
    import shutil
    import tempfile

    from pyspark.sql import Row

    src = tmp_path / "fr_in"
    src.mkdir()
    xml = ('<?xml version="1.0"?><urlset>'
           '<url><loc>https://a.example/p1</loc>'
           '<lastmod>2026-01-05</lastmod></url>'
           '<url><loc>https://a.example/p2</loc>'
           '<lastmod>2026-01-06</lastmod></url>'
           '<url><loc>https://a.example/private/x</loc>'
           '<lastmod>2026-01-07</lastmod></url></urlset>')
    tmp = tempfile.mkdtemp()
    spark.createDataFrame([Row(sitemap_xml=xml)]).coalesce(1) \
        .write.mode("overwrite").parquet(tmp)
    shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0],
                str(src / "b0.parquet"))
    crawled = str(tmp_path / "fr_crawled")
    spark.createDataFrame([Row(canonical_url="https://a.example/p1")]) \
        .write.mode("overwrite").parquet(crawled)
    robots = str(tmp_path / "fr_robots")
    spark.createDataFrame([Row(
        host="a.example",
        robots_txt="User-agent: *\nDisallow: /private/")]) \
        .write.mode("overwrite").parquet(robots)

    frontier = str(tmp_path / "fr_store")
    assert main(["frontier", str(src), frontier,
                 "--crawled", crawled, "--robots", robots]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["n_queued"] == 1 and rep["n_hosts"] == 1

    # the delta-maintained twin reaches the same schedule
    delta_root = str(tmp_path / "fr_delta")
    assert main(["frontier", str(src), delta_root, "--delta",
                 "--crawled", crawled, "--robots", robots]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["n_queued"] == 1 and rep["n_hosts"] == 1

    # delta mode with an EMPTY maintained queue (every advertised URL
    # robots-blocked) must print an empty schedule, not throw on the
    # bare parquet read of a store with no bucket dirs
    src2 = tmp_path / "fr_in2"
    src2.mkdir()
    xml2 = ('<?xml version="1.0"?><urlset>'
            '<url><loc>https://a.example/private/y</loc>'
            '<lastmod>2026-01-08</lastmod></url></urlset>')
    tmp2 = tempfile.mkdtemp()
    spark.createDataFrame([Row(sitemap_xml=xml2)]).coalesce(1) \
        .write.mode("overwrite").parquet(tmp2)
    shutil.move(glob.glob(f"{tmp2}/part-*.parquet")[0],
                str(src2 / "b0.parquet"))
    empty_root = str(tmp_path / "fr_delta_empty")
    assert main(["frontier", str(src2), empty_root, "--delta",
                 "--robots", robots]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["n_queued"] == 0 and rep["n_hosts"] == 0
