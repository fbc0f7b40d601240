"""curate_corpus: the materializing curation run (score -> filter ->
dedup -> write) with per-reason drop accounting."""

from __future__ import annotations

from pyspark.sql import Row

from hummingbird_spark.operators.curate import curate_corpus

GOOD = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill and the birds are singing "
        "in the garden outside the old house near the quiet river "
        "with many other plain english words in this long sentence")
FRENCH = ("le chat est sur la table et le chien dort dans le jardin "
          "avec les oiseaux qui chantent pres de la vieille maison "
          "et la riviere tranquille coule sous le pont de pierre "
          "pendant que les enfants jouent dans la rue ce matin")


def test_curate_reasons_partition_and_write(spark, tmp_path):
    out = str(tmp_path / "curated")
    df = spark.createDataFrame([
        Row(doc_id=1, source="a", text=GOOD),
        Row(doc_id=2, source="a", text=GOOD),            # exact dup of 1
        Row(doc_id=3, source="b", text="  " + GOOD + " "),  # fp dup of 1
        Row(doc_id=4, source="b", text=FRENCH),          # language
        Row(doc_id=5, source="b", text=""),              # empty
        Row(doc_id=6, source="c", text="@@ ## $$ %% ^^ && ** (("),  # quality
        Row(doc_id=7, source="c", text=GOOD.replace("quick", "slow")
            .replace("lazy", "busy").replace("garden", "meadow")
            .replace("river", "stream")),                # kept (distinct)
    ])
    rep = curate_corpus(spark, df, out, langs=("en",))
    assert rep.n_input == 7
    assert rep.dropped["empty"] == 1
    assert rep.dropped["language"] == 1
    assert rep.dropped["quality"] == 1
    assert rep.dropped["duplicate"] == 2
    assert rep.n_kept == 2
    assert rep.n_kept + sum(rep.dropped.values()) == rep.n_input
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {1, 7}
    # aux columns never land in the output
    cols = set(spark.read.parquet(out).columns)
    assert cols == {"doc_id", "source", "text"}


def test_curate_optional_stages_and_reswap(spark, tmp_path):
    out = str(tmp_path / "curated")
    df = spark.createDataFrame([
        Row(doc_id=1, source="a", text=GOOD),
        Row(doc_id=2, source="a", text=GOOD + " extra tail"),
    ])
    # no language screen, no dedup: both survive
    rep = curate_corpus(spark, df, out, langs=None, dedup=False)
    assert rep.n_kept == 2 and rep.dropped == {}
    assert rep.keep_rate == 1.0
    # re-running over the same out_path swaps cleanly; partitioned
    # layout prunes by directory
    rep2 = curate_corpus(spark, df, out, langs=None, dedup=False,
                         classifier_threshold=0.0,
                         max_dup_segment_fraction=1.0,
                         partition_cols=["source"])
    assert rep2.n_kept == 2
    assert spark.read.parquet(out).count() == 2
    import os
    assert any(e.startswith("source=") for e in os.listdir(out))


def test_curate_null_text_is_empty_not_duplicate(spark, tmp_path):
    """Null text must be accounted as 'empty' — not silently vanish
    through null-propagating filters into the dedup join."""
    out = str(tmp_path / "curated")
    df = spark.createDataFrame([
        Row(doc_id=1, source="a", text=None),
        Row(doc_id=2, source="a", text=GOOD),
    ])
    rep = curate_corpus(spark, df, out, langs=None)
    assert rep.dropped == {"empty": 1}
    assert rep.n_kept == 1


def test_curate_jsonl_output(spark, tmp_path):
    import glob

    out = str(tmp_path / "curated_jsonl")
    df = spark.createDataFrame([
        Row(doc_id=1, source="a", text=GOOD),
        Row(doc_id=2, source="a", text=GOOD),
    ])
    rep = curate_corpus(spark, df, out, langs=None, fmt="jsonl")
    assert rep.n_kept == 1
    shards = glob.glob(f"{out}/*.json")
    assert shards
    import json as _json
    rows = [_json.loads(line) for p in shards for line in open(p)]
    assert [r["doc_id"] for r in rows] == [1]


def test_curate_perplexity_filter(spark, tmp_path):
    """max_perplexity drops the gibberish doc (unique transitions score
    far above the repeated-pattern docs under the corpus LM)."""
    out = str(tmp_path / "curated")
    df = spark.createDataFrame([
        Row(doc_id=i, source="a", text=GOOD) for i in range(1, 5)
    ] + [Row(doc_id=9, source="a",
             text="zeta omega kappa lambda sigma phi chi psi "
                  "upsilon tau rho pi omicron xi nu mu")])
    base = curate_corpus(spark, df, out, langs=None, dedup=False)
    assert base.n_kept == 5        # no perplexity screen: all pass
    rep = curate_corpus(spark, df, out, langs=None, dedup=False,
                        max_perplexity=4.0)
    assert rep.dropped.get("perplexity") == 1
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 9 not in kept


def test_curate_gopher_rules_screen(spark, tmp_path):
    """gopher_rules=True adds the published A1 screen as reason
    'gopher', after quality and before language — a doc passing the
    composite quality score but tripping a Gopher rule (here: < 50
    words) is attributed to 'gopher'."""
    out = str(tmp_path / "curated")
    long_good = " ".join([GOOD] * 2)   # 80 words, all rules pass
    df = spark.createDataFrame([
        Row(doc_id=1, source="a", text=long_good),
        Row(doc_id=2, source="a", text=GOOD),   # 40 words: too few
        Row(doc_id=3, source="a",
            text=" ".join(["the and that have with to be of"] * 10)
                 + " ..." * 20),                # ellipsis symbols
    ])
    base = curate_corpus(spark, df, out, langs=None, dedup=False)
    assert base.n_kept == 3                     # screen off: all pass
    rep = curate_corpus(spark, df, out, langs=None, dedup=False,
                        gopher_rules=True)
    assert rep.dropped.get("gopher") == 2
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {1}


def test_curate_strips_cross_doc_boilerplate(spark, tmp_path):
    """strip_cross_doc_boilerplate=N removes the banner line shared by
    >= N docs BEFORE scoring; unique body lines survive (note: any line
    shared by >= N docs is boilerplate by definition, bodies
    included — hence the unique suffixes here)."""
    out = str(tmp_path / "curated")
    banner = "we use cookies on this site every day always"
    df = spark.createDataFrame([
        Row(doc_id=i, source="a",
            text=f"{banner}\n{GOOD} unique tail {i}")
        for i in range(1, 4)
    ] + [Row(doc_id=9, source="a", text=GOOD + " unique tail nine")])
    rep = curate_corpus(spark, df, out, langs=None,
                        strip_cross_doc_boilerplate=3, dedup=False)
    assert rep.n_kept == 4
    kept = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    assert all(banner not in t for t in kept.values())
    assert kept[1] == GOOD + " unique tail 1"    # body survives
    assert kept[9] == GOOD + " unique tail nine"  # untouched doc


def test_curate_removes_dup_substrings(spark, tmp_path):
    """remove_dup_substrings=N cuts all-but-first occurrences of
    duplicated >= N-token runs BEFORE scoring (Lee et al. pre-pass);
    the keeper doc and docs without duplicated runs are untouched."""
    out = str(tmp_path / "curated")
    dup = "copy me one two three four five six seven eight nine ten"
    b2 = ("a completely different second document body whose words "
          "never repeat anything from elsewhere at all")
    b3 = ("yet another third body made of its own vocabulary so no "
          "window is shared between documents here")
    df = spark.createDataFrame([
        Row(doc_id=1, source="a", text=f"{dup} {GOOD}"),
        Row(doc_id=2, source="a", text=f"{b2} {dup}"),
        Row(doc_id=3, source="a", text=b3),
    ])
    rep = curate_corpus(spark, df, out, langs=None, min_quality=0.0,
                        remove_dup_substrings=12, dedup=False)
    assert rep.n_kept == 3
    kept = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    assert kept[1] == f"{dup} {GOOD}"   # first occurrence untouched
    assert kept[2] == b2                # run cut at tail
    assert kept[3] == b3                # untouched
