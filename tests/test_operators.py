"""Unit tests for the operator library (SURVEY.md §2.2/2.4/2.5/2.7/2.9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgsum_spark.operators import agg, filters, joins, scalar


# --- scalar (C*) ---------------------------------------------------------

def test_namespace_of(spark):
    df = spark.createDataFrame(
        [("http://ex.org/vocab#Class",), ("http://ex.org/a/b/Thing",)], ["u"]
    )
    got = [r["ns"] for r in df.select(scalar.namespace_of(F.col("u")).alias("ns")).collect()]
    assert got == ["http://ex.org/vocab", "http://ex.org/a/b"]


def test_local_name_of(spark):
    df = spark.createDataFrame(
        [("http://ex.org/vocab#Class",), ("http://ex.org/a/b/Thing",)], ["u"]
    )
    got = [r["l"] for r in df.select(scalar.local_name_of(F.col("u")).alias("l")).collect()]
    assert got == ["Class", "Thing"]


def test_tld_of(spark):
    df = spark.createDataFrame([("http://data.example.org/x/y",)], ["u"])
    assert df.select(scalar.tld_of(F.col("u")).alias("t")).first()["t"] == "org"


def test_uri_predicates_disagree(spark):
    # the two reference regexes intentionally disagree on www.x.com (C5)
    df = spark.createDataFrame([("www.x.com",), ("http://x.org/a",), ("nope",)], ["u"])
    out = df.select(
        scalar.is_uri_strict(F.col("u")).alias("s"),
        scalar.is_uri_loose(F.col("u")).alias("l"),
    ).collect()
    assert [(r["s"], r["l"]) for r in out] == [(False, True), (True, True), (False, False)]


def test_parse_list_string(spark):
    df = spark.createDataFrame([('["a","b"]',), ("plain",)], ["s"])
    got = [r["a"] for r in df.select(scalar.parse_list_string(F.col("s")).alias("a")).collect()]
    assert got == [["a", "b"], ["plain"]]


def test_first_valid_uri(spark):
    df = spark.createDataFrame(
        [(["", "foo", "http://x.org/1"],), (["", "bar"],), (([""]),)], ["a"]
    )
    got = [r["u"] for r in df.select(scalar.first_valid_uri(F.col("a")).alias("u")).collect()]
    assert got == ["http://x.org/1", "bar", None]


# --- filters (F*) --------------------------------------------------------

def test_category_exclusion(spark):
    df = spark.createDataFrame(
        [("a", "geo"), ("b", " user_generated "), ("c", None)], ["id", "category"]
    )
    got = sorted(r["id"] for r in filters.category_exclusion(df).collect())
    assert got == ["a", "c"]


def test_uri_blacklist(spark):
    df = spark.createDataFrame(
        [("http://www.w3.org/2000/01/rdf-schema#label",), ("http://my.org/p",)], ["u"]
    )
    got = [r["u"] for r in filters.filter_blacklisted_uris(df, "u").collect()]
    assert got == ["http://my.org/p"]


def test_predicate_prefix_filter(spark):
    df = spark.createDataFrame(
        [("http://ex.org/p",), ("http://www.w3.org/x",), ("https://ex.org/p",)], ["p"]
    )
    got = [r["p"] for r in df.filter(filters.predicate_prefix_filter(F.col("p"))).collect()]
    assert got == ["http://ex.org/p"]


def test_lang_fallback(spark):
    few = spark.createDataFrame([("x", "en"), ("y", "fr"), ("z", "fr")], ["v", "o_lang"])
    # only 1 en row < min 2 → fall back to all
    assert filters.lang_filter_with_fallback(few).count() == 3
    many = spark.createDataFrame([("x", "en"), ("y", "en"), ("z", "fr")], ["v", "o_lang"])
    assert filters.lang_filter_with_fallback(many).count() == 2


# --- aggregates (A*) -----------------------------------------------------

def test_topk_group_count_deterministic_ties(spark):
    df = spark.createDataFrame([("b",), ("b",), ("a",), ("a",), ("c",)], ["k"])
    got = [(r["k"], r["cnt"]) for r in agg.topk_group_count(df, "k", k=2).collect()]
    assert got == [("a", 2), ("b", 2)]  # tie broken by key asc


def test_set_union_agg(spark):
    df = spark.createDataFrame([(1, "b"), (1, "a"), (1, "b"), (2, "z")], ["g", "v"])
    got = {r["g"]: r["vals"] for r in agg.set_union_agg(df, "g", "v").collect()}
    assert got == {1: ["a", "b"], 2: ["z"]}


def test_vote_argmax(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (2, "a"), (2, "b")], ["g", "lbl"]
    )
    got = {r["g"]: r["winner"] for r in agg.vote_argmax(df, "g", "lbl").collect()}
    assert got == {1: "x", 2: "a"}  # group 2 tie → lexicographic


def test_keep_last(spark):
    df = spark.createDataFrame([("k", 1, "old"), ("k", 2, "new")], ["id", "ts", "v"])
    got = agg.keep_last(df, ["id"], "ts").collect()
    assert len(got) == 1 and got[0]["v"] == "new"


def test_systematic_sample(spark):
    df = spark.createDataFrame([("g", i) for i in range(10)], ["g", "i"])
    got = sorted(r["i"] for r in agg.systematic_sample(df, "g", "i", every=3).collect())
    assert got == [0, 3, 6, 9]


def test_stratified_oversample_balances(spark):
    rows = [("maj", i) for i in range(90)] + [("min", i) for i in range(10)]
    df = spark.createDataFrame(rows, ["lbl", "i"])
    out = agg.stratified_oversample(df, "lbl", seed=42, factor=5.0)
    counts = {r["lbl"]: r["n"] for r in
              out.groupBy("lbl").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["min"] >= 30  # ≥ integer replication part (10*floor(50/10)=50 min 30 w/cap)
    assert counts["maj"] == 90


def test_classification_metrics(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b")], ["label", "pred"]
    )
    m = {r["cls"]: r for r in agg.classification_metrics(df, "label", "pred").collect()}
    assert m["a"]["precision"] == 1.0 and m["a"]["recall"] == 0.5
    assert m["b"]["recall"] == 1.0 and abs(m["b"]["precision"] - 2 / 3) < 1e-9


# --- joins (J*) ----------------------------------------------------------

def test_outer_merge_drops_conflicts(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"])
    b = spark.createDataFrame([(2, "CONFLICT", "extra2"), (3, "z", "extra3")],
                              ["id", "v", "extra"])
    out = joins.outer_merge(a, b).orderBy("id").collect()
    assert [r["id"] for r in out] == [1, 2, 3]
    assert out[1]["v"] == "y"  # a's column wins
    assert out[1]["extra"] == "extra2"


def test_union_keep_last(spark):
    f1 = spark.createDataFrame([(1, "old"), (2, "only1")], ["id", "v"])
    f2 = spark.createDataFrame([(1, "new")], ["id", "v"])
    got = {r["id"]: r["v"] for r in joins.union_keep_last([f1, f2], "id").collect()}
    assert got == {1: "new", 2: "only1"}


def test_containment_join(spark):
    big = spark.createDataFrame([("the green box",), ("a red dot",)], ["g"])
    small = spark.createDataFrame([("green",), ("blue",)], ["needle"])
    got = [(r["g"], r["needle"]) for r in
           joins.containment_join(big, small, "g", "needle").collect()]
    assert got == [("the green box", "green")]


def test_hash_match_join(spark):
    catalog = spark.createDataFrame([("id-1",), ("id-2",)], ["id"])
    files = catalog.select(F.sha2(F.col("id"), 256).alias("fhash")).limit(1)
    out = joins.hash_match_join(files, catalog, "fhash")
    assert out.count() == 1


def test_c3_analyze_uri(spark):
    df = spark.createDataFrame([("http://data.ex.org/voc/core#Label",)], ["u"])
    r = df.select(scalar.analyze_uri(F.col("u")).alias("a")).first()["a"]
    assert r["namespace"] == "http://data.ex.org/voc/core"
    assert r["local_name"] == "Label"
    assert r["tld"] == "org"


def test_f7_scrub_empty_lists(spark):
    df = spark.createDataFrame([(["a"],), (None,)], "c: array<string>")
    got = [r["c"] for r in filters.scrub_empty_lists(df, ["c"]).collect()]
    assert got == [["a"], []]


def test_f8_title_skip(spark):
    df = spark.createDataFrame([("My Wikidata Dump",), ("Clean Set",)], ["title"])
    got = [r["title"] for r in filters.title_skip(df).collect()]
    assert got == ["Clean Set"]


def test_stratified_split_exact_proportions(spark):
    """r2: the split must be EXACTLY stratified per class (r1's global-rand
    threshold held only in expectation — a small class could land entirely
    in train)."""
    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, lbl string")
    train, val, test = agg.stratified_split(df, "lbl", weights=(0.8, 0.1, 0.1), seed=42)
    for fold, want_big, want_small in ((train, 80, 8), (val, 10, 1), (test, 10, 1)):
        got = {r["lbl"]: r["n"] for r in
               fold.groupBy("lbl").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert got == {"big": want_big, "small": want_small}
    # folds are disjoint and exhaustive
    ids = [set(r["id"] for r in f.collect()) for f in (train, val, test)]
    assert len(ids[0] | ids[1] | ids[2]) == 110
    assert not (ids[0] & ids[1]) and not (ids[1] & ids[2]) and not (ids[0] & ids[2])


def test_stratified_split_deterministic(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, "id long, lbl string")
    t1, _, _ = agg.stratified_split(df, "lbl", seed=7)
    t2, _, _ = agg.stratified_split(df, "lbl", seed=7)
    assert {r["id"] for r in t1.collect()} == {r["id"] for r in t2.collect()}


def test_running_accuracy(spark):
    rows = [(1, "a", "a"), (2, "a", "b"), (3, "a", "a"), (4, "b", "b")]
    df = spark.createDataFrame(rows, "ts long, lbl string, pred string")
    out = {r["ts"]: (r["hits_so_far"], r["n_so_far"], r["running_accuracy"])
           for r in agg.running_accuracy(df, "lbl", "pred", F.col("ts")).collect()}
    assert out == {1: (1, 1, 1.0), 2: (1, 2, 0.5),
                   3: (2, 3, 2 / 3), 4: (3, 4, 0.75)}


def test_lang_fallback_branches(spark):
    from kgsum_spark.operators.filters import lang_filter_with_fallback

    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de")], "id long, o_lang string")
    kept = lang_filter_with_fallback(df, min_rows=2)
    assert {r["id"] for r in kept.collect()} == {1, 2}
    # under min_rows matches → whole set falls back (single-plan, no job)
    df2 = spark.createDataFrame([(1, "en"), (3, "de")], "id long, o_lang string")
    kept2 = lang_filter_with_fallback(df2, min_rows=2)
    assert {r["id"] for r in kept2.collect()} == {1, 3}


def test_asof_join_semantics(spark):
    from kgsum_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 20), (3, "u", 25), (4, "v", 5)],
        "id long, k string, ts long")
    right = spark.createDataFrame(
        [("u", 10, 100.0), ("u", 21, 210.0), ("v", 9, 900.0)],
        "k string, ts long, px double")
    got = {r["id"]: r["px"] for r in
           asof_join(left, right, on="k", ts_col="ts", right_cols=["px"]).collect()}
    assert got[1] == 100.0   # tie: right row AT ts counts (<= semantics)
    assert got[2] == 100.0   # 21 > 20 → not visible yet
    assert got[3] == 210.0   # 21 <= 25 → the newer right row wins
    assert got[4] is None    # v's only right row is at ts 9 > 5


def test_range_join_bins(spark):
    from kgsum_spark.operators.joins import range_join

    pts = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 15.0), (4, 99.0)], "id long, t double")
    iv = spark.createDataFrame(
        [(100, 0.0, 10.0), (200, 9.0, 20.0)], "iid long, s double, e double")
    got = {(r["id"], r["iid"]) for r in
           range_join(pts, iv, "t", "s", "e", granularity=4.0).collect()}
    # boundaries inclusive on both ends; bin-spanning intervals still match
    assert got == {(1, 100), (2, 100), (2, 200), (3, 200)}


def test_asof_join_name_clash_raises(spark):
    import pytest as _pytest

    from kgsum_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, "u", 10, 1.0)], "id long, k string, ts long, px double")
    right = spark.createDataFrame([("u", 9, 2.0)], "k string, ts long, px double")
    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", ts_col="ts", right_cols=["px"])


def test_range_join_degenerate_intervals_dropped(spark):
    from kgsum_spark.operators.joins import range_join

    pts = spark.createDataFrame([(1, 5.0)], "id long, t double")
    iv = spark.createDataFrame(
        [(100, 0.0, 10.0), (200, 9.0, 2.0)], "iid long, s double, e double")
    got = {(r["id"], r["iid"]) for r in
           range_join(pts, iv, "t", "s", "e", granularity=4.0).collect()}
    assert got == {(1, 100)}  # end < start interval silently dropped


def test_funnel_steps(spark):
    rows = [
        ("u1", "signup", 1), ("u1", "view", 2), ("u1", "purchase", 3),   # full funnel
        ("u2", "view", 1), ("u2", "signup", 2),                          # view BEFORE signup → depth 1
        ("u3", "signup", 5),                                             # depth 1
        ("u4", "purchase", 1),                                           # never signed up → absent
        ("u5", "signup", 1), ("u5", "purchase", 2), ("u5", "view", 3),   # purchase before view → depth 2 (signup,view)
    ]
    df = spark.createDataFrame(rows, "u string, t string, ts long")
    got = {r["u"]: r["depth"] for r in
           agg.funnel_steps(df, "u", "t", "ts",
                            ["signup", "view", "purchase"]).collect()}
    assert got == {"u1": 3, "u2": 1, "u3": 1, "u5": 2}


def test_mixture_sample_rates_and_determinism(spark):
    """Rate 1.0 keeps the whole group, 0.0 (via default) drops it, and
    the keep set is a pure function of the ids — two runs agree row for
    row, and a fractional rate lands near its target on 400 ids."""
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, g string")
    full = agg.mixture_sample(df, "g", {"a": 1.0}, id_col="id")
    assert sorted(r["id"] for r in full.collect()) == list(range(0, 400, 2))
    half = agg.mixture_sample(df, "g", {"a": 1.0, "b": 0.5}, id_col="id")
    b_kept = [r["id"] for r in half.collect() if r["g"] == "b"]
    assert 60 <= len(b_kept) <= 140        # 200 candidates at rate 0.5
    again = [r["id"] for r in
             agg.mixture_sample(df, "g", {"a": 1.0, "b": 0.5},
                                id_col="id").collect() if r["g"] == "b"]
    assert sorted(b_kept) == sorted(again)
    # a different salt re-rolls the decision for at least one id
    other = [r["id"] for r in
             agg.mixture_sample(df, "g", {"a": 1.0, "b": 0.5}, id_col="id",
                                salt="other").collect() if r["g"] == "b"]
    assert sorted(other) != sorted(b_kept)
