"""Profile-query battery (Q1-Q12) over a hand-computed triples fixture."""

from __future__ import annotations

import pytest

from kgsum_spark import profile


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        # subj, pred, obj, obj_is_iri
        ("http://d/s1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://v/Person", True),
        ("http://d/s2", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://v/Person", True),
        ("http://d/s3", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://v/Place", True),
        ("http://d/s1", "http://www.w3.org/2000/01/rdf-schema#label", "Alice", False),
        ("http://d/s3", "http://www.w3.org/2000/01/rdf-schema#label", "Berlin", False),
        ("http://d/s9", "http://www.w3.org/2000/01/rdf-schema#label", "Untyped", False),  # excluded by Q4
        ("http://d/s1", "http://xmlns.com/foaf/0.1/knows", "http://other.net/s2", True),
        ("http://d/s1", "http://purl.org/dc/terms/creator", "acme", False),
        ("http://d/s1", "http://purl.org/dc/terms/license", "http://lic.org/mit", True),
        ("http://d/s1", "http://purl.org/dc/terms/title", "My Graph", False),
        ("http://d/s1", "http://purl.org/dc/terms/description", "a graph", False),
        ("http://d/ds", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://rdfs.org/ns/void#Dataset", True),
        ("http://d/ds", "http://purl.org/dc/terms/subject", "http://sbj.org/geo", True),
        ("http://d/other", "http://purl.org/dc/terms/subject", "http://sbj.org/hidden", True),  # not a void:Dataset
        ("http://d/s1", "http://www.w3.org/2002/07/owl#sameAs", "http://dbpedia.org/r/A", True),
        ("http://d/ds", "http://rdfs.org/ns/void#sparqlEndpoint", "http://d/sparql", True),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string, obj_is_iri boolean")


def test_q1_vocabularies(triples):
    vocs = {r["voc"] for r in profile.vocabularies(triples).collect()}
    assert "http://xmlns.com/foaf/0.1" in vocs
    assert "http://www.w3.org/1999/02/22-rdf-syntax-ns" in vocs
    assert "http://purl.org/dc/terms" in vocs


def test_q2_class_histogram(triples):
    got = [(r["curi"], r["cnt"]) for r in profile.class_histogram(triples).collect()]
    assert got[0] == ("http://v/Person", 2)
    assert ("http://v/Place", 1) in got


def test_q3_property_histogram(triples):
    got = {r["puri"]: r["cnt"] for r in profile.property_histogram(triples).collect()}
    assert "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" not in got
    assert got["http://www.w3.org/2000/01/rdf-schema#label"] == 3


def test_q4_labels_typed_only(triples):
    got = {r["lab"] for r in profile.labels(triples).collect()}
    assert got == {"Alice", "Berlin", "My Graph"}  # "Untyped" excluded


def test_q5_tlds(triples):
    got = {r["tld"] for r in profile.tlds(triples).collect()}
    assert "org" in got and "net" in got


def test_q6_q7_q8_q9_q10(triples):
    assert [r["sparql"] for r in profile.endpoints(triples).collect()] == ["http://d/sparql"]
    assert [r["creator"] for r in profile.creators(triples).collect()] == ["acme"]
    assert [r["license"] for r in profile.licenses(triples).collect()] == ["http://lic.org/mit"]
    assert [r["title"] for r in profile.titles(triples).collect()] == ["My Graph"]
    assert [r["dsc"] for r in profile.descriptions(triples).collect()] == ["a graph"]


def test_q11_void_subjects_dependent_join(triples):
    got = [r["sbj"] for r in profile.void_subjects(triples).collect()]
    assert got == ["http://sbj.org/geo"]  # subject of non-Dataset excluded


def test_q12_connections(triples):
    got = [r["con"] for r in profile.connections(triples).collect()]
    assert got == ["http://dbpedia.org/r/A"]


def test_build_profile_row(triples):
    row = profile.build_profile(triples, "g1").collect()
    assert len(row) == 1
    r = row[0]
    assert r["id"] == "g1"
    assert r["title"] == "My Graph"
    assert r["curi"] == [
        "http://rdfs.org/ns/void#Dataset", "http://v/Person", "http://v/Place"
    ]
    assert r["con"] == ["http://dbpedia.org/r/A"]


def test_profile_on_pipeline_output(spark, transcripts_df, tmp_path_factory):
    """The battery also runs over our own extracted KG (curie predicates)."""
    from kgsum_spark.pipeline import run_pipeline

    res = run_pipeline(
        spark, transcripts_df, str(tmp_path_factory.mktemp("prof")), resume=False
    )
    hist = profile.class_histogram(res.triples).collect()
    assert len(hist) > 0
    assert hist[0]["cnt"] >= hist[-1]["cnt"]
    cons = profile.connections(res.triples).collect()
    assert len(cons) > 0


def test_q13_existence_fallback(spark):
    primary_empty = spark.createDataFrame([], "v string")
    fallback = spark.createDataFrame([("x",)], ["v"])
    got = profile.existence_fallback(primary_empty, fallback).collect()
    assert [r["v"] for r in got] == ["x"]
    primary = spark.createDataFrame([("p",)], ["v"])
    assert [r["v"] for r in profile.existence_fallback(primary, fallback).collect()] == ["p"]


def test_q14_enrich_with_lookup(spark):
    vocs = spark.createDataFrame([("http://voc/1",), ("http://voc/2",)], ["voc"])
    lov = spark.createDataFrame([("http://voc/1", "geo")], ["voc", "keyword"])
    got = {r["voc"]: r["keyword"] for r in
           profile.enrich_with_lookup(vocs, lov, "voc").collect()}
    assert got == {"http://voc/1": "geo", "http://voc/2": None}


def test_q16_has_any(spark):
    assert profile.has_any(spark.createDataFrame([("x",)], ["v"]))
    assert not profile.has_any(spark.createDataFrame([], "v string"))


def test_build_profile_batched_equals_per_feature(triples):
    """The r3 one-action build_profile must be bit-identical to the
    per-feature functions' outputs (the r1-r2 semantics)."""
    row = profile.build_profile(triples, "g1").collect()[0]
    feats = {
        "voc": profile.vocabularies(triples),
        "curi": profile.class_histogram(triples).select("curi"),
        "puri": profile.property_histogram(triples).select("puri"),
        "lab": profile.labels(triples),
        "tlds": profile.tlds(triples),
        "sparql": profile.endpoints(triples),
        "creator": profile.creators(triples),
        "license": profile.licenses(triples),
        "dsc": profile.descriptions(triples),
        "sbj": profile.void_subjects(triples),
        "con": profile.connections(triples),
    }
    for name, df in feats.items():
        expect = sorted(r[0] for r in df.collect())
        assert list(row[name]) == expect, name
    t = sorted(r[0] for r in profile.titles(triples).collect())
    assert row["title"] == (t[0] if t else "")


def test_build_profile_single_action_job_count(spark, triples):
    """The whole profile must materialize in ONE action (r1-r2 ran 12
    feature subtrees = 12+ scans). Counted via statusTracker job ids."""
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup() or [])
    profile.build_profile(triples, "g1").collect()
    after = set(tracker.getJobIdsForGroup() or [])
    new_jobs = len(after - before)
    # one action; AQE materializes each shuffle query stage as its own job
    # (measured: 9 for this plan). The r1-r2 12-subtree regime measured 28
    # jobs and 1.7x the latency on the same fixture.
    assert new_jobs <= 10, f"{new_jobs} jobs for one profile"


@pytest.fixture(scope="module")
def multigraph_triples(spark, triples):
    """Three graphs: g1 = the full fixture, g2 = a different subset (no
    void dataset, no title — exercises per-graph fallbacks), g3 = type
    rows only."""
    from pyspark.sql import functions as F

    base = triples
    g1 = base.withColumn("g", F.lit("http://g/1"))
    g2 = base.filter(
        ~F.col("pred").isin("http://purl.org/dc/terms/title",
                            "http://purl.org/dc/terms/subject")
        & (F.col("obj") != "http://rdfs.org/ns/void#Dataset")
    ).withColumn("g", F.lit("http://g/2"))
    g3 = base.filter(F.col("pred").endswith("#type")) \
        .withColumn("g", F.lit("http://g/3"))
    return g1.unionByName(g2).unionByName(g3)


def test_build_profiles_multi_graph_matches_per_graph(multigraph_triples):
    """VERDICT r3 #6: build_profiles(t, g) — each graph's row must be
    bit-identical to build_profile run on that graph's rows alone."""
    from pyspark.sql import functions as F

    all_rows = {r["id"]: r for r in
                profile.build_profiles(multigraph_triples, "g").collect()}
    assert set(all_rows) == {"http://g/1", "http://g/2", "http://g/3"}
    for gid in sorted(all_rows):
        solo = profile.build_profile(
            multigraph_triples.filter(F.col("g") == gid).drop("g"), gid
        ).collect()[0]
        assert all_rows[gid].asDict() == solo.asDict(), gid
    # per-graph fallback really differs: g1 has a title, g2 falls back to
    # its sparql endpoint, g3 (types only) to ""
    assert all_rows["http://g/1"]["title"] == "My Graph"
    assert all_rows["http://g/2"]["title"] == "http://d/sparql"
    assert all_rows["http://g/3"]["title"] == ""


def test_build_profiles_jobs_dont_scale_with_graph_count(spark):
    """More graphs must NOT mean more jobs — the graph id is a grouping
    key, not a driver loop (the reference iterates one KG per loop pass,
    i.e. jobs = O(graphs)). Measured over ONE source table whose graph id
    is a derived column (the realistic input shape: a partitioned triples
    table); a unionByName-of-N-branches input would add scan legs per
    branch, which is input shape, not operator behavior."""
    from pyspark.sql import functions as F

    preds = ["http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
             "http://www.w3.org/2000/01/rdf-schema#label",
             "http://purl.org/dc/terms/title",
             "http://purl.org/dc/terms/subject"]
    base = spark.range(600).select(
        F.concat(F.lit("http://d/s"), (F.col("id") % 50).cast("string")).alias("subj"),
        F.element_at(F.array(*[F.lit(p) for p in preds]),
                     (F.col("id") % 4 + 1).cast("int")).alias("pred"),
        F.concat(F.lit("http://v/C"), (F.col("id") % 7).cast("string")).alias("obj"),
        (F.col("id") % 2 == 0).alias("obj_is_iri"),
    )

    def run(n_graphs: int) -> int:
        mg = base.withColumn("g", F.concat(
            F.lit("http://g/"),
            (F.pmod(F.xxhash64("subj", "obj"), F.lit(n_graphs))).cast("string")))
        tracker = spark.sparkContext.statusTracker()
        before = set(tracker.getJobIdsForGroup() or [])
        profile.build_profiles(mg, "g").collect()
        return len(set(tracker.getJobIdsForGroup() or []) - before)

    run(3)  # warm: codegen/AQE first-run jobs don't count
    assert run(27) <= run(1) + 1, "jobs grew with graph count"
