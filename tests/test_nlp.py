"""NLP operators: tokenization, normalization, mention typing, TF-IDF,
per-feature classifiers with vote (SURVEY.md §2.10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgsum_spark import nlp


def test_hybrid_tokenize_keeps_uris(spark):
    df = spark.createDataFrame(
        [("See http://ex.org/a?b=1 and the big-dog now",)], ["text"]
    )
    toks = df.select(nlp.hybrid_tokenize(F.col("text")).alias("t")).first()["t"]
    assert "http://ex.org/a?b=1" in toks
    assert "see" in toks and "big" in toks and "dog" in toks
    assert "a" not in toks  # 1-char tokens dropped by \w\w+


def test_normalize_tokens_stems_and_strips(spark):
    df = spark.createDataFrame([("The running dogs jumped in THE park",)], ["text"])
    toks = df.select(nlp.normalize_tokens(F.col("text")).alias("t")).first()["t"]
    assert "the" not in toks          # stopword
    assert "runn" in toks or "running" in toks  # suffix-stemmed
    assert "dog" in toks
    assert "jump" in toks


def test_detect_mentions_types(spark):
    df = spark.createDataFrame(
        [(1, "Acme Corp met NASA near Berlin with Unit42 today",)], ["id", "text"]
    )
    got = {r["mention"]: r["ent_type"] for r in nlp.detect_mentions(df).collect()}
    assert got["Acme Corp"] == "ORG"
    assert got["NASA"] == "ABBR"
    assert got["Berlin"] == "MISC"
    assert got["Unit42"] == "ID"


def test_tfidf_pipeline(spark):
    df = spark.createDataFrame(
        [(1, "spark query engine"), (2, "spark shuffle engine"), (3, "pandas frame")],
        ["id", "text"],
    )
    model, out = nlp.fit_tfidf(df, "text", vocab_size=50)
    row = out.filter("id = 1").first()
    assert row["features"].size >= 4
    assert row["features"].numNonzeros() == 3


def test_classifier_and_vote(spark):
    rows = []
    for i in range(30):
        rows.append((f"a{i}", "spark shuffle join agg", "engine"))
        rows.append((f"b{i}", "cats dogs pets animals", "life"))
    train = spark.createDataFrame(rows, "id string, text string, category string")
    model = nlp.train_feature_classifier(train, "text", "category")
    test = spark.createDataFrame(
        [("t1", "shuffle join"), ("t2", "dogs cats")], "id string, text string"
    )
    preds = {r["id"]: r["prediction_label"] for r in model.transform(test).collect()}
    assert preds == {"t1": "engine", "t2": "life"}

    # multi-feature vote (J7/A4): two agreeing features beat one dissenter
    models = {"f1": model, "f2": model}
    voted = {r["id"]: r["category"] for r in
             nlp.predict_category_multi(models, test).collect()}
    assert voted == {"t1": "engine", "t2": "life"}


def test_n9_multi_model_train_save_load(spark, tmp_path):
    rows = []
    for i in range(20):
        rows.append((f"a{i}", "spark join agg", "big data engine text", "engine"))
        rows.append((f"b{i}", "cats dogs pets", "animal life pets text", "life"))
    train = spark.createDataFrame(rows, "id string, f1 string, f2 string, category string")
    models = nlp.train_multiple_models(train, ["f1", "f2"], "category")
    assert set(models) == {"f1", "f2"}

    nlp.save_models(models, str(tmp_path / "models"))
    loaded = nlp.load_models(spark, str(tmp_path / "models"), ["f1", "f2"])

    test = spark.createDataFrame([("t1", "spark agg", "engine data")], "id string, f1 string, f2 string")
    # per-feature models expect their own text column; transform uses each
    voted = {r["id"]: r["category"] for r in
             nlp.predict_category_multi(
                 {"f1": loaded["f1"]}, test.withColumnRenamed("f1", "f1")).collect()}
    assert voted["t1"] == "engine"
