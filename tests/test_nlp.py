"""NLP operators: tokenization, normalization, mention typing, TF-IDF,
per-feature classifiers with vote (SURVEY.md §2.10)."""

from __future__ import annotations

import pytest
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


def test_normalize_tokens_rejects_unknown_stemmer(spark):
    """A typo'd stemmer name must raise, not silently fall back to the
    suffix stripper with different tokens (ADVICE r4)."""
    with pytest.raises(ValueError, match="Porter"):
        nlp.normalize_tokens(F.col("text"), stemmer="Porter")


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


# --- r2: N5 hyper-search + estimator grid ---------------------------------


@pytest.fixture(scope="module")
def labeled_docs(spark):
    rows = []
    for i in range(60):
        rows.append((i, f"spark query engine plan shuffle stage {i % 3}", "tech"))
        rows.append((100 + i, f"banana apple fruit salad kitchen recipe {i % 3}", "food"))
    return spark.createDataFrame(rows, "id long, text string, label string")


def test_hyper_search_nb_deterministic(labeled_docs):
    from kgsum_spark.nlp import hyper_search_classifier

    m1, i1 = hyper_search_classifier(labeled_docs, "text", "label", "nb", n_iter=3)
    m2, i2 = hyper_search_classifier(labeled_docs, "text", "label", "nb", n_iter=3)
    assert i1["best_params"] == i2["best_params"]
    assert i1["validation_metrics"] == i2["validation_metrics"]
    assert i1["n_candidates"] == 3
    assert i1["best_f1_weighted"] > 0.9  # trivially separable corpus


def test_hyper_search_dt_grid(labeled_docs):
    from kgsum_spark.nlp import hyper_search_classifier

    m, info = hyper_search_classifier(labeled_docs, "text", "label", "dt", n_iter=4)
    assert info["n_candidates"] == 4
    assert set(info["best_params"]) <= {"maxDepth", "minInstancesPerNode", "impurity"}
    assert info["best_f1_weighted"] > 0.9


def test_train_best_classifier_picks_and_predicts(labeled_docs):
    from kgsum_spark.nlp import train_best_classifier
    from kgsum_spark.operators.agg import classification_metrics

    model, info = train_best_classifier(
        labeled_docs, "text", "label", estimator_types=("nb", "dt"), n_iter=2)
    assert info["estimator_type"] in ("nb", "dt")
    pred = model.transform(labeled_docs).select(
        "label", F.col("prediction_label").alias("pred"))
    m = {r["cls"]: r for r in
         classification_metrics(pred, "label", "pred").collect()}
    assert m["tech"]["f1"] > 0.9 and m["food"]["f1"] > 0.9


def test_hyper_search_svm_runs(labeled_docs):
    from kgsum_spark.nlp import hyper_search_classifier

    m, info = hyper_search_classifier(labeled_docs, "text", "label", "svm", n_iter=2)
    assert info["n_candidates"] == 2
    assert info["best_f1_weighted"] > 0.9


def test_langdetect_and_spacy_gates_raise(spark):
    """N1/N2 library paths: the seams exist and gate cleanly when the
    libraries are absent (this container ships neither)."""
    from kgsum_spark.nlp import detect_language_langdetect, lemmatize_spacy

    df = spark.createDataFrame([("hello world",)], ["text"])
    try:
        import langdetect  # noqa: F401
        out = detect_language_langdetect(df).collect()
        assert out[0]["lang_pred"] == "en"
    except ImportError:
        with pytest.raises(NotImplementedError):
            detect_language_langdetect(df)
    try:
        import spacy  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            lemmatize_spacy(df)


def test_n8_latent_classifier(labeled_docs):
    """N8 analog: TF-IDF → PCA latent-32 → seeded RandomForest search —
    the latent space must carry enough signal to separate the corpus."""
    from kgsum_spark.nlp import train_latent_classifier
    from kgsum_spark.operators.agg import classification_metrics

    model, info = train_latent_classifier(
        labeled_docs, "text", "label", latent_dim=8, n_iter=2)
    assert info["n_candidates"] == 2 and info["best_f1_weighted"] > 0.9
    pred = model.transform(labeled_docs).select(
        "label", F.col("prediction_label").alias("pred"))
    m = {r["cls"]: r for r in classification_metrics(pred, "label", "pred").collect()}
    assert m["tech"]["f1"] > 0.9 and m["food"]["f1"] > 0.9


def test_porter_stem_published_vectors():
    """Porter (1980) — the paper's own step examples must hold."""
    from kgsum_spark.nlp import porter_stem

    vectors = {
        # step 1a
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat",
        # step 1b (+ cleanup)
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "bled": "bled", "motoring": "motor", "sing": "sing",
        "conflated": "conflat", "troubled": "troubl", "sized": "size",
        "hopping": "hop", "tanned": "tan", "falling": "fall",
        "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file",
        # step 1c
        "happy": "happi", "sky": "sky",
        # step 2
        "relational": "relat", "conditional": "condit",
        "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
        "digitizer": "digit", "differentli": "differ", "vileli": "vile",
        "analogousli": "analog", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl",
        # step 3
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good",
        # step 4
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
        "communism": "commun", "activate": "activ",
        "angulariti": "angular", "effective": "effect",
        # step 5
        "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
    }
    wrong = {w: (porter_stem(w), want) for w, want in vectors.items()
             if porter_stem(w) != want}
    assert not wrong, wrong


def test_normalize_tokens_porter_column(spark):
    """The porter stemmer column path (pandas UDF) stems and drops
    stopwords like the JVM path."""
    from pyspark.sql import functions as F

    from kgsum_spark.nlp import normalize_tokens

    df = spark.createDataFrame(
        [("The operators were adjusting the gyroscopic instruments",)],
        "text string")
    got = df.select(
        normalize_tokens(F.col("text"), stemmer="porter").alias("toks")
    ).first()["toks"]
    assert "oper" in got and "adjust" in got and "gyroscop" in got
    assert "the" not in got  # stopword dropped ("were" is not in the 40-word list)
