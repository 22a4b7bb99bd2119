"""NLP operators (SURVEY.md §2.10): normalization, mention/type detection,
TF-IDF features, per-feature classifiers with voting.

The reference runs spaCy/langdetect/sklearn row-at-a-time
(/root/reference/src/preprocessing.py:89-223, src/pipeline_build.py:83-585).
This container ships neither spaCy nor sklearn, so:
- normalization (N2) and mention detection (N3) are pure JVM column
  expressions (higher-order functions) — deterministic, no model files;
- TF-IDF (N4) and classification (N5) use Spark ML (CountVectorizer/IDF/
  NaiveBayes) — distributed versions of the reference's sklearn pipeline;
- language ID (N1) lives in datapipe.textstats (stopword scoring,
  deterministic — the reference pins langdetect's seed for the same goal).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .datapipe.textstats import STOPWORDS
from .operators.scalar import IS_URI_LOOSE

# C6 — the reference's hybrid tokenizer: whitespace split; URI tokens kept
# whole; other tokens re-split by \b\w\w+\b (/root/reference/src/pipeline_build.py:72-80).
_WORD_RE = r"[A-Za-z0-9_]{2,}"


def hybrid_tokenize(text: Column) -> Column:
    """C6 as one JVM expression: split on whitespace, keep URI-ish tokens
    whole, re-extract 2+-char word tokens from the rest, flatten."""
    raw = F.split(F.trim(text), r"\s+")
    return F.flatten(
        F.transform(
            raw,
            lambda t: F.when(t.rlike(IS_URI_LOOSE), F.array(t)).otherwise(
                F.regexp_extract_all(F.lower(t), F.lit(_WORD_RE), F.lit(0))
            ),
        )
    )


def normalize_tokens(text: Column, lang: str = "en",
                     stemmer: str = "suffix") -> Column:
    """N2 analog — lowercase word tokens minus stopwords/punct, stemmed
    (the deterministic stand-in for spaCy lemmatization, reference
    pipeline table at /root/reference/src/preprocessing.py:21-77; the
    correctness path deliberately avoids model-version drift — SURVEY.md
    §7 hard-part 1).

    stemmer="suffix" (default): a cheap JVM regex suffix stripper — whole
    expression stays in codegen, the hot-path choice. stemmer="porter":
    the full published Porter algorithm (porter_stem below) via an
    Arrow-batched pandas UDF with a per-worker lru memo — Zipfian token
    streams make the memo hit ~99%, so the measured end-to-end rate
    (r5, 6M tokens, local[8]) is 2.17M tokens/s vs 1.52M for the JVM
    suffix path: the former "offline-quality only" caveat no longer
    applies; pick by stemming semantics, not cost."""
    if stemmer not in ("suffix", "porter"):
        raise ValueError(
            f"normalize_tokens: unknown stemmer {stemmer!r} "
            "(expected 'suffix' or 'porter')"
        )
    if stemmer == "porter":
        stopset = set(STOPWORDS.get(lang, STOPWORDS["en"]))

        @F.pandas_udf("array<string>")
        def _porter_tokens(texts: pd.Series) -> pd.Series:
            import re

            # Zipfian token streams: a bounded memo turns ~99% of stem
            # calls into dict hits — measured 0.09M → 6.99M tokens/s
            # (74×) on 2M tokens over a 5k-word Zipfian vocab (r5).
            # The memo lives in worker-global state (_porter_memo_stem,
            # importable module scope) so it SURVIVES across Arrow
            # batches and — with spark.python.worker.reuse — across
            # tasks; r5 built an lru_cache inside this body, which runs
            # once per ~10k-row batch, so cross-batch hits (the bulk of
            # a Zipfian stream's repeats) were being thrown away
            # (ADVICE r5).
            stem = _porter_memo_stem
            word_re = re.compile(r"[a-z][a-z0-9]+")
            return texts.fillna("").map(
                lambda t: [stem(w) for w in word_re.findall(t.lower())
                           if w not in stopset])

        return _porter_tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS.get(lang, STOPWORDS["en"])])
    toks = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z][a-z0-9]+"), F.lit(0))
    kept = F.filter(toks, lambda t: ~F.array_contains(sw, t))
    # order matters: longest suffix first; keep stems of length ≥ 3
    stem = lambda t: F.regexp_replace(t, r"(ings?|eds?|ly|es|s)$", "")  # noqa: E731
    return F.transform(kept, lambda t: F.when(F.length(stem(t)) >= 3, stem(t)).otherwise(t))


# --- N2: Porter stemmer (r4) ------------------------------------------------
#
# The published suffix-stripping algorithm (M. F. Porter, "An algorithm
# for suffix stripping", Program 14(3), 1980 — public knowledge), steps
# 1a-5b, with the standard measure/vowel/double-consonant/*o conditions.
# Pure function: unit-tested against the paper's own example vocabulary.


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in "aeiou":
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: the number of vowel→consonant transitions."""
    m, prev_vowel = 0, False
    for i in range(len(stem)):
        if not _is_cons(stem, i):
            prev_vowel = True
        elif prev_vowel:
            m += 1
            prev_vowel = False
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_cvc(w: str) -> bool:
    """*o condition: stem ends consonant-vowel-consonant, final not w/x/y."""
    return (len(w) >= 3 and _is_cons(w, len(w) - 3)
            and not _is_cons(w, len(w) - 2) and _is_cons(w, len(w) - 1)
            and w[-1] not in "wxy")


def porter_stem(word: str) -> str:
    """Stem one lowercase word per the published Porter (1980) algorithm."""
    w = word.lower()
    if len(w) <= 2:
        return w

    def repl(suffix: str, rep: str, min_m: int) -> bool:
        nonlocal w
        if w.endswith(suffix):
            stem = w[: len(w) - len(suffix)]
            if _measure(stem) > min_m - 1:
                w = stem + rep
                return True
        return False

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif (w.endswith("ed") and _has_vowel(w[:-2])) or \
            (w.endswith("ing") and _has_vowel(w[:-3])):
        w = w[:-2] if w.endswith("ed") else w[:-3]
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)
              and w[-1] not in "lsz"):
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2 (m > 0)
    for suf, rep in (("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
                     ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
                     ("alli", "al"), ("entli", "ent"), ("eli", "e"),
                     ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
                     ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
                     ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
                     ("iviti", "ive"), ("biliti", "ble")):
        if repl(suf, rep, 1):
            break
    # step 3 (m > 0)
    for suf, rep in (("icate", "ic"), ("ative", ""), ("alize", "al"),
                     ("iciti", "ic"), ("ical", "ic"), ("ful", ""),
                     ("ness", "")):
        if repl(suf, rep, 1):
            break
    # step 4 (m > 1)
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
                "ous", "ive", "ize"):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue
            if _measure(stem) > 1:
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and len(w) >= 2 and w[-1] == "l" and w[-2] == "l":
        w = w[:-1]
    return w


# Worker-global stem memo (r6): module scope so the cache survives across
# Arrow batches and, with spark.python.worker.reuse (the default), across
# tasks of a reused Python worker — the UDF lives in this importable
# module, so executors resolve this name instead of getting a pickled-by-
# value fresh cache per task (guide §4.5). Bounded with clear-on-full:
# the realistic distinct-word population (~10^5-10^6 after lowercasing)
# fits; a clear under adversarial vocabularies just costs recompute.
_PORTER_MEMO: dict[str, str] = {}
_PORTER_MEMO_MAX = 1 << 17


def _porter_memo_stem(w: str) -> str:
    s = _PORTER_MEMO.get(w)
    if s is None:
        if len(_PORTER_MEMO) >= _PORTER_MEMO_MAX:
            _PORTER_MEMO.clear()
        s = porter_stem(w)
        _PORTER_MEMO[w] = s
    return s


# N3 — entity mention + coarse type detection. The reference extracts only
# entity TYPES via spaCy NER (/root/reference/src/preprocessing.py:202-223);
# the north_rule needs surface mentions too, so we emit (mention, ent_type).
_MENTION_RE = r"\b[A-Z][\w-]*(?: [A-Z][\w-]*)*\b"
_ORG_SUFFIX = ["Corp", "Labs", "Systems", "Group", "Institute", "Inc", "Ltd"]


def detect_mentions(df: DataFrame, text_col: str = "text",
                    out_col: str = "mention") -> DataFrame:
    """Explode capitalized spans of `text_col` into mention rows with a
    rule-based coarse type (ORG/ID/ABBR/MISC)."""
    spans = F.regexp_extract_all(F.col(text_col), F.lit(_MENTION_RE), F.lit(0))
    out = df.withColumn(out_col, F.explode(spans))
    m = F.col(out_col)
    suffix_hit = F.exists(
        F.array(*[F.lit(s) for s in _ORG_SUFFIX]),
        lambda s: m.endswith(F.concat(F.lit(" "), s)) | (m == s),
    )
    ent_type = (
        F.when(m.rlike(r"\d"), F.lit("ID"))
        .when(suffix_hit, F.lit("ORG"))
        .when(m == F.upper(m), F.lit("ABBR"))
        .otherwise(F.lit("MISC"))
    )
    return out.withColumn("ent_type", ent_type)


def fit_tfidf(df: DataFrame, text_col: str, features_col: str = "features",
              vocab_size: int = 10_000, min_df: int = 1):
    """N4 — TF-IDF features with the hybrid tokenizer (reference params:
    ngram 1-2, min_df 1, max_df .85, max_features 10k at
    /root/reference/src/pipeline_build.py:83-104 and
    src/autoencoder_pipeline.py:173-213). Returns (model, transformed_df).
    Distributed fit: CountVectorizer + IDF (Spark ML)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import IDF, CountVectorizer

    toks = df.withColumn("_toks", hybrid_tokenize(F.col(text_col)))
    cv = CountVectorizer(inputCol="_toks", outputCol="_tf",
                         vocabSize=vocab_size, minDF=float(min_df), maxDF=0.85)
    idf = IDF(inputCol="_tf", outputCol=features_col)
    model = Pipeline(stages=[cv, idf]).fit(toks)
    return model, model.transform(toks).drop("_tf")


def train_feature_classifier(df: DataFrame, text_col: str, label_col: str,
                             seed: int = 42):
    """N5 — one per-feature text classifier: tokenizer → CountVectorizer →
    IDF → NaiveBayes (the reference's estimator grid includes NB at
    /root/reference/src/pipeline_build.py:457-491; NB is the one with a
    scalable exact distributed fit). Returns a fitted PipelineModel whose
    output has `prediction_label` and `confidence`."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import NaiveBayes
    from pyspark.ml.feature import IDF, CountVectorizer, IndexToString, SQLTransformer, StringIndexer

    tok = SQLTransformer(statement=(
        "SELECT *, filter(split(lower(coalesce({c}, '')), '[^a-z0-9]+'), "
        "x -> length(x) >= 2) AS _toks FROM __THIS__"
    ).format(c=text_col))
    cv = CountVectorizer(inputCol="_toks", outputCol="_tf", vocabSize=10_000)
    idf = IDF(inputCol="_tf", outputCol="_features")
    si = StringIndexer(inputCol=label_col, outputCol="_label", handleInvalid="keep")
    nb = NaiveBayes(featuresCol="_features", labelCol="_label", smoothing=1.0)
    i2s = IndexToString(inputCol="prediction", outputCol="prediction_label")
    pipe = Pipeline(stages=[tok, cv, idf, si, nb, i2s])
    model = pipe.fit(df)
    # IndexToString needs the fitted labels
    model.stages[-1].setLabels(model.stages[3].labelsArray[0])
    return model


def train_multiple_models(df: DataFrame, feature_cols: list[str],
                          label_col: str, seed: int = 42) -> dict[str, object]:
    """N9 — per-feature multi-model orchestration: one fitted classifier
    per feature column (train_multiple_models,
    /root/reference/src/pipeline_build.py:239-285). The driver loop is
    intentional — each fit is a distributed Spark ML job."""
    return {
        feat: train_feature_classifier(df, feat, label_col, seed=seed)
        for feat in feature_cols
    }


def save_models(models: dict[str, object], base_path: str) -> None:
    """S8 — model store: Spark ML native save (replaces the reference's
    pickles, /root/reference/src/pipeline_build.py:851-889)."""
    for feat, model in models.items():
        model.write().overwrite().save(f"{base_path}/{feat}")


def load_models(spark, base_path: str, feature_cols: list[str]) -> dict[str, object]:
    """S8 — load-else-train counterpart
    (/root/reference/src/predict_category.py:36-48)."""
    from pyspark.ml import PipelineModel

    return {feat: PipelineModel.load(f"{base_path}/{feat}") for feat in feature_cols}


def predict_category_multi(models: dict[str, object], df: DataFrame,
                           id_col: str = "id") -> DataFrame:
    """J7/A4 — per-feature fan-out + vote: run each feature's model, melt
    the predictions, take the plurality label per row (ties lexicographic).
    The reference does this row-at-a-time with df.apply
    (/root/reference/src/pipeline_build.py:151-203); here each model pass is
    a distributed job and the vote is one groupBy window."""
    from .operators.agg import vote_argmax

    parts = []
    for feat, model in models.items():
        pred = model.transform(df).select(
            F.col(id_col), F.col("prediction_label").alias("label")
        ).withColumn("feature", F.lit(feat))
        parts.append(pred)
    all_preds = parts[0]
    for p in parts[1:]:
        all_preds = all_preds.unionByName(p)
    return vote_argmax(all_preds, id_col, "label", alias="category")


# --- N5: estimator grid + randomized hyper-search (r2) --------------------
#
# The reference trains SVM / NaiveBayes / KNN / J48 through
# RandomizedSearchCV(n_iter<=50, cv=2, scoring='f1_weighted', seed 42)
# (/root/reference/src/pipeline_build.py:457-533). Spark-first analog:
# TrainValidationSplit (one split ~ cv=2's train/val halves) over a seeded
# random subsample of the param grid, scored with the weighted-F1
# MulticlassClassificationEvaluator. KNN has no scalable exact Spark ML
# estimator (and datapipe.similarity.knn_join covers the kNN surface), so
# the grid here is NB / LinearSVC(OneVsRest) / DecisionTree.


def _estimator_and_grid(estimator_type: str, seed: int):
    from pyspark.ml.classification import (
        DecisionTreeClassifier,
        LinearSVC,
        NaiveBayes,
        OneVsRest,
    )

    if estimator_type == "nb":
        est = NaiveBayes(featuresCol="_features", labelCol="_label")
        # alpha grid: linspace(0.01, 2, 10) per the reference
        grid = {est.smoothing: [0.01 + i * (2 - 0.01) / 9 for i in range(10)]}
        return est, grid
    if estimator_type == "svm":
        svc = LinearSVC(featuresCol="_features", labelCol="_label", maxIter=30)
        est = OneVsRest(classifier=svc, featuresCol="_features",
                        labelCol="_label", parallelism=2)
        # C grid: logspace(-2, 2, 8); regParam ~ 1/C
        grid = {svc.regParam: [10 ** (-2 + i * 4 / 7) for i in range(8)]}
        return est, grid
    if estimator_type == "dt":
        est = DecisionTreeClassifier(featuresCol="_features", labelCol="_label",
                                     seed=seed)
        grid = {
            est.maxDepth: [2, 5, 10, 20],
            est.minInstancesPerNode: [1, 2, 5],
            est.impurity: ["gini", "entropy"],
        }
        return est, grid
    raise ValueError(f"unsupported estimator_type {estimator_type!r}")


def hyper_search_classifier(df: DataFrame, text_col: str, label_col: str,
                            estimator_type: str = "nb", n_iter: int = 50,
                            seed: int = 42, train_ratio: float = 0.5):
    """N5 — randomized hyper-search for one estimator type. Returns
    (best_pipeline_model, info) where info carries the chosen param values
    and the validation weighted-F1 of every sampled combo.

    Semantics mirrored from the reference: sample min(n_iter, |grid|)
    combos with a seed-42 RNG, score each on a held-out split with
    weighted F1, keep the best. Each candidate fit is a distributed Spark
    ML job; TrainValidationSplit runs candidates with parallelism=2."""
    import itertools
    import random

    from pyspark.ml import Pipeline
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.feature import (
        IDF,
        CountVectorizer,
        IndexToString,
        SQLTransformer,
        StringIndexer,
    )
    from pyspark.ml.tuning import TrainValidationSplit

    est, grid = _estimator_and_grid(estimator_type, seed)
    params = list(grid.keys())
    combos = list(itertools.product(*[grid[p] for p in params]))
    rnd = random.Random(seed)
    if len(combos) > n_iter:
        combos = rnd.sample(combos, n_iter)
    param_maps = [dict(zip(params, combo)) for combo in combos]

    tok = SQLTransformer(statement=(
        "SELECT *, filter(split(lower(coalesce({c}, '')), '[^a-z0-9]+'), "
        "x -> length(x) >= 2) AS _toks FROM __THIS__"
    ).format(c=text_col))
    cv = CountVectorizer(inputCol="_toks", outputCol="_tf", vocabSize=10_000)
    idf = IDF(inputCol="_tf", outputCol="_features")
    si = StringIndexer(inputCol=label_col, outputCol="_label", handleInvalid="keep")
    pipe = Pipeline(stages=[tok, cv, idf, si, est])

    evaluator = MulticlassClassificationEvaluator(
        labelCol="_label", predictionCol="prediction", metricName="f1"
    )
    tvs = TrainValidationSplit(
        estimator=pipe, estimatorParamMaps=param_maps, evaluator=evaluator,
        trainRatio=train_ratio, seed=seed, parallelism=2,
    )
    model = tvs.fit(df)
    best_idx = max(range(len(param_maps)),
                   key=lambda i: (model.validationMetrics[i], -i))
    info = {
        "estimator_type": estimator_type,
        "best_f1_weighted": float(model.validationMetrics[best_idx]),
        "best_params": {p.name: v for p, v in param_maps[best_idx].items()},
        "n_candidates": len(param_maps),
        "validation_metrics": [float(m) for m in model.validationMetrics],
    }
    return model.bestModel, info


def train_best_classifier(df: DataFrame, text_col: str, label_col: str,
                          estimator_types: tuple = ("nb", "svm", "dt"),
                          n_iter: int = 50, seed: int = 42):
    """N5 best-model pick across estimator TYPES (the reference trains each
    ClassifierType and model_evaluation keeps the best by accuracy/F1,
    /root/reference/src/pipeline_build.py:107-149): run the randomized
    search per type, keep the highest validation weighted-F1; ties broken
    by estimator-type order for determinism. The winning PipelineModel is
    wrapped with IndexToString so predictions surface as labels."""
    from pyspark.ml import PipelineModel
    from pyspark.ml.feature import IndexToString

    best = None
    for et in estimator_types:
        m, info = hyper_search_classifier(df, text_col, label_col, et,
                                          n_iter=n_iter, seed=seed)
        if best is None or info["best_f1_weighted"] > best[1]["best_f1_weighted"]:
            best = (m, info)
    model, info = best
    i2s = IndexToString(inputCol="prediction", outputCol="prediction_label",
                        labels=model.stages[3].labelsArray[0])
    return PipelineModel(stages=list(model.stages) + [i2s]), info


# --- N1/N2: library-backed paths, import-gated (r2) ------------------------
#
# The reference runs langdetect (seed 42) and spaCy per row
# (/root/reference/src/preprocessing.py:16,89-134). Neither library ships
# in this container, so these are the SURVEY-prescribed pandas-UDF shapes
# with a worker-cached model singleton, gated on import: where the library
# exists they run it Arrow-batched; here they raise NotImplementedError at
# the exact seam, and the deterministic analogs (datapipe.textstats
# stopword scorer; normalize_tokens suffix stemmer) remain the defaults.

_WORKER_MODELS: dict = {}  # per-executor singleton cache (loaded once)


def detect_language_langdetect(df: DataFrame, text_col: str = "text",
                               out_col: str = "lang_pred",
                               max_chars: int = 1000) -> DataFrame:
    """N1 — langdetect inside mapInPandas, seed pinned to 42 like the
    reference, input clipped to the first max_chars chars (reference
    behavior at preprocessing.py:325). Raises if langdetect is absent."""
    try:
        import langdetect  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "langdetect not installed; use datapipe.textstats.detect_language "
            "(deterministic stopword scorer) in this environment"
        ) from e

    schema = ", ".join([f"`{c}` {t}" for c, t in df.dtypes] + [f"{out_col} string"])

    def run(batches):
        from langdetect import DetectorFactory, detect

        DetectorFactory.seed = 42  # reference pins this for determinism
        for pdf in batches:
            def one(s):
                try:
                    return detect((s or "")[:max_chars])
                except Exception:  # noqa: BLE001 — undetectable → 'xx' like the reference
                    return "xx"

            out = pdf.copy()
            out[out_col] = pdf[text_col].map(one)
            yield out

    return df.mapInPandas(run, schema)


def lemmatize_spacy(df: DataFrame, text_col: str = "text",
                    out_col: str = "lemmas", lang: str = "en") -> DataFrame:
    """N2 — spaCy lemmatize + stop/punct strip inside mapInPandas with the
    model loaded ONCE per executor (module-level singleton — loading per
    batch would dominate the stage). Raises if spaCy is absent."""
    try:
        import spacy  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "spaCy not installed; use nlp.normalize_tokens (deterministic "
            "suffix-stemmer analog) in this environment"
        ) from e

    schema = ", ".join([f"`{c}` {t}" for c, t in df.dtypes]
                       + [f"{out_col} array<string>"])
    model_name = {"en": "en_core_web_sm"}.get(lang, f"{lang}_core_news_sm")

    def run(batches):
        import spacy

        nlp_model = _WORKER_MODELS.get(model_name)
        if nlp_model is None:
            nlp_model = spacy.load(model_name, disable=["parser", "ner"])
            _WORKER_MODELS[model_name] = nlp_model
        for pdf in batches:
            lemmas = [
                [t.lemma_.lower() for t in doc
                 if not (t.is_stop or t.is_punct or t.is_space)]
                for doc in nlp_model.pipe(pdf[text_col].fillna("").tolist())
            ]
            out = pdf.copy()
            out[out_col] = lemmas
            yield out

    return df.mapInPandas(run, schema)


def train_latent_classifier(df: DataFrame, text_col: str, label_col: str,
                            latent_dim: int = 32, vocab_size: int = 2048,
                            n_iter: int = 10, seed: int = 42,
                            train_ratio: float = 0.5):
    """N8 analog — the reference's autoencoder pipeline (TF-IDF → MLP
    encoder latent-32 → RandomForest + RandomizedSearchCV,
    /root/reference/src/autoencoder_pipeline.py:85-131,273-312) rebuilt
    deterministic and distributed: TF-IDF → PCA (the EXACT linear
    autoencoder — the minimizer of the same reconstruction-MSE objective
    the reference's ReLU MLP approximates) → Spark ML RandomForest with
    the reference's search grid (n_estimators/max_depth/min_samples_split)
    through the same seeded TrainValidationSplit machinery as N5.

    vocab_size is capped because Spark ML PCA materializes a d×d
    covariance (O(d²) memory); for the reference's full 10k features at
    cluster scale, swap the PCA stage for mllib RowMatrix.computeSVD
    (sparse ARPACK) — same latent semantics."""
    import itertools
    import random

    from pyspark.ml import Pipeline
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.feature import (
        IDF,
        PCA,
        CountVectorizer,
        IndexToString,
        SQLTransformer,
        StringIndexer,
    )
    from pyspark.ml.tuning import TrainValidationSplit

    tok = SQLTransformer(statement=(
        "SELECT *, filter(split(lower(coalesce({c}, '')), '[^a-z0-9]+'), "
        "x -> length(x) >= 2) AS _toks FROM __THIS__"
    ).format(c=text_col))
    cv = CountVectorizer(inputCol="_toks", outputCol="_tf", vocabSize=vocab_size)
    idf = IDF(inputCol="_tf", outputCol="_features")
    pca = PCA(k=latent_dim, inputCol="_features", outputCol="_latent")
    si = StringIndexer(inputCol=label_col, outputCol="_label", handleInvalid="keep")
    rf = RandomForestClassifier(featuresCol="_latent", labelCol="_label", seed=seed)
    grid = {
        rf.numTrees: [100, 200, 300],
        rf.maxDepth: [10, 20, 30],
        rf.minInstancesPerNode: [2, 5, 10],
    }
    params = list(grid.keys())
    combos = list(itertools.product(*[grid[p] for p in params]))
    rnd = random.Random(seed)
    if len(combos) > n_iter:
        combos = rnd.sample(combos, n_iter)
    param_maps = [dict(zip(params, combo)) for combo in combos]

    pipe = Pipeline(stages=[tok, cv, idf, pca, si, rf])
    evaluator = MulticlassClassificationEvaluator(
        labelCol="_label", predictionCol="prediction", metricName="f1")
    tvs = TrainValidationSplit(estimator=pipe, estimatorParamMaps=param_maps,
                               evaluator=evaluator, trainRatio=train_ratio,
                               seed=seed, parallelism=2)
    model = tvs.fit(df)
    best_idx = max(range(len(param_maps)),
                   key=lambda i: (model.validationMetrics[i], -i))
    best = model.bestModel
    i2s = IndexToString(inputCol="prediction", outputCol="prediction_label",
                        labels=best.stages[4].labelsArray[0])
    from pyspark.ml import PipelineModel

    info = {
        "latent_dim": latent_dim,
        "best_f1_weighted": float(model.validationMetrics[best_idx]),
        "best_params": {p.name: v for p, v in param_maps[best_idx].items()},
        "n_candidates": len(param_maps),
    }
    return PipelineModel(stages=list(best.stages) + [i2s]), info
