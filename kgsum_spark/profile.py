"""The profile-query battery (SURVEY.md §2.3, Q1-Q12): kgsum's core "query
engine" — ~15 SPARQL feature-extraction queries per graph — re-expressed as
DataFrame plans over a triples table t(subj, pred, obj, obj_is_iri[, o_lang]).

Determinism note (SURVEY.md §7 hard-part 4): the reference applies LIMIT k
to *unordered* DISTINCT results — a nondeterministic row choice in any
engine. Here every capped query orders before limiting (count desc / value
asc), so results are stable and oracle-checkable.

Predicates are parameters; defaults accept both full-IRI and CURIE spellings
of the vocabulary the reference emits (/root/reference/src/generate_profile.py:240-357).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .operators.agg import topk_group_count
from .operators.scalar import namespace_of, tld_of

RDF_TYPE = ["rdf:type", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"]
OWL_SAMEAS = ["owl:sameAs", "http://www.w3.org/2002/07/owl#sameAs"]
DCT_CREATOR = ["dcterms:creator", "http://purl.org/dc/terms/creator"]
DCT_LICENSE = ["dcterms:license", "http://purl.org/dc/terms/license"]
DCT_TITLE = ["dcterms:title", "http://purl.org/dc/terms/title"]
DCT_DESCRIPTION = ["dcterms:description", "http://purl.org/dc/terms/description"]
DCT_SUBJECT = ["dcterms:subject", "http://purl.org/dc/terms/subject"]
VOID_SPARQL = ["void:sparqlEndpoint", "http://rdfs.org/ns/void#sparqlEndpoint"]
VOID_DATASET = ["void:Dataset", "http://rdfs.org/ns/void#Dataset"]

# Q4's 10-way SPARQL UNION of label predicates
# (/root/reference/src/dataset_preparation.py:90-170) collapses to one isin.
LABEL_PREDICATES = [
    "rdfs:label", "http://www.w3.org/2000/01/rdf-schema#label",
    "foaf:name", "http://xmlns.com/foaf/0.1/name",
    "skos:prefLabel", "http://www.w3.org/2004/02/skos/core#prefLabel",
    "rdfs:comment", "http://www.w3.org/2000/01/rdf-schema#comment",
    "awol:label", "http://bblfish.net/work/atom-owl/2006-06-06/#label",
    "skos:note", "http://www.w3.org/2004/02/skos/core#note",
    "wdrs:text", "http://www.w3.org/2007/05/powder-s#text",
    "skosxl:prefLabel", "http://www.w3.org/2008/05/skos-xl#prefLabel",
    "skosxl:literalForm", "http://www.w3.org/2008/05/skos-xl#literalForm",
    "schema:name", "http://schema.org/name",
    "dcterms:title", "http://purl.org/dc/terms/title",
]


def vocabularies(t: DataFrame, limit: int = 1000) -> DataFrame:
    """Q1 — distinct predicate namespaces
    (/root/reference/src/dataset_preparation.py:26-62): distinct predicates,
    then '#'-or-last-'/'-segment namespace, distinct again."""
    return (
        t.select("pred").distinct()
        .filter(F.col("pred").startswith("http://") | F.col("pred").contains(":"))
        .select(namespace_of(F.col("pred")).alias("voc"))
        .distinct()
        .orderBy("voc")
        .limit(limit)
    )


def class_histogram(t: DataFrame, limit: int = 1000,
                    rdf_type: list[str] = RDF_TYPE) -> DataFrame:
    """Q2 — `?instance a ?class` top-k group-count, kgsum's flagship profile
    query (/root/reference/src/dataset_preparation.py:65-87)."""
    return topk_group_count(
        t.filter(F.col("pred").isin(rdf_type)).select(F.col("obj").alias("curi")),
        "curi", k=limit,
    )


def property_histogram(t: DataFrame, limit: int = 1000,
                       rdf_type: list[str] = RDF_TYPE) -> DataFrame:
    """Q3 — predicate usage counts excluding rdf:type
    (/root/reference/src/dataset_preparation.py:203-227)."""
    return topk_group_count(
        t.filter(~F.col("pred").isin(rdf_type)).select(F.col("pred").alias("puri")),
        "puri", k=limit,
    )


def labels(t: DataFrame, limit: int = 1000,
           label_preds: list[str] = LABEL_PREDICATES,
           rdf_type: list[str] = RDF_TYPE,
           lang_col: str | None = None) -> DataFrame:
    """Q4 — distinct label literals of *typed* subjects
    (/root/reference/src/dataset_preparation.py:90-170): label-predicate
    triples semi-joined on typed subjects. The typed-subject set can be
    large → left_semi join (shuffle hash / AQE-chosen), not broadcast."""
    typed = t.filter(F.col("pred").isin(rdf_type)).select("subj").distinct()
    lab = (
        t.filter(F.col("pred").isin(label_preds) & ~F.col("obj_is_iri"))
        .join(typed, "subj", "left_semi")
    )
    if lang_col and lang_col in t.columns:
        # F6 fallback as ONE plan (broadcast 1-row count, no eager job)
        from .operators.filters import lang_filter_with_fallback

        lab = lang_filter_with_fallback(lab, lang_col=lang_col, lang="en")
    return lab.select(F.col("obj").alias("lab")).distinct().orderBy("lab").limit(limit)


def tlds(t: DataFrame, limit: int = 1000) -> DataFrame:
    """Q5 — distinct top-level domains of IRI objects
    (/root/reference/src/dataset_preparation.py:173-200): parse host, last
    dot-segment, keep if 1 < len ≤ 10."""
    return (
        t.filter(F.col("obj_is_iri") & F.col("obj").startswith("http"))
        .select(tld_of(F.col("obj")).alias("tld"))
        .filter((F.length("tld") > 1) & (F.length("tld") <= 10))
        .distinct()
        .orderBy("tld")
        .limit(limit)
    )


def _distinct_obj(t: DataFrame, preds: list[str], alias: str, limit: int) -> DataFrame:
    return (
        t.filter(F.col("pred").isin(preds))
        .select(F.col("obj").alias(alias))
        .distinct()
        .orderBy(alias)
        .limit(limit)
    )


def endpoints(t: DataFrame, limit: int = 2) -> DataFrame:
    """Q6 (/root/reference/src/dataset_preparation.py:230-244)."""
    return _distinct_obj(t, VOID_SPARQL, "sparql", limit)


def creators(t: DataFrame, limit: int = 5) -> DataFrame:
    """Q7 (/root/reference/src/dataset_preparation.py:247-261)."""
    return _distinct_obj(t, DCT_CREATOR, "creator", limit)


def licenses(t: DataFrame, limit: int = 1) -> DataFrame:
    """Q8 (/root/reference/src/dataset_preparation.py:264-278)."""
    return _distinct_obj(t, DCT_LICENSE, "license", limit)


def titles(t: DataFrame, limit: int = 1) -> DataFrame:
    """Q9 (/root/reference/src/dataset_preparation.py:337-351); the
    title→endpoint→'' fallback chain lives in build_profile."""
    return _distinct_obj(t, DCT_TITLE, "title", limit)


def descriptions(t: DataFrame, limit: int = 100) -> DataFrame:
    """Q10 (/root/reference/src/dataset_preparation.py:320-334)."""
    return _distinct_obj(t, DCT_DESCRIPTION, "dsc", limit)


def void_subjects(t: DataFrame, ds_limit: int = 100, limit: int = 100) -> DataFrame:
    """Q11 — two-phase dependent join
    (/root/reference/src/dataset_preparation.py:281-317): datasets typed
    void:Dataset (≤ds_limit), then their dcterms:subject objects. The
    per-dataset query loop becomes one broadcast semi-join."""
    ds = (
        t.filter(F.col("pred").isin(RDF_TYPE) & F.col("obj").isin(VOID_DATASET))
        .select("subj").distinct().orderBy("subj").limit(ds_limit)
    )
    return (
        t.filter(F.col("pred").isin(DCT_SUBJECT))
        .join(F.broadcast(ds), "subj", "left_semi")
        .select(F.col("obj").alias("sbj"))
        .distinct()
        .orderBy("sbj")
        .limit(limit)
    )


def connections(t: DataFrame, limit: int = 1000) -> DataFrame:
    """Q12 — the owl:sameAs edge set, kgsum's entity-linking signal
    (select_local_con, /root/reference/src/dataset_preparation.py:354-368)."""
    return (
        t.filter(F.col("pred").isin(OWL_SAMEAS))
        .select(F.col("obj").alias("con"))
        .distinct()
        .orderBy("con")
        .limit(limit)
    )


def has_any(t: DataFrame) -> bool:
    """Q16 — liveness/existence probe: `SELECT ?s ?p ?o LIMIT 1`
    (/root/reference/src/util.py:67-89). limit(1) short-circuits the scan."""
    return t.limit(1).count() > 0


def existence_fallback(primary: DataFrame, fallback: DataFrame) -> DataFrame:
    """Q13 — probe-then-fallback: use `primary` iff it has rows, else
    `fallback` (async_has_void_file's one-level re-query,
    /root/reference/src/dataset_preparation_remote.py:293-318). The probe
    is one limit(1) job; at scale prefer unioning with a source-rank column
    when both sides must be scanned anyway."""
    return primary if has_any(primary) else fallback


def enrich_with_lookup(df: DataFrame, lookup: DataFrame, on: str,
                       how: str = "left") -> DataFrame:
    """Q14/Q15 — LOV keyword/comment point-lookups
    (/root/reference/src/lov_data_preparation.py:131-184): the reference's
    per-URI HTTP loop becomes ONE broadcast join against the small lookup
    table."""
    return df.join(F.broadcast(lookup), on, how)


# S7 — which profile feature becomes which predicate, mirroring the INSERT
# DATA batches of store_profile (/root/reference/src/generate_profile.py:
# 240-300 main, :307-335 vocab+keyword, :338-357 subject).
PROFILE_TRIPLE_SPEC = [
    # (profile column, predicate, obj_is_iri)
    ("dsc", "dcterms:description", False),
    ("creator", "dcterms:creator", False),
    ("license", "dcterms:license", True),
    ("sparql", "void:sparqlEndpoint", True),
    ("voc", "void:vocabulary", True),
    ("con", "owl:sameAs", True),
    ("sbj", "dcterms:subject", False),
    ("lab", "dcat:keyword", False),
    ("tlds", "dcat:theme", False),
]


def profile_to_triples(profile_df: DataFrame,
                       base_iri: str = "http://kgsum.example/dataset/") -> DataFrame:
    """S7 — materialize a profile row as (subj, pred, obj) triples, the
    columnar analog of the reference's three SPARQL INSERT DATA batches
    (/root/reference/src/generate_profile.py:240-357). Literal escaping is
    unnecessary (columnar sink); IRI-vs-literal is the obj_is_iri flag.
    One declarative unpivot: per-spec explode, unioned."""
    ds = F.concat(F.lit(base_iri), F.col("id"))
    parts = [
        profile_df.select(
            ds.alias("subj"), F.lit("rdf:type").alias("pred"),
            F.lit("dcat:Dataset").alias("obj"), F.lit(True).alias("obj_is_iri"),
        ),
        profile_df.filter(F.col("title") != "").select(
            ds.alias("subj"), F.lit("dcterms:title").alias("pred"),
            F.col("title").alias("obj"), F.lit(False).alias("obj_is_iri"),
        ),
    ]
    for col, pred, is_iri in PROFILE_TRIPLE_SPEC:
        parts.append(
            profile_df.select(ds.alias("subj"), F.explode(col).alias("obj"))
            .filter(F.col("obj") != "")
            .select("subj", F.lit(pred).alias("pred"), "obj",
                    F.lit(is_iri).alias("obj_is_iri"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# per-feature caps, mirroring each feature function's default limit
_PROFILE_FEATURES = ["voc", "curi", "puri", "lab", "tlds", "sparql",
                     "creator", "license", "title", "dsc", "sbj", "con"]
_PROFILE_LIMITS = {"voc": 1000, "curi": 1000, "puri": 1000, "lab": 1000,
                   "tlds": 1000, "sparql": 2, "creator": 5, "license": 1,
                   "title": 1, "dsc": 100, "sbj": 100, "con": 1000}


def _feature_rows(t: DataFrame, graph_col: str | None = None) -> DataFrame:
    """(feat, val) rows for every profile feature — ONE pass over the
    triples table for the ten scan-only features (each row emits its
    feature memberships via a compacted when-array explode), plus the two
    semi-join features (lab: typed subjects; sbj: void datasets) as
    unioned branches sharing the same scan subtree. With graph_col the
    rows carry the graph id and the semi-joins/caps key on it, so ONE
    pass covers every graph."""
    gcols = [graph_col] if graph_col else []
    tags = []

    def tag(cond, feat, val):
        tags.append(F.when(cond, F.struct(F.lit(feat).alias("feat"),
                                          val.alias("val"))))

    is_type = F.col("pred").isin(RDF_TYPE)
    tag(is_type, "curi", F.col("obj"))
    tag(~is_type, "puri", F.col("pred"))
    tag(F.col("pred").startswith("http://") | F.col("pred").contains(":"),
        "voc", namespace_of(F.col("pred")))
    tld = tld_of(F.col("obj"))
    tag(F.col("obj_is_iri") & F.col("obj").startswith("http")
        & (F.length(tld) > 1) & (F.length(tld) <= 10), "tlds", tld)
    for preds, feat in [(VOID_SPARQL, "sparql"), (DCT_CREATOR, "creator"),
                        (DCT_LICENSE, "license"), (DCT_TITLE, "title"),
                        (DCT_DESCRIPTION, "dsc"), (OWL_SAMEAS, "con")]:
        tag(F.col("pred").isin(preds), feat, F.col("obj"))
    arr = F.filter(F.array(*tags), lambda x: x.isNotNull())
    scan = t.select(*gcols, F.explode(arr).alias("fv")) \
        .select(*gcols, "fv.feat", "fv.val")

    typed = t.filter(is_type).select(*gcols, "subj").distinct()
    lab_rows = (
        t.filter(F.col("pred").isin(LABEL_PREDICATES) & ~F.col("obj_is_iri"))
        .join(typed, [*gcols, "subj"], "left_semi")
        .select(*gcols, F.lit("lab").alias("feat"), F.col("obj").alias("val"))
    )
    ds_all = t.filter(is_type & F.col("obj").isin(VOID_DATASET)) \
        .select(*gcols, "subj").distinct()
    if graph_col:
        # per-graph cap: a window, not a global limit (stays one job for
        # any number of graphs)
        wds = Window.partitionBy(graph_col).orderBy("subj")
        ds = ds_all.withColumn("_rn", F.row_number().over(wds)) \
            .filter(F.col("_rn") <= 100).drop("_rn")
    else:
        ds = ds_all.orderBy("subj").limit(100)
    sbj_rows = (
        t.filter(F.col("pred").isin(DCT_SUBJECT))
        .join(F.broadcast(ds), [*gcols, "subj"], "left_semi")
        .select(*gcols, F.lit("sbj").alias("feat"), F.col("obj").alias("val"))
    )
    return scan.unionByName(lab_rows).unionByName(sbj_rows)


def build_profile(t: DataFrame, profile_id: str = "graph") -> DataFrame:
    """Assemble the one-row profile record (keys mirror
    /root/reference/src/dataset_preparation.py:415-431): each feature list
    is a sorted array column.

    Executed as ONE action over ONE main scan of the triples table
    (r1-r2 ran 12 independent feature subtrees — 12 scans/jobs per graph):
    every row's feature memberships explode from a single when-array, one
    (feat, val) count aggregate dedups and counts, one per-feat window
    applies each feature's cap (count-ranked for curi/puri, value-ranked
    for the rest — identical membership to topk_group_count / the
    distinct-orderBy-limit chains), and one pivot folds the capped rows
    into the single profile row. Output is bit-identical to the per-feature
    functions (regression-tested)."""
    row = _assemble_profiles(_feature_rows(t), graph_col=None)
    return row.select(F.lit(profile_id).alias("id"), "title", *[
        c for c in _PROFILE_FEATURES if c != "title"
    ])


def build_profiles(t: DataFrame, graph_col: str = "g") -> DataFrame:
    """EVERY graph's profile in ONE pass — the multi-KG analog of
    build_profile. The reference profiles many KGs in a driver loop, one
    graph per iteration (create_local_dataset,
    /root/reference/src/dataset_preparation.py:526-586); here the graph id
    is just another grouping key, so the when-array explode, the one count
    aggregate, the per-(graph, feat) cap window, and the one pivot cover
    all graphs together — the job count does NOT scale with graph count.
    Output: one row per distinct graph_col value (id = graph id), same
    columns as build_profile; a graph's profile here is bit-identical to
    build_profile run on that graph's rows alone (regression-tested)."""
    rows = _feature_rows(t, graph_col)
    out = _assemble_profiles(rows, graph_col)
    return out.select(F.col(graph_col).alias("id"), "title", *[
        c for c in _PROFILE_FEATURES if c != "title"
    ])


def _assemble_profiles(rows: DataFrame, graph_col: str | None) -> DataFrame:
    """(feat, val[, graph]) rows → one profile row per group: one count
    aggregate dedups and counts, one per-(group, feat) window applies each
    feature's cap (count-ranked for curi/puri, value-ranked for the rest),
    one pivot folds capped rows into array columns."""
    gcols = [graph_col] if graph_col else []
    counted = rows.groupBy(*gcols, "feat", "val") \
        .agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(*gcols, "feat").orderBy(
        F.when(F.col("feat").isin("curi", "puri"), -F.col("cnt"))
        .otherwise(F.lit(0)).asc(),
        F.col("val").asc(),
    )
    cap = F.lit(1000)
    for feat, k in _PROFILE_LIMITS.items():
        if k != 1000:
            cap = F.when(F.col("feat") == feat, F.lit(k)).otherwise(cap)
    capped = (
        counted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
    )
    row = (
        capped.groupBy(*gcols)
        .pivot("feat", _PROFILE_FEATURES)
        .agg(F.array_sort(F.collect_list("val")))
    )
    empty = F.array().cast("array<string>")
    for feat in _PROFILE_FEATURES:
        row = row.withColumn(feat, F.coalesce(F.col(feat), empty))
    # Q9 fallback chain: title → endpoint → "" (/root/reference/src/dataset_preparation.py:405)
    return row.withColumn(
        "title",
        F.coalesce(
            F.try_element_at("title", F.lit(1)),
            F.try_element_at("sparql", F.lit(1)),
            F.lit(""),
        ),
    )
