"""Text analysis for corpus curation: token counting, quality metrics,
language ID heuristic, document fingerprinting.

Everything is a JVM column expression (no UDFs): these run inside the same
scan as other per-document work, fully codegen'd. The language heuristic is
deliberately simple/deterministic (stopword-hit scoring) — model-based
lang-ID would follow the N1 pandas-UDF pattern (SURVEY.md §2.10) with an
executor-cached model, which this container doesn't ship.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword inventories per language — the ~40 most frequent function words
# of each, drawn from standard public frequency lists (the same inventories
# every classical stopword-based lang-ID heuristic uses). Kept lowercase
# and apostrophe-free so both engines (Spark / DuckDB lower()+split) treat
# them identically. The FIRST TEN English entries are load-bearing for the
# n_stopwords_en quality metric's oracle — extend lists at the END.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "is", "in", "that", "it", "for",
           "on", "with", "as", "was", "are", "be", "this", "have", "not",
           "but", "by", "from", "they", "you", "he", "we", "at", "or",
           "his", "her", "all", "there", "their", "what", "which", "when",
           "who", "will", "an", "one"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf",
           "zu", "den", "dem", "des", "eine", "er", "sie", "es", "ich",
           "wir", "ihr", "im", "für", "von", "als", "auch", "an", "aus",
           "bei", "nach", "wenn", "aber", "oder", "nur", "noch", "wie",
           "was", "man", "sich", "haben", "wird"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "dans",
           "que", "qui", "ne", "pas", "pour", "sur", "avec", "au", "aux",
           "ce", "cette", "il", "elle", "nous", "vous", "ils", "son",
           "sa", "ses", "mais", "ou", "si", "plus", "par", "tout",
           "sont", "avoir", "fait", "comme", "même", "aussi"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "de", "en",
           "que", "no", "se", "por", "con", "para", "su", "al", "lo",
           "como", "más", "pero", "sus", "le", "ya", "o", "este", "sí",
           "porque", "esta", "entre", "cuando", "muy", "sin", "sobre",
           "también", "me", "hasta", "hay", "donde"],
    "it": ["il", "la", "gli", "e", "è", "un", "una", "di", "che", "per",
           "non", "in", "si", "con", "su", "del", "della", "dei", "delle",
           "al", "alla", "da", "nel", "nella", "ma", "se", "come", "anche",
           "più", "questo", "questa", "sono", "ha", "hanno", "io", "noi",
           "loro", "molto", "quando", "dove"],
    "pt": ["o", "a", "os", "as", "e", "é", "um", "uma", "de", "do", "da",
           "dos", "das", "em", "que", "não", "se", "por", "com", "para",
           "no", "na", "nos", "nas", "ao", "à", "como", "mais", "mas",
           "seu", "sua", "ou", "quando", "muito", "já", "também", "só",
           "pelo", "pela", "isso"],
    "nl": ["de", "het", "een", "en", "is", "niet", "van", "in", "op",
           "dat", "die", "te", "met", "voor", "zijn", "er", "maar", "om",
           "aan", "als", "bij", "ook", "naar", "dan", "wat", "uit", "nog",
           "over", "door", "hij", "zij", "wij", "je", "ik", "dit", "deze",
           "heeft", "worden", "kan", "geen"],
    "sv": ["och", "att", "det", "som", "en", "ett", "är", "av", "för",
           "på", "med", "den", "till", "inte", "om", "har", "de", "i",
           "du", "jag", "vi", "han", "hon", "men", "så", "kan", "när",
           "vad", "eller", "från", "ut", "vara", "sig", "efter", "upp",
           "alla", "vid", "mycket", "nu", "över"],
    "pl": ["i", "w", "na", "z", "do", "nie", "że", "to", "się", "jest",
           "jak", "po", "co", "tak", "za", "od", "ale", "czy", "przez",
           "już", "być", "może", "tylko", "bardzo", "kiedy", "gdzie",
           "dla", "przy", "bez", "pod", "nad", "ten", "ta", "te", "jego",
           "jej", "ich", "my", "wy", "oni"],
    "tr": ["ve", "bir", "bu", "da", "de", "için", "ile", "ne", "gibi",
           "daha", "çok", "ama", "en", "o", "ben", "sen", "biz", "siz",
           "onlar", "var", "yok", "olarak", "sonra", "kadar", "her",
           "şey", "mi", "mu", "ki", "ya", "ancak", "çünkü", "nasıl",
           "neden", "şu", "böyle", "olan", "iki", "on", "bunu"],
    "ro": ["și", "în", "de", "la", "cu", "pe", "un", "o", "este", "nu",
           "se", "ce", "că", "mai", "din", "pentru", "dar", "sau", "când",
           "cum", "după", "fără", "sunt", "al", "ale", "lui", "ei", "noi",
           "voi", "acest", "această", "fost", "fi", "are", "avea", "doar",
           "între", "până", "unde", "toate"],
    "id": ["yang", "dan", "di", "ke", "dari", "untuk", "pada", "dengan",
           "ini", "itu", "tidak", "ada", "akan", "juga", "saya", "kamu",
           "dia", "kami", "mereka", "bisa", "sudah", "belum", "atau",
           "karena", "jika", "seperti", "dalam", "oleh", "sebagai",
           "lebih", "harus", "banyak", "hanya", "telah", "masih", "saat",
           "tahun", "orang", "satu", "dua"],
}

# BPE-ish token regex: word pieces, numbers, or single non-space symbols —
# the whitespace tokenizer's stricter sibling.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def tokens_of(text: Column) -> Column:
    """Whitespace tokens of trimmed text (empty text → empty array)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def token_count(text: Column) -> Column:
    return F.size(tokens_of(text))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish regex tokens — a cheap proxy for subword counts."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append integer quality columns (exact, oracle-comparable):
    n_chars, n_tokens, n_bpe_tokens, n_punct, n_digits, n_upper,
    n_stopwords_en, max_token_len, n_repeated_3grams (copy-paste signal)."""
    t = F.col(text_col)
    toks = tokens_of(t)
    low = F.transform(toks, lambda x: F.lower(x))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    return (
        df.withColumn("n_chars", F.length(t).cast("bigint"))
        .withColumn("n_tokens", F.size(toks).cast("bigint"))
        .withColumn("n_bpe_tokens", bpe_token_count(t).cast("bigint"))
        .withColumn("n_punct", F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0))).cast("bigint"))
        .withColumn("n_digits", F.size(F.regexp_extract_all(t, F.lit(r"[0-9]"), F.lit(0))).cast("bigint"))
        .withColumn("n_upper", F.size(F.regexp_extract_all(t, F.lit(r"[A-Z]"), F.lit(0))).cast("bigint"))
        .withColumn(
            "n_stopwords_en",
            F.size(F.filter(low, lambda x: F.array_contains(sw, x))).cast("bigint"),
        )
        .withColumn(
            "max_token_len",
            F.coalesce(F.array_max(F.transform(toks, lambda x: F.length(x))), F.lit(0)).cast("bigint"),
        )
    )


def quality_filter(
    df: DataFrame, text_col: str = "text", *,
    min_tokens: int = 1, max_tokens: int = 1_000_000,
    max_punct_ratio: float = 1.0, max_digit_ratio: float = 1.0,
    max_dup_token_frac: float = 1.0,
) -> DataFrame:
    """Gopher-style document FILTER (r5): keep rows whose quality signals
    fall inside the bounds — the published-recipe step that turns the
    quality METRICS into a curated corpus. Signals (all per-row JVM
    expressions — map-only, no UDF, no shuffle; at 100 TB this is a scan
    projection that pipelines into the next stage):

      - whitespace token count in [min_tokens, max_tokens];
      - punctuation and digit character ratios (vs total chars);
      - duplicate-token fraction = 1 - distinct/total over normalized
        word tokens (the map-only subset of repetition_metrics' signals;
        zero-token docs get 0.0 and fail min_tokens instead).

    Defaults are pass-through; callers set the published thresholds for
    their corpus (e.g. Gopher's 50..100k tokens)."""
    t = F.col(text_col)
    ntok = F.size(tokens_of(t))
    nchar = F.greatest(F.length(t), F.lit(1))
    npunct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0)))
    ndig = F.size(F.regexp_extract_all(t, F.lit(r"[0-9]"), F.lit(0)))
    wtoks = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(t), r"[^a-z0-9]+", " ")), " "),
        lambda x: x != "",
    )
    dupfrac = F.when(
        F.size(wtoks) > 0,
        F.lit(1.0) - F.size(F.array_distinct(wtoks)) / F.size(wtoks),
    ).otherwise(F.lit(0.0))
    keep = (
        (ntok >= min_tokens) & (ntok <= max_tokens)
        & (npunct / nchar <= max_punct_ratio)
        & (ndig / nchar <= max_digit_ratio)
        & (dupfrac <= max_dup_token_frac)
    )
    return df.filter(keep)


def quality_score(df: DataFrame, text_col: str = "text",
                  alias: str = "quality") -> DataFrame:
    """Composite 0..1 quality score from the integer metrics (heuristic
    weights; each sub-signal in [0,1])."""
    m = quality_metrics(df, text_col)
    len_ok = F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0))
    punct_ok = 1 - F.least(F.col("n_punct") / F.greatest(F.col("n_chars"), F.lit(1)) * 4, F.lit(1.0))
    sw_ok = F.least(F.col("n_stopwords_en") / F.greatest(F.col("n_tokens"), F.lit(1)) * 5, F.lit(1.0))
    longtok_ok = F.when(F.col("max_token_len") > 40, F.lit(0.0)).otherwise(F.lit(1.0))
    return m.withColumn(
        alias, (0.3 * len_ok + 0.25 * punct_ok + 0.25 * sw_ok + 0.2 * longtok_ok)
    )


def detect_language(df: DataFrame, text_col: str = "text",
                    alias: str = "lang_pred") -> DataFrame:
    """N1 analog — language ID by stopword-hit scoring: the language with
    the most stopword hits wins (ties: lexicographic; zero hits → 'und').
    Deterministic; reference pins langdetect's seed for the same reason
    (/root/reference/src/preprocessing.py:16)."""
    low = F.transform(tokens_of(F.col(text_col)), lambda x: F.lower(x))
    scores = []
    for lang, words in sorted(STOPWORDS.items()):
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(low, lambda x: F.array_contains(sw, x))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # max over (hits, -lang) — array_max on structs orders field-by-field;
    # to break ties lexicographically-ascending we sort desc by hits then asc lang
    arr = F.array(*scores)
    best = F.try_element_at(
        F.reverse(F.array_sort(arr)), F.lit(1)
    )
    # reverse(array_sort) gives hits desc but lang desc on ties → re-sort ties:
    top_hits = best["hits"]
    winners = F.filter(arr, lambda s: s["hits"] == top_hits)
    winner = F.array_min(F.transform(winners, lambda s: s["lang"]))
    return df.withColumn(
        alias, F.when(top_hits > 0, winner).otherwise(F.lit("und"))
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                alias: str = "fingerprint") -> DataFrame:
    """Document fingerprint: first 16 hex chars of sha256 over normalized
    text — stable under case/punctuation/whitespace jitter."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "))
    return df.withColumn(alias, F.substring(F.sha2(norm, 256), 1, 16))


# --- PII redaction (round 4) ----------------------------------------------
#
# The standard pre-training scrub (emails / IPv4s / phone-like digit runs →
# typed placeholder tokens). Patterns are kept inside the RE2-compatible
# subset (no lookaround, no backreferences) so the SAME pattern strings run
# in Spark (Java regex) and DuckDB (RE2) — which is also what makes the
# operator oracle-checkable. Order is load-bearing: emails first (an
# address contains digit runs), IPs before phones (an IPv4 is a phone-like
# digit run with dots).
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d()-]{7,}\d", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """text with emails/IPv4s/phone-like digit runs replaced by typed
    placeholders — a codegen'd regexp_replace chain, no UDF."""
    out = text
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def repetition_metrics(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(id, n_tokens, dup_token_frac, top_token_frac) — Gopher-style
    intra-document repetition signals: the fraction of tokens that are
    repeats of an earlier token, and the share of the single most frequent
    token. High values mark boilerplate/keyword-stuffed documents that
    length and stopword ratios miss.

    Plan: explode tokens → two-level aggregate (per-(doc, token) counts,
    then per-doc max/sum). Both aggregates partially aggregate map-side;
    token-level rows never leave the executor unreduced. Documents with no
    tokens are dropped (metrics undefined)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " ")
        ), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    per_tok = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("c"))
    return per_tok.groupBy("id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        (F.lit(1.0) - F.count(F.lit(1)) / F.sum("c")).alias("dup_token_frac"),
        (F.max("c") / F.sum("c")).alias("top_token_frac"),
    )


def pack_sequences(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", capacity: int = 2048,
                   order_col: str | None = None) -> DataFrame:
    """GPT-style sequence packing (r5): concatenate the corpus's token
    stream in a stable document order and cut it into training sequences
    of exactly `capacity` tokens, letting documents span sequence
    boundaries (the padding-free "concat-and-split" convention of
    GPT/LLaMA-style pretraining — chunk_documents is the per-document
    alternative that never crosses boundaries). Returns the assignment
    table (seq_id, id, tok_start, tok_len): for each document, which
    slice of its whitespace-token stream lands in which sequence; every
    token of every non-empty document appears exactly once, and a writer
    joining text back in can materialize the packed shards map-side.

    Scale design — the global running token offset is the crux: a naive
    `Window.orderBy(order)` cumsum collapses to ONE partition. Instead a
    two-phase distributed prefix sum: range-repartition by the order
    column, lift per-partition token totals (one tiny row per partition)
    into a plain-dict offset map, then a NARROW sortWithinPartitions +
    Arrow-batched running sum (numpy cumsum carried across batches) —
    a `Window.partitionBy(pid)` here would re-shuffle the frame on a key
    it is already exactly partitioned by. The partitioned counts frame
    is persisted so the totals pass and the cumsum pass see the same
    physical partitioning (range sampling is not re-run). Emit is
    map-only from there: each doc explodes into the 1 + spans it
    crosses. Cost at 100 TB: ONE range shuffle of (id, ntok) pairs —
    the text itself never moves and nothing shuffles twice."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    order_col = order_col or id_col
    base = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("id"), F.col(order_col).alias("_ord"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        .cast("long").alias("_ntok"),
    )
    from pyspark.sql.types import LongType, StructField, StructType

    from kgsum_spark.datapipe._util import persist_tracked

    # (_ord, id) — not _ord alone: repartitionByRange keeps equal keys
    # together but sortWithinPartitions leaves tied rows in arbitrary
    # relative order, so duplicate order keys (guaranteed for a 60-bit
    # hash order column at ~2^30 docs by birthday collisions) would make
    # the packing nondeterministic run-to-run (ADVICE r5). The id
    # tiebreak makes it a pure function of the data.
    part = persist_tracked(
        base.repartitionByRange("_ord", "id")
        .withColumn("_pid", F.spark_partition_id())
    )
    totals = sorted(
        (r["_pid"], r["t"]) for r in
        part.groupBy("_pid").agg(F.sum("_ntok").alias("t")).collect()
    )
    offsets, acc = {}, 0
    for pid, t in totals:
        offsets[pid] = acc
        acc += t

    out_schema = StructType([
        part.schema["id"],
        StructField("_ntok", LongType()),
        StructField("_off", LongType()),
    ])

    def _running_offset(batches):
        # One partition per call; batches arrive in sorted row order, so
        # the running total carries across Arrow batches. The base
        # offset is this partition's global prefix from the totals map.
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offsets.get(int(pdf["_pid"].iloc[0]), 0)
            ends = pdf["_ntok"].to_numpy().cumsum() + run
            out = pdf[["id", "_ntok"]].copy()
            out["_off"] = ends - pdf["_ntok"].to_numpy()
            run = int(ends[-1])
            yield out

    offs = part.sortWithinPartitions("_ord", "id").mapInPandas(
        _running_offset, schema=out_schema)
    cap = F.lit(int(capacity))
    spanned = offs.select(
        "id", "_ntok", "_off",
        F.explode(F.sequence(
            F.expr(f"_off div {int(capacity)}"),
            F.expr(f"(_off + _ntok - 1) div {int(capacity)}"),
        )).alias("seq_id"),
    )
    tok_start = F.greatest(F.lit(0).cast("long"),
                           F.col("seq_id") * cap - F.col("_off"))
    tok_end = F.least(F.col("_ntok"),
                      (F.col("seq_id") + 1) * cap - F.col("_off"))
    return spanned.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        "id",
        tok_start.cast("long").alias("tok_start"),
        (tok_end - tok_start).cast("long").alias("tok_len"),
    )


def pack_sequences_text(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", capacity: int = 2048,
                        order_col: str | None = None) -> DataFrame:
    """Materialize the packed training shards (r5): join the document
    text back onto the pack_sequences assignment table and emit one row
    per sequence — (seq_id, n_tokens, seq_text) with exactly `capacity`
    tokens per sequence except the last. This is the step that actually
    writes GPT-style pretraining shards; pack_sequences alone is the
    planning half.

    Scale shape: the assignment table is slim (4 longs per doc-span);
    the join shuffles on the doc id and the final groupBy shuffles each
    token slice ONCE to its sequence — that data movement IS the
    materialization (tokens must physically migrate to their output
    sequence), so two shuffles is the floor, and the text column is
    sliced to just the spanned tokens BEFORE the second shuffle. Piece
    order within a sequence is restored by array_sort on (order,
    tok_start) structs — no single-partition window."""
    order_col = order_col or id_col
    assign = pack_sequences(df, id_col, text_col, capacity, order_col)
    docs = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("id"), F.col(order_col).alias("_ord"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"),
    )
    piece = F.slice("_toks", F.col("tok_start") + 1, F.col("tok_len"))
    per = assign.join(docs, "id").select(
        "seq_id",
        F.struct(F.col("_ord"), F.col("tok_start"),
                 piece.alias("piece")).alias("_p"),
    )
    ordered = F.array_sort(F.collect_list("_p"))
    toks = F.flatten(F.transform(ordered, lambda s: s["piece"]))
    return per.groupBy("seq_id").agg(
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_join(toks, " ").alias("seq_text"),
    )


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    width: int = 64, stride: int = 48) -> DataFrame:
    """(id, chunk_idx, n_chunk_tokens, chunk_text) — fixed-width token
    windows with stride (overlap = width - stride): the training-window
    prep step that turns variable-length documents into model-sized
    examples. Semantics: full-width chunks only (the unaligned tail is
    dropped, the standard packing convention); a document shorter than
    `width` yields exactly one chunk of the whole document.

    Plan: one sequence() of chunk starts per row, explode, slice — all
    JVM array expressions inside the scan projection; no UDF, no shuffle.
    At 100 TB chunking is a map-only stage that pipelines into whatever
    writes the training shards."""
    if stride <= 0 or width <= 0:
        raise ValueError("width and stride must be positive")
    df = df.filter(F.trim(F.col(text_col)) != "")  # no chunks from empties
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    starts = F.when(
        n >= width, F.sequence(F.lit(1), n - width + 1, F.lit(stride))
    ).otherwise(F.array(F.lit(1)))
    out = df.select(
        F.col(id_col).alias("id"), toks.alias("_toks"),
        F.explode(starts).alias("_start"),
    )
    chunk = F.slice("_toks", F.col("_start"), width)
    return out.select(
        "id",
        ((F.col("_start") - 1) / stride).cast("int").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
