"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All built-in Spark SQL expressions (whole-stage
codegen); every operator has an exact ANSI-SQL twin for the DuckDB
oracle in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# tiny per-language stopword sets for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    t = F.trim(col)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def add_token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select("doc_id", token_count(F.col(text_col)).alias("n_tokens"))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality signals: token count, mean token length,
    alpha-char ratio, stopword ratio — the standard pretraining-corpus
    quality filters, as pure column expressions."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^a-zA-Z]", ""))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS["en"])))
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(n_stop.cast("double") / F.greatest(n_tok, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(
            (n_chars - n_tok + 1).cast("double") / F.greatest(n_tok, F.lit(1)), 6
        ).alias("mean_token_len"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language heuristic over {en, de, fr}; ties resolve
    en > de > fr (deterministic CASE order, mirrored in the oracle)."""
    toks = tokens(F.col(text_col))

    def _in(ws):
        # nb: single-arg lambda; a second default arg would make
        # F.filter pass the element index into it
        return lambda x: x.isin(*ws)

    scores = {lang: F.size(F.filter(toks, _in(ws))) for lang, ws in STOPWORDS.items()}
    pred = (
        F.when((scores["en"] >= scores["de"]) & (scores["en"] >= scores["fr"]), F.lit("en"))
        .when(scores["de"] >= scores["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return docs.select("doc_id", pred.alias("lang_pred"))


BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^\\sa-zA-Z0-9]"


def add_bpe_token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish subword-boundary token count: letter runs, digit runs and
    single punctuation marks each count as one token (the pre-tokenizer
    split every byte-pair encoder starts from). Pure regexp_count —
    JVM-side, codegen'd."""
    return docs.select(
        "doc_id",
        F.regexp_count(F.col(text_col), F.lit(BPE_PATTERN)).alias("n_bpe_tokens"),
    )


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_alpha_ratio: float = 0.5,
    max_mean_token_len: float = 15.0,
) -> DataFrame:
    """Corpus quality gate: keep docs passing the standard pretraining
    filters (token-count band, alpha-char ratio, mean token length).
    Pure column predicates over quality_features — Catalyst pushes the
    whole conjunction into the scan; at 100 TB this IS the first stage
    of the pipeline, so it must stay a filter, never a collect."""
    q = quality_features(docs, text_col)
    return q.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (F.col("mean_token_len") <= max_mean_token_len)
    ).select("doc_id")


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language corpus rollup: doc count, token sum/mean, char sum —
    the dataset-card numbers, one partial+final hash aggregation."""
    t = F.col(text_col)
    return (
        docs.select(
            "lang",
            token_count(t).alias("n_tok"),
            F.length(t).alias("n_chars"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
            F.round(F.avg("n_tok"), 6).alias("avg_tokens"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


def tfidf_topk(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (keyword extraction for corpus exploration / domain tagging):
    score = tf * (ln((N+1)/(df+1)) + 1), lowercased whitespace terms.

    Shape at scale: one explode -> per-(doc,term) hash agg (map-side
    partial), document frequencies from a second hash agg over that
    SAME table (no re-scan of text), N rides in as a broadcast 1-row
    aggregate (no driver action), and the top-k cut is a per-doc window
    — never a global sort. Ties break on term asc, deterministic.

    Returns (doc_id, term, tf, score, rank), rank in [1, k].
    """
    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            (
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + F.lit(1.0))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "doc_id", "term", "tf", F.round("score", 6).alias("score"), "rank"
        )
    )


def bm25_topk(
    docs: DataFrame,
    n_queries: int = 20,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 retrieval: top-k documents per query term, queries being the
    ``n_queries`` highest-document-frequency terms (df desc, term asc —
    a deterministic stand-in for a workload query log). This is the
    retrieval half of retrieval-based curation: benchmark
    decontamination by lookup, dedup-by-retrieval, and
    hard-negative mining for embedding training all reduce to "BM25
    top-k over the corpus".

    score(t, d) = idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl*N/S))
    with idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)), dl = |d| in
    tokens, S = total corpus tokens (so dl*N/S = dl/avgdl with ONE
    deterministic divide — S and dl*N are exact integer aggregates,
    never an order-dependent float mean).

    Shape at scale: one tokenize+explode -> (doc, term) hash agg; doc
    lengths from a second agg over that SAME table; the query-term set
    is n_queries rows (TakeOrdered, then broadcast back onto the
    postings); the top-k cut is a per-term window over only the matched
    postings — never a global sort. The per-(term, doc) score is a pure
    scalar expression, so ranking is engine-reproducible; ties break on
    doc_id asc. Returns (term, doc_id, tf, score, rank).
    """
    terms = docs.where(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    totals = tf.agg(
        F.count_distinct("doc_id").alias("n_docs"), F.sum("tf").alias("s_tokens")
    )
    qterms = df_t.orderBy(F.col("df").desc(), F.col("term").asc()).limit(n_queries)
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .select(
            "term",
            "doc_id",
            "tf",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (
                        (1.0 - b)
                        + b * (F.col("dl") * F.col("n_docs")) / F.col("s_tokens")
                    )
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("term", "doc_id", "tf", F.round("score", 6).alias("score"), "rank")
    )


def lm_score(
    docs: DataFrame,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained bigram language-model score per document — the
    CCNet/Gopher-style fluency filter: documents whose word sequences
    are improbable under a language model trained on the corpus itself
    (boilerplate, shuffled text, lorem-ipsum) score low and get culled
    before pretraining.

    score(doc) = mean over its bigrams of ln P(w2 | w1), with add-alpha
    smoothing P(w2|w1) = (C(w1,w2)+a) / (C(w1,.)+a*V); V = distinct
    unigram vocabulary. alpha defaults to 0.5 (exactly representable in
    binary — keeps the DuckDB oracle's float math bit-aligned).

    Shape at scale: bigrams come from one zip of two array slices (no
    self-join, no window over corpus rows); counts are two hash aggs
    with map-side partials; V rides in as a broadcast 1-row aggregate;
    the per-doc mean is one final hash agg. The UNIGRAM count table is
    vocabulary-sized (<< corpus at 100 TB) and its join stays
    broadcastable, but the BIGRAM table and the per-doc score table are
    corpus-scale in the worst case (distinct bigrams approach the
    bigram-instance count on diverse text; per_doc is one row per doc),
    so those two joins are pinned to shuffle strategies: a size
    misestimate upstream (Range/synthesized sources report bytes, not
    post-explode cardinality) otherwise makes Catalyst broadcast-collect
    the bigram table to the driver — measured at 1M word-salad docs:
    ~1.4 GB of task results, maxResultSize abort. The bigram join
    shuffles on the same (w1, w2) keys its aggregation just produced,
    so the pin costs one exchange reuse, not a new shuffle.

    Returns (doc_id, n_bigrams, lm_logprob); docs with < 2 tokens keep
    a row with n_bigrams = 0 and NULL score.
    """
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(F.col("t"))
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(F.col("t"), 1, n - 1),
            F.slice(F.col("t"), 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = d.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = d.select(F.explode("t").alias("w")).agg(
        F.count_distinct("w").alias("v")
    )
    scored = (
        big.join(c2.hint("shuffle_hash"), ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log(
                (F.col("c2") + F.lit(alpha))
                / (F.col("c1") + F.lit(alpha) * F.col("v"))
            ).alias("logp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("logp"), 6).alias("lm_logprob"),
    )
    return (
        d.select("doc_id")
        .join(per_doc.hint("shuffle_hash"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "lm_logprob",
        )
    )


def token_quantiles(
    docs: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9),
    by: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group token-count quantiles — how filter cutoffs (min/max
    token bands per language) are actually chosen before quality_filter
    ships. Exact linear-interpolation percentiles (Spark `percentile`
    == DuckDB `quantile_cont` semantics, so the oracle is exact); the
    aggregation state is a per-group value-count map, bounded for
    integer token counts. For unbounded/continuous columns at 100 TB
    switch to approx_percentile (t-digest, fixed-size state) — same
    call shape, documented tradeoff.

    Returns (<by>, q, value) — one row per group and quantile.
    """
    n = token_count(F.col(text_col))
    agg = docs.select(F.col(by), n.alias("n_tok")).groupBy(by).agg(
        F.percentile("n_tok", F.lit(list(qs))).alias("vals")
    )
    pairs = F.arrays_zip(
        F.lit(list(qs)).cast("array<double>").alias("q"),
        F.col("vals").alias("value"),
    )
    return agg.select(by, F.explode(pairs).alias("e")).select(
        by,
        F.col("e.q").alias("q"),
        F.round(F.col("e.value"), 6).alias("value"),
    )


def fingerprint(col: Column) -> Column:
    """Normalization fingerprint: lowercase, collapse whitespace, md5 —
    the exact-dedup key (rolling-hash document fingerprinting)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def add_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select("doc_id", fingerprint(F.col(text_col)).alias("fp"))


def repetition_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition quality signals (the Gopher/MassiveText-style rules):

      * distinct_ratio   — type/token ratio (array_distinct, in-task)
      * top_bigram_n     — occurrences of the doc's most frequent word
                           bigram
      * top_bigram_ratio — that count over the doc's bigram total

    Boilerplate, keyword stuffing and degenerate generations all show
    up as a low distinct_ratio or a high top_bigram_ratio. One linear
    pipeline: tokenize ONCE into a materialized array column (indexing
    an inlined split() expression inside transform() re-runs the regexp
    per element — O(n^2) splits per doc), explode_outer, then two hash
    aggregations (per-doc-bigram count, per-doc max) with the per-doc
    scalars carried through via first() — no second scan, no join, no
    windows; zero-token docs report 0/0.0 rather than disappearing.
    """
    tok = docs.select(
        F.col("doc_id"),
        tokens(F.col(text_col)).alias("toks"),
        token_count(F.col(text_col)).alias("n"),
    )
    toks = F.col("toks")
    n = F.col("n")
    base = tok.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(toks))
            / F.greatest(n, F.lit(1)).cast("double"),
            6,
        ).alias("distinct_ratio"),
        F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.concat_ws(" ", toks[i], toks[i + 1]),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("bigrams"),
    )
    ex = base.select(
        "doc_id",
        "n_tokens",
        "distinct_ratio",
        F.size("bigrams").alias("nbg"),
        F.explode_outer("bigrams").alias("bg"),
    )
    per_bigram = ex.groupBy("doc_id", "bg").agg(
        F.count(F.lit(1)).alias("c"),
        F.first("n_tokens").alias("n_tokens"),
        F.first("distinct_ratio").alias("distinct_ratio"),
        F.first("nbg").alias("nbg"),
    )
    per_doc = per_bigram.groupBy("doc_id").agg(
        F.first("n_tokens").alias("n_tokens"),
        F.first("distinct_ratio").alias("distinct_ratio"),
        F.first("nbg").alias("nbg"),
        F.max(
            F.when(F.col("bg").isNotNull(), F.col("c")).otherwise(F.lit(0))
        ).alias("top_bigram_n"),
    )
    return per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "distinct_ratio",
        F.col("top_bigram_n").cast("long").alias("top_bigram_n"),
        F.round(
            F.col("top_bigram_n") / F.greatest("nbg", F.lit(1)).cast("double"),
            6,
        ).alias("top_bigram_ratio"),
    )


# PII patterns: identical Java-regex / RE2 semantics (no alternation
# ambiguity, no backreferences) so the same pattern string drives both
# Spark and any RE2-based engine. Replacement order matters (a phone
# pattern would swallow IPs) and is fixed: email -> ip -> phone.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d().\- ]{7,}\d", "<PHONE>"),
)


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / phone-shaped numbers, keeping counts:
    (doc_id, clean_text, n_email, n_ip, n_phone). Pure
    regexp_count/regexp_replace column expressions — whole-stage
    codegen, no Python in the scrub path. Counts are taken against the
    progressively scrubbed text, matching the replacement order (an IP
    inside an already-redacted email is not double-counted)."""
    out = docs.select("doc_id", F.col(text_col).alias("clean_text"))
    for name, pat, token in PII_PATTERNS:
        out = out.select(
            "doc_id",
            *[c for c in out.columns if c.startswith("n_")],
            F.regexp_count("clean_text", F.lit(pat)).alias(f"n_{name}"),
            F.regexp_replace("clean_text", pat, token).alias("clean_text"),
        )
    return out.select(
        "doc_id", "clean_text",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ip").cast("long").alias("n_ip"),
        F.col("n_phone").cast("long").alias("n_phone"),
    )


def word_ranks(docs: DataFrame, text_col: str = "text", n_ranges: int | None = None) -> DataFrame:
    """Global word-frequency ranking with a cumulative coverage share —
    the vocabulary-sizing table of a tokenizer-induction pipeline: the
    rank-R row's cum_share says what fraction of all token instances a
    top-R vocabulary covers (read the curve to pick a vocab size or
    an OOV budget).

    Scale shape — a global DENSE ranking without a single-partition
    window: the vocabulary-sized count table is range-partitioned on
    (cnt DESC, word ASC), each range computes row_number and a running
    sum LOCALLY (window partitioned by the range id, never by the whole
    table), and the per-range (row-count, sum) pairs — one row per
    partition, driver-sized by construction — become broadcast offsets
    added back to the local values. Range partition i holds keys that
    sort before partition i+1's, so prefix offsets are exact. Total
    token count is an integer sum (order-independent, oracle-exact).

    Returns (word, cnt, rank, cum_share) with cum_share rounded 6dp.
    """
    spark = docs.sparkSession
    counts = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    b = n_ranges or spark.sparkContext.defaultParallelism
    ranged = counts.repartitionByRange(b, F.desc("cnt"), F.asc("word")).persist()
    try:
        per_part = (
            ranged.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("cnt").alias("s"))
            .collect()
        )
        rows = sorted((r["pid"], r["n_rows"], r["s"]) for r in per_part)
        total = sum(r[2] for r in rows)
        off_r, off_s, offsets = 0, 0, []
        for pid, n_rows, s in rows:
            offsets.append((pid, off_r, off_s))
            off_r += n_rows
            off_s += s
        odf = spark.createDataFrame(
            offsets or [(0, 0, 0)], "pid int, off_r long, off_s long"
        )
        win = Window.partitionBy("pid").orderBy(F.desc("cnt"), F.asc("word"))
        out = (
            ranged.withColumn("pid", F.spark_partition_id())
            .withColumn("rn", F.row_number().over(win))
            .withColumn("csum", F.sum("cnt").over(win))
            .join(F.broadcast(odf), "pid")
            .select(
                "word",
                "cnt",
                (F.col("rn") + F.col("off_r")).alias("rank"),
                F.round(
                    (F.col("csum") + F.col("off_s")).cast("double")
                    / F.lit(float(total or 1)),
                    6,
                ).alias("cum_share"),
            )
        )
        # materialize before unpersisting the range layout the plan
        # depends on (callers hold an arbitrary lazy reference)
        from ..util import materialize

        return materialize(out)
    finally:
        ranged.unpersist()


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from the corpus (Sennrich
    et al., ACL'16) — tokenizer TRAINING as a distributed job, the
    step upstream of the BPE-ish tokenization in add_bpe_token_count.

    Classic word-frequency formulation: lowercase [a-z0-9]+ words are
    collapsed to a (word, freq) table once; each word becomes a
    space-separated character sequence with a trailing ``_``
    end-of-word symbol ("cat" -> "c a t _"); each round counts
    freq-weighted adjacent symbol pairs, merges the globally most
    frequent pair (ties: lexicographic min left, then right symbol),
    and rewrites the sequences. Returns one row per learned merge:
    (step, lhs, rhs, n) with n = the pair's frequency at merge time.

    Scale: every round after the first groupBy runs on the VOCABULARY
    table (distinct words), not the corpus — the 100-TB corpus is
    touched exactly once (tokenize + word count, one shuffle keyed by
    word with map-side partial aggregation); rounds are then
    vocab-sized explode+agg jobs whose cost is independent of corpus
    size. The merge rewrite is a single regexp_replace — greedy
    left-to-right non-overlapping, the reference BPE behavior; symbols
    stay in [a-z0-9_] so ``\\b`` anchors are engine-portable (Java
    regex and RE2 agree) and no quoting is ever needed.

    Determinism: pure integer counts + lexicographic tie-breaks; the
    DuckDB twin unrolls the same rounds and matches exactly.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seqs = words.select(
        F.concat(
            F.regexp_replace(F.col("word"), "(.)", "$1 "), F.lit("_")
        ).alias("seq"),
        "freq",
    ).localCheckpoint()

    merges = []
    for step in range(1, n_merges + 1):
        sy = F.split(F.col("seq"), " ")
        pairs = (
            seqs.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(sy, 1, F.size(sy) - 1).alias("l"),
                        F.slice(sy, 2, F.size(sy) - 1).alias("r"),
                    )
                ).alias("pr"),
            )
            .groupBy(
                F.col("pr.l").alias("lhs"), F.col("pr.r").alias("rhs")
            )
            .agg(F.sum("freq").alias("n"))
        )
        top = (
            pairs.orderBy(
                F.col("n").desc(), F.col("lhs").asc(), F.col("rhs").asc()
            )
            .limit(1)
            .collect()
        )
        if not top:
            raise ValueError(
                f"corpus exhausted after {step - 1} merges ({n_merges} requested)"
            )
        lhs, rhs, n = top[0]["lhs"], top[0]["rhs"], top[0]["n"]
        merges.append((step, lhs, rhs, n))
        seqs = seqs.select(
            F.regexp_replace(
                F.col("seq"), f"\\b{lhs} {rhs}\\b", lhs + rhs
            ).alias("seq"),
            "freq",
        ).localCheckpoint()

    import pandas as pd

    return docs.sparkSession.createDataFrame(
        pd.DataFrame(merges, columns=["step", "lhs", "rhs", "n"]),
        schema="step int, lhs string, rhs string, n bigint",
    )


def vocab_overlap(
    docs: DataFrame,
    by: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise vocabulary overlap between groups (crawl domains,
    source corpora): (grp_a, grp_b, n_a, n_b, n_inter, jaccard) for
    every unordered group pair sharing at least one token — the
    domain-similarity matrix a curation pipeline uses to spot
    near-duplicate sources and to weight mixture sampling.

    Scale shape: the corpus collapses to DISTINCT (group, token) rows
    first (one shuffle keyed by the pair, map-side partial), so the
    overlap self-join is over vocabulary rows, not occurrences; a
    token appearing in every group emits <= G^2/2 pairs — bounded by
    the GROUP count, never by corpus size or term frequency. Counts
    are exact integers; jaccard is one correctly-rounded division
    (6dp), so the DuckDB twin is bit-exact.
    """
    vocab = (
        docs.select(F.col(by).alias("grp"), F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )
    sizes = vocab.groupBy("grp").agg(F.count(F.lit(1)).alias("n_vocab"))
    a = vocab.select(F.col("grp").alias("grp_a"), "tok")
    b = vocab.select(F.col("grp").alias("grp_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("grp_a") < F.col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(F.broadcast(sizes.withColumnRenamed("grp", "grp_a").withColumnRenamed("n_vocab", "n_a")), "grp_a")
        .join(F.broadcast(sizes.withColumnRenamed("grp", "grp_b").withColumnRenamed("n_vocab", "n_b")), "grp_b")
        .select(
            "grp_a",
            "grp_b",
            "n_a",
            "n_b",
            "n_inter",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
    )
