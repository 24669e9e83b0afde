"""Text analysis operators for training-data pipelines.

All pure column expressions (whole-stage codegen, no UDFs): language ID
(stopword-hit heuristic), quality scoring (length/punct/stopword/
repetition ratios), token counting (whitespace + BPE-ish regex), and
document fingerprinting (min-hash of character n-grams — a rolling-hash
analog built from md5 so the DuckDB oracle can replay it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# tiny built-in stopword lists; enough for a deterministic n-gram
# heuristic (real deployments plug in fasttext via mapInPandas)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "une", "dans", "que"],
    "es": ["el", "la", "que", "de", "los", "se", "las", "por", "un", "para"],
}


def _count_token(text_col, token: str):
    """Occurrences of a word token via padded replace — exact string ops
    only (replayable in any SQL engine)."""
    padded = F.concat(F.lit(" "), F.lower(text_col), F.lit(" "))
    needle = f" {token} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def normalize_text(df: DataFrame, text_col: str = "text",
                   out_col: str = "text_norm",
                   lowercase: bool = True,
                   collapse_whitespace: bool = True,
                   strip_punct: bool = False) -> DataFrame:
    """Canonical text normalization for dedup/fingerprint pipelines:
    lowercase, collapse whitespace runs to single spaces and trim,
    optionally strip ASCII punctuation.  Pure regexp expressions —
    fuses into the scan, replayable in any engine."""
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    if strip_punct:
        c = F.regexp_replace(c, r"[!-/:-@\[-`{-~]", "")
    if collapse_whitespace:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out_col, c)


def token_count(df: DataFrame, text_col: str = "text", out_col: str = "n_tokens") -> DataFrame:
    """Whitespace token count: len - len(without spaces) + 1."""
    t = F.col(text_col)
    n = F.when(F.length(F.trim(t)) == 0, 0).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    )
    return df.withColumn(out_col, n.cast("int"))


def bpe_ish_token_count(df: DataFrame, text_col: str = "text",
                        out_col: str = "n_bpe_tokens") -> DataFrame:
    """BPE-ish proxy: word-boundary pieces plus punctuation singles
    (regex split), ~ what a byte-pair tokenizer's piece count tracks."""
    pieces = F.split(F.col(text_col), r"\s+|(?=[.,!?;:])")
    n = F.size(F.filter(pieces, lambda p: F.length(p) > 0))
    return df.withColumn(out_col, n)


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-signal columns (heuristics in the Gopher/C4 style):
    n_chars, n_words, avg_word_len, punct_ratio, digit_ratio,
    stopword_ratio, max_word_repeat_ratio, quality_score in [0,1].
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = F.when(F.length(F.trim(t)) == 0, 0).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    )
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[.,!?;:]", ""))
    digits = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    stop_hits = sum((_count_token(t, s) for s in STOPWORDS["en"]), F.lit(0))
    words = F.split(F.lower(t), r"\s+")
    top_word_cnt = F.array_max(F.transform(
        F.array_distinct(words),
        lambda wd: F.size(F.filter(words, lambda x: x == wd)),
    ))
    d = (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_words", n_words.cast("int"))
        .withColumn("avg_word_len", (n_chars - (n_words - 1)) / n_words)
        .withColumn("punct_ratio", punct / F.greatest(n_chars, F.lit(1)))
        .withColumn("digit_ratio", digits / F.greatest(n_chars, F.lit(1)))
        .withColumn("stopword_ratio", stop_hits / F.greatest(n_words, F.lit(1)))
        .withColumn("max_word_repeat_ratio", top_word_cnt / F.greatest(n_words, F.lit(1)))
    )
    score = (
        F.when(F.col("n_words") >= 10, F.lit(0.25)).otherwise(F.col("n_words") / 40.0)
        + F.least(F.col("stopword_ratio") * 2.5, F.lit(0.25))
        + F.when(F.col("avg_word_len").between(3, 10), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(F.col("max_word_repeat_ratio") <= 0.2, F.lit(0.25))
          .otherwise(F.greatest(F.lit(0.0), F.lit(0.25) - (F.col("max_word_repeat_ratio") - 0.2)))
    )
    return d.withColumn("quality_score", F.round(score, 6))


PII_PATTERNS = {
    # deliberately simple, deterministic regexes (fancy validators differ
    # across engines; these replay identically in any POSIX-regex SQL)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "text_redacted",
               patterns: dict[str, str] | None = None) -> DataFrame:
    """Scrub common PII shapes from a text column, appending the
    redacted text plus one ``n_<kind>`` count column per pattern.
    Pure ``regexp_replace`` / ``regexp_count`` expressions — fuses into
    the scan, no UDFs, replayable in any SQL engine."""
    pats = patterns or PII_PATTERNS
    c = F.col(text_col)
    out = df
    red = c
    for kind, pat in pats.items():
        out = out.withColumn(f"n_{kind}", F.regexp_count(c, F.lit(pat)))
        red = F.regexp_replace(red, pat, f"[{kind.upper()}]")
    return out.withColumn(out_col, red)


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """Gopher-style within-document repetition signals over word
    ``n``-grams (Rae et al. 2021 §A1.1 "repetition" filters):

    - ``n_grams``        total n-gram positions in the doc
    - ``top_gram_frac``  occurrences of the MOST frequent n-gram / total
    - ``dup_gram_frac``  fraction of positions whose n-gram occurs >1×

    Docs with fewer than ``n`` words produce no n-grams and are omitted
    (a 3-word doc can't repeat a 5-gram).

    Scale: explode → two key-prefixed aggregations.  The heavy shuffle
    is groupBy(id, gram) — partial (map-side) aggregation collapses the
    per-doc duplicates before the exchange, and the second groupBy(id)
    reuses the same key prefix so AQE coalesces it cheaply.  No per-row
    O(len²) array scans, so pathological long documents stay linear.
    """
    d = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    words = F.split(F.col("t"), r"\s+")
    # sequence(1, 0) steps backward to [1, 0]: short docs need the guard
    idxs = F.when(F.size(words) >= n,
                  F.sequence(F.lit(1), F.size(words) - (n - 1))
                  ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idxs, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    per_gram = (d.select("id", F.explode(grams).alias("gram"))
                .groupBy("id", "gram").agg(F.count("*").alias("cnt")))
    return (per_gram.groupBy("id").agg(
        F.sum("cnt").alias("n_grams"),
        F.max("cnt").alias("_top"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias("_dup"))
        .withColumn("top_gram_frac", F.col("_top") / F.col("n_grams"))
        .withColumn("dup_gram_frac", F.col("_dup") / F.col("n_grams"))
        .select("id", "n_grams", "top_gram_frac", "dup_gram_frac"))


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-vote language ID: count hits from each language's list;
    argmax with deterministic tie-break (language order)."""
    t = F.col(text_col)
    n_words = F.greatest(
        F.when(F.length(F.trim(t)) == 0, 0).otherwise(
            F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
        ),
        F.lit(1),
    )
    scores = {}
    for lang, words in STOPWORDS.items():
        scores[lang] = sum((_count_token(t, w) for w in words), F.lit(0))
    best_lang = F.lit("unknown")
    best_score = F.lit(0)
    for lang in STOPWORDS:
        cond = scores[lang] > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    d = df.withColumn("lang_score", best_score / n_words)
    return d.withColumn(out_col, best_lang)


def char_ngram_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                           n: int = 8, n_mins: int = 4) -> DataFrame:
    """Document fingerprint: the ``n_mins`` smallest md5 digests over the
    document's character n-grams (winnowing-style content signature —
    robust to small edits, joinable for near-dup detection).
    Returns (id, fingerprint array<string>).
    """
    t = F.col(text_col)
    idxs = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    grams = F.transform(idxs, lambda i: F.md5(t.substr(i, F.lit(n))))
    return df.select(
        F.col(id_col).alias("id"),
        F.slice(F.array_sort(F.array_distinct(grams)), 1, n_mins).alias("fingerprint"),
    )


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_words: int = 64,
                    overlap: int = 16) -> DataFrame:
    """Split documents into overlapping word-window chunks — the standard
    pre-tokenization step for LLM training / embedding pipelines (context
    windows with stride = chunk_words - overlap).

    Pure column expressions: split + sequence + slice + array_join, so
    the whole thing stays in whole-stage codegen and fuses into the scan
    (no shuffle at all — chunking is embarrassingly row-parallel, and the
    output explodes rows by ~n_words/stride, which Spark handles by
    splitting input partitions, not by shuffling).

    Returns (id, chunk_id, chunk_text, chunk_n_words).  Every word
    appears in at least one chunk; the final chunk may be shorter.
    """
    if not 0 <= overlap < chunk_words:
        raise ValueError("need 0 <= overlap < chunk_words")
    step = chunk_words - overlap
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    # number of stride positions whose chunk adds at least one new word:
    # 1 + ceil(max(0, n - chunk_words) / step)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - chunk_words, F.lit(0)) / F.lit(step)).cast("int")
    d = (df.withColumn("_words", words)
           .withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))))
    chunk = F.slice(F.col("_words"), F.col("chunk_id") * step + 1, chunk_words)
    return d.select(
        F.col(id_col).alias("id"),
        F.col("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("chunk_n_words"),
    )


def tfidf_top_terms(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document (smoothed sklearn-style idf:
    ln((1+N)/(1+df)) + 1).

    Plan: explode lowercased whitespace tokens -> two hash aggregations
    (term frequency per (doc, term); document frequency per term, both
    with map-side partial aggregation) -> shuffle equi-join on term ->
    per-doc window top-k (WindowGroupLimit pushes the rank filter before
    the sort materializes).  No driver collection; the doc-frequency side
    is vocabulary-sized, not corpus-sized, and the join key (term) is the
    same key docfreq was grouped by, so AQE can reuse the exchange.

    Determinism for cross-engine hash-matching: idf is rounded to 9 dp
    BEFORE the tf multiply, making the score an exact IEEE product of
    identical doubles in any engine; ties broken by term asc.

    Returns (id, term, tf, df, score, rank).
    """
    toks = F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
    t = (df.select(F.col(id_col).alias("id"), toks.alias("term"))
           .filter(F.length("term") > 0))
    tf = t.groupBy("id", "term").agg(F.count("*").alias("tf"))
    n_docs = df.select(F.countDistinct(id_col)).first()[0]
    dfreq = t.groupBy("term").agg(F.countDistinct("id").alias("df"))
    idf = F.round(F.log((F.lit(1.0) + n_docs) / (F.lit(1.0) + F.col("df"))) + 1.0, 9)
    scored = (tf.join(dfreq, "term")
                .withColumn("score", F.col("tf") * idf))
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("id", "term", "tf", "df", "score", "rank"))


def bigram_logprob_score(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         alpha: float = 1.0) -> DataFrame:
    """Character-bigram language-model quality score (CCNet-style
    perplexity filtering, here with a char-bigram LM trained on the
    corpus itself): per-doc average negative log-probability and
    perplexity under an add-alpha-smoothed conditional model
    p(c2|c1) = (count(c1c2) + alpha) / (count(c1*) + alpha*V).

    Plan: one pass explodes lowercased character bigrams (pure
    transform/sequence expressions); the model is two hash aggregations
    whose output is CHARACTER-VOCABULARY sized (bigram types, not
    corpus-sized), so it broadcasts back onto the exploded stream for
    the scoring join — corpus never reshuffles on a data-sized key.

    Returns (id, n_bigrams, avg_nll, ppl), rounded upstream by callers.
    """
    t = F.lower(F.col(text_col))
    grams = F.expr(
        f"transform(sequence(1, length(lower({text_col})) - 1), "
        f"i -> substring(lower({text_col}), i, 2))")
    g = (df.filter(F.length(t) >= 2)
           .select(F.col(id_col).alias("id"), F.explode(grams).alias("bg")))
    bg_counts = g.groupBy("bg").agg(F.count("*").alias("c2"))
    pre_counts = (g.select(F.substring("bg", 1, 1).alias("c1"))
                    .groupBy("c1").agg(F.count("*").alias("c1n")))
    vocab = g.select(F.substring("bg", 2, 1).alias("ch")).distinct().count()
    model = (bg_counts.withColumn("c1", F.substring("bg", 1, 1))
             .join(F.broadcast(pre_counts), "c1")
             .withColumn("logp", F.log(
                 (F.col("c2") + F.lit(float(alpha)))
                 / (F.col("c1n") + F.lit(float(alpha) * vocab))))
             .select("bg", "logp"))
    scored = (g.join(F.broadcast(model), "bg")
                .groupBy("id")
                .agg(F.count("*").alias("n_bigrams"),
                     (-F.avg("logp")).alias("avg_nll")))
    return scored.withColumn("ppl", F.exp(F.col("avg_nll")))


GOPHER_EN_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(df: DataFrame, text_col: str = "text",
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_hash_ratio: float = 0.1,
                 max_ellipsis_ratio: float = 0.1,
                 min_alpha_frac: float = 0.8,
                 min_stop_hits: int = 2) -> DataFrame:
    """Gopher-style hard quality gate (Rae et al. 2021, "Scaling
    Language Models", table A1 repetition/quality filters — public
    paper): per-document boolean rule columns + an overall ``keep``
    flag.  Distinct from `text_quality` (a soft score): these are the
    published REJECTION thresholds a pretraining pipeline applies
    verbatim.

    Pure column expressions (no UDFs, replayable in SQL): word count
    bounds, mean word length band, '#' and '...' symbol-to-word ratios,
    fraction of words containing an alphabetic character, and presence
    of >= ``min_stop_hits`` distinct common English stopwords.
    """
    t = F.col(text_col)
    words = F.split(F.trim(F.lower(t)), r"\s+")
    n_words = F.size(words)
    total_chars = F.aggregate(words, F.lit(0),
                              lambda acc, w: acc + F.length(w))
    mean_wl = total_chars.cast("double") / F.greatest(n_words, F.lit(1))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellip = ((F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit(""))))
               / F.lit(3)).cast("int")
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    stop_hits = sum(
        (F.when(padded.contains(f" {s} "), 1).otherwise(0)
         for s in GOPHER_EN_STOPS), F.lit(0))
    d = (df.withColumn("n_words", n_words.cast("bigint"))
           .withColumn("mean_word_len", mean_wl)
           .withColumn("r_word_count",
                       (n_words >= min_words) & (n_words <= max_words))
           .withColumn("r_mean_word_len",
                       (mean_wl >= min_mean_word_len)
                       & (mean_wl <= max_mean_word_len))
           .withColumn("r_hash_ratio",
                       n_hash <= max_hash_ratio * n_words)
           .withColumn("r_ellipsis_ratio",
                       n_ellip <= max_ellipsis_ratio * n_words)
           .withColumn("r_alpha_words",
                       n_alpha >= min_alpha_frac * n_words)
           .withColumn("r_stop_hits", stop_hits >= min_stop_hits))
    keep = (F.col("r_word_count") & F.col("r_mean_word_len")
            & F.col("r_hash_ratio") & F.col("r_ellipsis_ratio")
            & F.col("r_alpha_words") & F.col("r_stop_hits"))
    return d.withColumn("keep", keep)
