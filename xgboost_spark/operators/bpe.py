"""Byte-pair-encoding tokenizer training and encoding (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
public paper), Spark-first.

Scale design: BPE never iterates over the corpus.  One shuffle builds
the word VOCABULARY with counts (vocabulary size is language-bounded,
~10^5-10^6 rows, independent of corpus size); every merge iteration
then runs on the vocabulary only — one pair-count aggregation + one
driver collect of a single row per merge.  Encoding likewise tokenizes
the vocabulary once and broadcast-joins the corpus words against the
word -> tokens map, so a 100 TB corpus pays one scan + one broadcast
join regardless of merge count.

Determinism / oracle contract: a word's symbol sequence is represented
as a space-joined string of SENTINEL-WRAPPED symbols
("\\x01h\\x02 \\x01e\\x02 ..."), and a merge (a, b) is
``replace(seq, '\\x01a\\x02 \\x01b\\x02', '\\x01ab\\x02')``.  The
sentinels make symbol boundaries unambiguous — a bare separator scheme
would let the pattern match a SUFFIX of one symbol plus a PREFIX of
the next (e.g. symbols [xa, by] + merge (a, b) must NOT glue into
'xaby').  Non-overlapping left-to-right replace has identical
semantics in Spark (Java String.replace) and DuckDB, and equals the
classic greedy left-to-right BPE merge rule ("aaa" + (a,a) ->
[aa, a]), so training and encoding replay exactly in SQL.  Ties in
pair counts break by (count desc, pair string asc).  Words containing
the sentinel bytes themselves are excluded from the vocabulary (a
degenerate-input guard, mirrored in the SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# beyond this many merges the encode path switches from chained
# replace() expressions (SQL-replayable, but n nested expression nodes)
# to a mapInPandas loop over the vocabulary (flat analyzer cost)
EXPR_MERGE_MAX = 32

# symbol wrappers: \x01 opens, \x02 closes (unambiguous boundaries)
S1, S2 = "\x01", "\x02"


def _wrap(sym: str) -> str:
    return S1 + sym + S2


def _merge_pattern(a: str, b: str) -> tuple[str, str]:
    """(search, replacement) for applying merge (a, b) to a sequence."""
    return _wrap(a) + " " + _wrap(b), _wrap(a + b)


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): lowercase whitespace words with corpus counts —
    the one corpus-sized shuffle in the whole BPE pipeline.  Words
    containing the sentinel bytes are excluded (degenerate input)."""
    from xgboost_spark.operators.util import ensure_parallelism
    # repartition the (cheap) document rows BEFORE the explode: placed
    # after, the Exchange would both serialize the split+explode onto
    # the scan's partitions and shuffle the corpus-sized word rows
    words = ensure_parallelism(df.select(F.col(text_col))).select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"))
    return (words.filter((F.length("word") > 0)
                         & ~F.col("word").contains(S1)
                         & ~F.col("word").contains(S2))
            .groupBy("word").agg(F.count("*").alias("cnt")))


def _to_symbols(word_col):
    """word -> space-joined wrapped symbols ('he' -> '\\x01h\\x02 \\x01e\\x02')."""
    return F.trim(F.regexp_replace(word_col, "(.)", S1 + "$1" + S2 + " "))


def _pairs_expr(seq_col):
    """wrapped sequence -> array of adjacent 'WRAP(a) WRAP(b)' pairs."""
    syms = F.split(seq_col, " ")
    n = F.size(syms)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)) \
           .otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat(
        F.element_at(syms, i), F.lit(" "), F.element_at(syms, i + 1)))


def bpe_train(df: DataFrame, text_col: str = "text",
              n_merges: int = 8) -> list[tuple[str, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns [(a, b, merged, count)] in merge order.  Each iteration: explode
    adjacent symbol pairs of the (persisted, vocabulary-sized) vocab,
    weight by word count, take the global argmax pair (count desc, pair
    asc — a TakeOrdered, no full sort), and apply the merge to the
    vocab with one replace() projection.  localCheckpoint every few
    rounds keeps the plan flat.
    """
    vocab = word_vocab(df, text_col).withColumn(
        "seq", _to_symbols(F.col("word"))).select("seq", "cnt")
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str, str, int]] = []
    for it in range(n_merges):
        top = (vocab.select(F.explode(_pairs_expr(F.col("seq"))).alias("pair"),
                            F.col("cnt"))
               .groupBy("pair").agg(F.sum("cnt").alias("n"))
               .orderBy(F.col("n").desc(), F.col("pair").asc())
               .limit(1).first())
        if top is None or top["n"] is None:
            break
        wa, wb = top["pair"].split(" ")
        a, bsym = wa.strip(S1 + S2), wb.strip(S1 + S2)
        merged = a + bsym
        merges.append((a, bsym, merged, int(top["n"])))
        pat, rep = _merge_pattern(a, bsym)
        vocab = vocab.select(
            F.replace(F.col("seq"), F.lit(pat), F.lit(rep)).alias("seq"),
            "cnt")
        if (it + 1) % 8 == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def bpe_encode_vocab(vocab: DataFrame, merges: list[tuple]) -> DataFrame:
    """(word, cnt) -> (word, cnt, tokens array<string>, n_tokens):
    apply the merge list to each vocabulary word.

    Up to EXPR_MERGE_MAX merges: chained replace() expressions
    (SQL-replayable).  Past it: one mapInPandas over the vocabulary —
    a Python loop over merges per word, the same cost structure real
    tokenizer trainers use, with flat analyzer cost at 10^4+ merges.
    """
    if len(merges) <= EXPR_MERGE_MAX:
        seq = _to_symbols(F.col("word"))
        for a, bsym, _merged, *_ in merges:
            pat, rep = _merge_pattern(a, bsym)
            seq = F.replace(seq, F.lit(pat), F.lit(rep))
        toks = F.split(F.translate(seq, S1 + S2, ""), " ")
        return vocab.select("word", "cnt", toks.alias("tokens"),
                            F.size(toks).alias("n_tokens"))

    import pandas as pd
    from pyspark.sql import types as T
    reps = [_merge_pattern(a, bsym) for a, bsym, *_ in merges]
    schema = T.StructType(list(vocab.schema.fields)
                          + [T.StructField("tokens", T.ArrayType(T.StringType())),
                             T.StructField("n_tokens", T.IntegerType())])

    def enc(batches):
        for pdf in batches:
            toks, sizes = [], []
            for w in pdf["word"]:
                seq = " ".join(_wrap(c) for c in w)
                for pat, rep in reps:
                    seq = seq.replace(pat, rep)
                t = seq.replace(S1, "").replace(S2, "").split(" ")
                toks.append(t)
                sizes.append(len(t))
            yield pdf.assign(tokens=pd.Series(toks, index=pdf.index),
                             n_tokens=pd.Series(sizes, index=pdf.index,
                                                dtype="int32"))

    return vocab.mapInPandas(enc, schema)


def bpe_token_counts(df: DataFrame, merges: list[tuple],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document BPE token counts: (id, n_words, n_tokens).

    The corpus is scanned once; each word row joins the broadcast
    word -> n_tokens map (vocabulary-sized), so the merge count never
    touches corpus-side work.
    """
    from xgboost_spark.operators.util import ensure_parallelism
    # parallelize the document rows, then explode (see bpe_word_counts)
    words = (ensure_parallelism(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t")))
        .select("id",
                F.explode(F.split(F.lower(F.col("_t")), r"\s+")).alias("word"))
        .filter((F.length("word") > 0)
                & ~F.col("word").contains(S1)
                & ~F.col("word").contains(S2)))
    vocab = words.groupBy("word").agg(F.count("*").alias("cnt"))
    enc = bpe_encode_vocab(vocab, merges).select("word", "n_tokens")
    return (words.join(F.broadcast(enc), "word")
            .groupBy("id")
            .agg(F.count("*").alias("n_words"),
                 F.sum("n_tokens").alias("n_tokens")))
