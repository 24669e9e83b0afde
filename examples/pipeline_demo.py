"""End-to-end LLM training-data pipeline on the synthetic test tables:

    documents -> normalize -> quality/repetition/perplexity filter
    -> language gate -> exact + MinHash near-dedup -> benchmark
    decontamination -> per-source mixing -> PII redaction
    -> deterministic split -> token counting -> context-window chunking
    -> sequence packing -> sharded write
    plus a BPE tokenizer trained on the clean corpus, sketch-based
    corpus stats (HLL distinct, Bloom benchmark pre-screen), a
    PCA-reduce -> SemDeDup pass + distributed k-means clustering over
    the embeddings table, an exact AllPairs similarity-join audit of
    the MinHash pass, and a GBDT quality model trained on the
    extracted text signals.

Run:  python examples/pipeline_demo.py [sf_dir]      (default sf0.01)

Every step is a composition of the library operators — the same ones the
oracle harness checks — so this file doubles as living documentation of
how they chain.  At 100 TB the only changes are the input path and the
shard count.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from xgboost_spark.session import get_session  # noqa: E402
from xgboost_spark.config import TrainParams  # noqa: E402
from xgboost_spark.plans.booster import SparkBooster  # noqa: E402
from xgboost_spark.operators.dedup import (minhash_dedup,  # noqa: E402
                                           ngram_contamination)
from xgboost_spark.operators.sampling import (hash_split,  # noqa: E402
                                              pack_sequences, sample_by_rates,
                                              shuffle_shards)
from xgboost_spark.operators.textstats import (bigram_logprob_score,  # noqa: E402
                                               chunk_documents, language_id,
                                               normalize_text, redact_pii,
                                               repetition_stats, text_quality,
                                               token_count)


def main(sf_dir: str = "/root/testdata/sf0.01"):
    spark = get_session("pipeline-demo", cpus=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. normalize + per-doc quality/repetition/language signals
    d = normalize_text(docs, strip_punct=False)
    d = text_quality(d)
    d = language_id(d)
    rep = repetition_stats(d, "text", "doc_id", n=2)
    d = d.join(rep.withColumnRenamed("id", "doc_id"), "doc_id", "left")
    ppl = bigram_logprob_score(d, "text", "doc_id").select(
        F.col("id").alias("doc_id"), "ppl")
    d = d.join(ppl, "doc_id", "left")

    # 2. filter: quality floor, repetition ceiling, LM-perplexity band,
    #    language gate
    kept = d.filter((F.col("quality_score") >= 0.3)
                    & (F.coalesce(F.col("dup_gram_frac"), F.lit(0.0)) <= 0.9)
                    & F.col("ppl").between(5.0, 40.0)
                    & (F.col("lang_pred") != "unknown"))
    n_filtered = kept.count()

    # 3. near-dedup (exact dup groups collapse too; transitive chains
    #    resolve to one representative)
    deduped = minhash_dedup(kept, "text", "doc_id", shingle_n=3,
                            threshold=0.7, transitive=True)
    n_dedup = deduped.count()

    # 3b. span-level exact substring dedup (Lee et al. 2022): cut the
    #    boilerplate the doc-level pass can't see — later occurrences of
    #    any duplicated 20-char span are removed, first kept
    from xgboost_spark.operators.dedup import strip_duplicate_spans
    stripped = strip_duplicate_spans(deduped, "text", "doc_id", k=20)
    # checkpoint: every downstream stage re-reads the stripped text, so
    # cut the gram-window lineage once instead of replaying it per action
    deduped = (deduped.drop("text")
               .join(stripped.select(F.col("id").alias("doc_id"),
                                     F.col("text_stripped").alias("text"),
                                     "removed_chars"),
                     "doc_id")).localCheckpoint(eager=True)
    n_span_chars = int(deduped.agg(F.sum("removed_chars")).first()[0] or 0)
    deduped = deduped.drop("removed_chars")

    # 3c. full-recall audit of the probabilistic pass: the exact
    #    AllPairs similarity join (prefix filtering) finds EVERY pair
    #    still above the near-dup threshold — surviving pairs here mean
    #    the MinHash band settings let true near-dups through
    from xgboost_spark.operators.dedup import similarity_join
    n_resid_pairs = similarity_join(deduped, "text", "doc_id",
                                    threshold=0.7, shingle_n=5).count()

    # 4. decontaminate against a benchmark slice (here: sources src0/src1)
    bench = docs.filter(F.col("source").isin("src0", "src1"))
    cont = ngram_contamination(deduped, bench, n=3)
    dirty = cont.filter(F.col("contamination") > 0.8).select(
        F.col("id").alias("doc_id"))
    clean = deduped.join(dirty, "doc_id", "left_anti")
    n_clean = clean.count()

    # 4b. per-source mixing: premium sources kept whole, the rest thinned
    clean = sample_by_rates(clean, {"src0": 1.0, "src1": 1.0},
                            key_col="doc_id", strat_col="source",
                            default_rate=0.8)
    n_mixed = clean.count()

    # 5. PII scrub + token budget + splits
    clean = redact_pii(clean, text_col="text", out_col="text_clean")
    clean = token_count(clean, "text_clean", "n_tokens")
    clean = hash_split(clean, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})

    # 6. chunk long docs into 64-word context windows, pack the train
    #    split into 256-token sequences, shard for writers
    train = clean.filter(F.col("split") == "train")
    chunks = chunk_documents(train, "text_clean", "doc_id",
                             chunk_words=64, overlap=8)
    n_chunks = chunks.count()
    packed = pack_sequences(train, "doc_id", "n_tokens", budget=256)
    sharded = shuffle_shards(train, "doc_id", n_shards=4)
    n_seq = packed.agg(F.countDistinct("pack_id")).first()[0]

    # 6b. train a BPE tokenizer on the clean corpus (vocabulary-sized
    #     iteration — corpus-size independent after one shuffle) and
    #     count subword tokens per doc via the broadcast vocab map
    from xgboost_spark.operators.bpe import bpe_token_counts, bpe_train
    merges = bpe_train(train, "text_clean", n_merges=16)
    bpe_counts = bpe_token_counts(train, merges, "text_clean", "doc_id")
    avg_bpe = bpe_counts.agg(F.avg("n_tokens")).first()[0]

    # 6c. corpus stats via engine-replayable sketches: HLL distinct
    #     sources/words, Bloom pre-screen against the benchmark words
    from xgboost_spark.operators.cardsketch import (bloom_bits, bloom_probe,
                                                    hll_estimate)
    n_distinct_words = hll_estimate(
        train.select(F.explode(F.split(F.lower("text_clean"), r"\s+"))
                     .alias("w")), "w", p=12).first()["estimate"]
    bench_words = (bench.select(F.explode(F.split(F.lower("text"), r"\s+"))
                                .alias("word")).distinct())
    probe = bloom_probe(
        train.select(F.explode(F.split(F.lower("text_clean"), r"\s+"))
                     .alias("word")).distinct(),
        bloom_bits(bench_words, "word"), "word")
    n_flagged = probe.filter("maybe_present").count()

    # 6d. embedding side: PCA-reduce, then SemDeDup semantic dedup with
    #     bounded pairwise buckets
    from xgboost_spark.operators.linalg import pca_fit, pca_project
    from xgboost_spark.operators.similarity import semantic_dedup
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    comps, _ev, mean = pca_fit(emb, "embedding", k=16)
    reduced = pca_project(emb, comps, mean, "embedding")
    sem = semantic_dedup(reduced.select("vec_id", F.col("projected")
                                        .alias("embedding")),
                         n_clusters=16, threshold=0.95, max_pair_bucket=256)
    n_sem_kept = sem.filter("rep_id = id").count()

    # 6e. topic-style clustering of the reduced embeddings: distributed
    #     k-means (id-seeded init + 2 Lloyd steps, one partial-agg
    #     shuffle each) — per-cluster doc counts for corpus balancing
    from xgboost_spark.operators.similarity import ivf_build
    clustered, _cents = ivf_build(
        reduced.select("vec_id", F.col("projected").alias("embedding")),
        n_centroids=8, iters=2, seed_by="id")
    cluster_sizes = sorted(r["n"] for r in clustered.groupBy("list_id")
                           .agg(F.count("*").alias("n")).collect())

    # 7. train a quality model on the extracted signals
    fc = ["n_words", "avg_word_len", "punct_ratio", "stopword_ratio",
          "max_word_repeat_ratio"]
    model = SparkBooster(TrainParams(num_boost_round=10, max_depth=4,
                                     max_bin=32)).fit(
        d.fillna(0.0, fc), feature_cols=fc, label_col="quality_score")
    scored = model.transform(d.fillna(0.0, fc), feature_cols=fc)
    rmse = scored.agg(F.sqrt(F.avg(
        (F.col("prediction") - F.col("quality_score")) ** 2))).first()[0]

    print(f"docs={n0} -> filtered={n_filtered} -> deduped={n_dedup} "
          f"(-{n_span_chars} dup-span chars, {n_resid_pairs} residual "
          f"near-dup pairs by exact audit) "
          f"-> decontaminated={n_clean} -> mixed={n_mixed}; "
          f"{n_chunks} chunks; packed {n_seq} sequences; "
          f"shards={sharded.select('shard').distinct().count()}; "
          f"bpe merges={len(merges)} avg_tokens/doc={avg_bpe:.1f}; "
          f"~{n_distinct_words:.0f} distinct words (HLL), "
          f"{n_flagged} bloom-flagged; semdedup keepers={n_sem_kept}; "
          f"kmeans cluster sizes={cluster_sizes}; "
          f"quality-model rmse={rmse:.4f}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
