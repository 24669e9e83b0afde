"""Incremental corpus maintenance demo: build dedup + ANN indexes ONCE,
then gate every new ingest batch against them — no corpus self-join,
no re-clustering.

Simulates two ingest cycles over the documents/embeddings tables:

1. Bootstrap: index the initial corpus
   - exact_digest_index -> parquet (content md5 set)
   - minhash_band_index -> parquet (LSH band buckets; partition or
     bucket by (band, bucket) at scale so later joins co-locate)
   - ivf_build + ivf_save   -> parquet (ANN lists partitioned by
     list_id + centroid matrix)
2. Ingest a new batch:
   - dedup_exact_against      strips exact known content
   - dedup_against_index      strips near-dups of the indexed corpus
   - ivf_search               retrieval probe against the prebuilt index

At 100 TB the corpus side of every one of these steps is a parquet
scan of a prebuilt artifact — the expensive work (shingle+minhash the
corpus, cluster the embedding space) happened once at bootstrap.

Run:  python examples/incremental_corpus_demo.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from xgboost_spark.operators.dedup import (dedup_against_index,  # noqa: E402
                                           dedup_exact_against,
                                           exact_digest_index,
                                           minhash_band_index)
from xgboost_spark.operators.similarity import (ivf_build, ivf_load,  # noqa: E402
                                                ivf_save, ivf_search)
from xgboost_spark.session import get_session  # noqa: E402
from xgboost_spark.sources.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xgbspark_corpus_demo"
FAMILY = dict(n_hashes=16, bands=4, shingle_n=5)


def main():
    shutil.rmtree(WORK, ignore_errors=True)
    spark = get_session("incremental_corpus_demo")

    docs = load_table(spark, SF_DIR, "documents")
    emb = (load_table(spark, SF_DIR, "embeddings")
           .withColumn("embedding", F.col("embedding").cast("array<double>")))
    # split: 80% bootstrap corpus, 20% arrives later as the "new batch"
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    # ---- 1. bootstrap: build + persist the indexes ----------------------
    t0 = time.time()
    exact_digest_index(corpus, "text").write.parquet(f"{WORK}/digests")
    minhash_band_index(corpus, **FAMILY).write.parquet(f"{WORK}/lsh")
    assigned, cents = ivf_build(emb, n_centroids=16, iters=0, seed_by="id")
    ivf_save(assigned, cents, f"{WORK}/ivf")
    print(f"bootstrap: indexed {corpus.count()} docs + {emb.count()} "
          f"vectors in {time.time() - t0:.1f}s -> {WORK}")

    # ---- 2. ingest cycle: gate the new batch against the artifacts ------
    t0 = time.time()
    digests = spark.read.parquet(f"{WORK}/digests")
    lsh = spark.read.parquet(f"{WORK}/lsh")
    n0 = batch.count()
    survivors = dedup_exact_against(batch, digests, "text")
    n1 = survivors.count()
    survivors = dedup_against_index(survivors, lsh, **FAMILY)
    n2 = survivors.count()
    print(f"ingest gate: {n0} arriving -> {n1} after exact "
          f"-> {n2} after near-dup ({time.time() - t0:.1f}s)")

    # ---- 3. retrieval against the prebuilt ANN index --------------------
    t0 = time.time()
    la, lc = ivf_load(spark, f"{WORK}/ivf")
    queries = emb.filter(F.col("vec_id") < 5)
    top = ivf_search(la, lc, queries, k=3, n_probe=4)
    print(f"ivf_search over the persisted index ({time.time() - t0:.1f}s):")
    top.orderBy("query_id", "rank").show(15, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
