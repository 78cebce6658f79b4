"""Round-11 optimization micro-profiler: time COMPONENTS of the most
expensive headline queries with the noop sink (guide §1.4) in one warm
session, so we see where inside each query the seconds go.

Usage: python tools/profile_r11.py [section ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn, n=2):
    best = None
    for _ in range(n):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{best:8.3f}s  {label}", flush=True)
    return best


def main() -> None:
    from rag_content_spark import queries as Q
    from rag_content_spark.operators import dedup
    from rag_content_spark.session import get_spark, warm_python_workers

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])

    spark = get_spark("profile-r11")
    warm_python_workers(spark)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    def want(s):
        return not only or s in only

    if want("neardup"):
        emb = Q._emb(spark, sf_dir)
        timed(spark, "emb: plain scan", lambda: noop(emb))
        n = emb.count()
        print(f"          emb rows: {n}")
        pairs = (
            emb.select(F.col("vec_id").alias("id_a"), F.col("label"))
            .join(
                emb.select(F.col("vec_id").alias("id_b"), F.col("label")),
                "label",
            )
            .filter(F.col("id_a") < F.col("id_b"))
        )
        print(f"          within-label pairs: {pairs.count()}")
        timed(
            spark,
            "neardup: full query",
            lambda: noop(Q.q_embedding_neardup(spark, sf_dir)),
        )
        # join without the dot
        a = emb.select(
            F.col("vec_id").alias("id_a"),
            F.col("label").alias("_la"),
            F.col("embedding").alias("_ea"),
        )
        b = emb.select(
            F.col("vec_id").alias("id_b"),
            F.col("label").alias("_lb"),
            F.col("embedding").alias("_eb"),
        )
        joined = a.join(
            b, (F.col("_la") == F.col("_lb")) & (F.col("id_a") < F.col("id_b"))
        )
        timed(spark, "neardup: join only (arrays carried)", lambda: noop(joined.select("id_a", "id_b")))
        timed(
            spark,
            "neardup: join + fold dot",
            lambda: noop(
                joined.select(
                    "id_a",
                    "id_b",
                    F.round(
                        F.aggregate(
                            F.zip_with(
                                "_ea",
                                "_eb",
                                lambda x, y: x.cast("double") * y.cast("double"),
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ),
                        6,
                    ).alias("cosine"),
                )
            ),
        )

    if want("minhash"):
        corpus = Q._dup_corpus(spark, sf_dir)
        corpus = corpus.localCheckpoint(eager=True)
        print(f"          dup_corpus rows: {corpus.count()}")
        toks = corpus.select(
            "doc_id",
            F.filter(F.split("text", r"\s+"), lambda t: t != "").alias("tk"),
        )
        timed(spark, "minhash: tokenize only", lambda: noop(toks))
        from rag_content_spark.functions.hashing import stable_hash64

        th = corpus.select(
            "doc_id",
            F.transform(
                F.filter(F.split("text", r"\s+"), lambda t: t != ""),
                lambda t: stable_hash64(t) % dedup.MINHASH_P,
            ).alias("th"),
        )
        timed(spark, "minhash: token hashes (md5/token)", lambda: noop(th))
        sh = corpus.select(
            "doc_id", dedup.hashed_shingles("text", n=3).alias("sh")
        )
        timed(spark, "minhash: hashed shingles", lambda: noop(sh))
        sig = corpus.select(
            "doc_id",
            dedup.minhash_signature(
                dedup.hashed_shingles("text", n=3), 16
            ).alias("sig"),
        )
        timed(spark, "minhash: + signature fold", lambda: noop(sig))
        band = dedup.minhash_band_table(corpus)
        timed(spark, "minhash: + band hashes (band table)", lambda: noop(band))
        cand = dedup.minhash_lsh_candidates(corpus, max_bucket_size=None)
        timed(spark, "minhash: candidates (bucket pairs)", lambda: noop(cand))
        timed(
            spark,
            "minhash: full query (cand + jaccard verify)",
            lambda: noop(Q.q_minhash_pairs(spark, sf_dir)),
        )

    if want("chunk"):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        from rag_content_spark.operators.chunking import chunk_fixed

        timed(spark, "chunk_fixed: full", lambda: noop(Q.QUERIES["chunk_fixed"](spark, sf_dir)))
        timed(spark, "chunk_sentences: full", lambda: noop(Q.QUERIES["chunk_sentences"](spark, sf_dir)))
        timed(spark, "simhash: full", lambda: noop(Q.QUERIES["simhash"](spark, sf_dir)))

    if want("hybridfts"):
        # where do hybrid_rrf_fts5's seconds go? (corpus tokenized 3x on
        # the kw side: postings / lengths / corpus_stats; vec side pays
        # 8 md5 per doc via mock_embedding_expr)
        from rag_content_spark.embedding.mock import mock_embedding_expr
        from rag_content_spark.functions.text import tokens
        from rag_content_spark.functions.vector import dot
        from rag_content_spark.operators import search as S

        docs = Q._docs(spark, sf_dir)
        n = docs.count()
        print(f"          docs rows: {n}")
        timed(spark, "hyb: plain docs scan", lambda: noop(docs))
        timed(spark, "hyb: tokens only", lambda: noop(
            docs.select("doc_id", tokens("text").alias("tk"))))
        timed(spark, "hyb: lengths (size(tokens))", lambda: noop(
            docs.select("doc_id", F.size(tokens("text")).alias("dl"))))
        timed(spark, "hyb: corpus_stats", lambda: noop(
            S.corpus_stats(docs)))
        timed(spark, "hyb: postings(filtered)", lambda: noop(
            S.postings(docs).filter(F.col("token").isin(Q._KW_TERMS))))
        timed(spark, "hyb: bm25_scores fts5", lambda: noop(
            S.bm25_scores(docs, Q._KW_TERMS, round_to=9, idf_variant="fts5")))
        emb = docs.withColumn("embedding", mock_embedding_expr("text", dim=8))
        timed(spark, "hyb: mock embed only", lambda: noop(
            emb.select("doc_id", "embedding")))
        qvec = [0.1] * 8
        qv = F.array(*[F.lit(float(x)) for x in qvec])
        timed(spark, "hyb: vec side (embed+dot)", lambda: noop(
            emb.select("doc_id", F.round(dot(F.col("embedding"), qv, 8), 9)
                       .alias("cos_score"))))
        timed(spark, "hyb: full hybrid_rrf_fts5", lambda: noop(
            Q.QUERIES["hybrid_rrf_fts5"](spark, sf_dir)))
        timed(spark, "hyb: full keyword_fts5", lambda: noop(
            Q.QUERIES["keyword_fts5"](spark, sf_dir)))
        timed(spark, "hyb: full hybrid_rrf (tfidf)", lambda: noop(
            Q.QUERIES["hybrid_rrf"](spark, sf_dir)))
        timed(spark, "hyb: full hybrid_search", lambda: noop(
            Q.QUERIES["hybrid_search"](spark, sf_dir)))
        timed(spark, "hyb: full bm25_search", lambda: noop(
            Q.QUERIES["bm25_search"](spark, sf_dir)))

    if want("tops"):
        for name in [
            "build_pipeline",
            "dedup_apply",
            "dedup_precollapse",
            "dedup_clusters",
            "dsir_weights",
            "dsir_select",
            "selection_pipeline",
            "pq_rerank",
            "maxsim_search",
            "retrieval_metrics",
            "hybrid_search",
            "pca_project",
            "doc_embedding_pool",
            "part_promotion",
            "equi_depth_hist",
            "chunk_semantic",
            "cdc_chunks",
            "pagerank",
            "curation_pipeline",
            "incremental_dedup",
            "dedup_recall",
            "containment_dedup",
            "hll_merge",
            "cms_merge",
            "hybrid_rrf_fts5",
        ]:
            fn = Q.QUERIES[name]
            timed(spark, f"full: {name}", lambda fn=fn: noop(fn(spark, sf_dir)))


if __name__ == "__main__":
    main()
