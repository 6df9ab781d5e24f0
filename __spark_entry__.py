"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship dedup pipeline on sf0.001 documents.
``queries()`` — one entry per operator family from SURVEY.md §2 plus the
training-pipeline extras; each callable (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
(similarity ops whose clustering needs connected components get rows-only
checks; they're marked below).

All computed columns are aliased identically on both sides; float outputs
are rounded to 6dp or dropped so the value-hash compare is stable.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

import liken_spark as lk  # noqa: E402
from liken_spark.constants import CANONICAL_ID, ROW_ID  # noqa: E402
from liken_spark.functions import text as T  # noqa: E402
from liken_spark.ids import with_row_id  # noqa: E402
from liken_spark.operators.ann import brute_force_topk, lsh_topk  # noqa: E402
from liken_spark.operators.textdedup import ngram_jaccard, substring  # noqa: E402
from liken_spark.shipping import ensure_on_workers  # noqa: E402


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_on_workers(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_on_workers(spark)
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _canon(df: DataFrame, deduper, columns="text", keep="first") -> DataFrame:
    out = lk.dedupe(df).apply({columns: deduper}).canonicalize(keep=keep, id="doc_id").collect()
    return out.select(F.col("doc_id"), F.col(CANONICAL_ID).cast("long").alias("canonical_id"))


def _pairs_to_doc_ids(df: DataFrame, pairs: DataFrame) -> DataFrame:
    """Map ROW_ID pairs back to doc ids (src = contained/first, dst = other)."""
    m = with_row_id(df).select(F.col(ROW_ID), F.col("doc_id"))
    return (
        pairs.join(m.withColumnRenamed("doc_id", "src_doc"), pairs.src == m[ROW_ID])
        .drop(ROW_ID)
        .join(
            m.withColumnRenamed("doc_id", "dst_doc").withColumnRenamed(ROW_ID, "rid2"),
            F.col("dst") == F.col("rid2"),
        )
        .select(F.col("src_doc").cast("long"), F.col("dst_doc").cast("long"))
    )


# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact + MinHash-LSH + substring dedup of sf0.001 documents."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    pipe = (
        lk.pipeline()
        .step(lk.col("text").exact())
        .step(lk.col("text").lsh(threshold=0.8, ngram=3, num_perm=128))
        .step(lk.col("text").substring(min_len=40))
    )
    out = lk.dedupe(docs).apply(pipe).canonicalize(id="doc_id").collect()
    return out.select("doc_id", F.col(CANONICAL_ID).cast("long").alias("canonical_id"))


# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- exact dedup family (bucket operator; SQL oracles) ---------------
    q["exact_dedup_text"] = lambda s, d: _canon(_docs(s, d), lk.exact())
    q["exact_dedup_keep_last"] = lambda s, d: _canon(_docs(s, d), lk.exact(), keep="last")
    q["exact_compound_lang_source"] = lambda s, d: _canon(
        _docs(s, d), lk.exact(), columns=("lang", "source")
    )

    def exact_drop(s, d):
        docs = _docs(s, d)
        return lk.dedupe(docs).apply({"text": lk.exact()}).drop_duplicates()

    q["exact_drop_duplicates"] = exact_drop

    # --- predicate dedupers (star clusters; SQL oracles) ------------------
    q["pred_contains_query"] = lambda s, d: _canon(
        _docs(s, d), lk.str_contains(pattern="query", case=True)
    )
    q["pred_str_len"] = lambda s, d: _canon(_docs(s, d), lk.str_len(min_len=100, max_len=300))
    q["pred_startswith"] = lambda s, d: _canon(_docs(s, d), lk.str_startswith(pattern="the ", case=False))
    q["pred_isin_lang"] = lambda s, d: _canon(_docs(s, d), lk.isin(["en", "de"]), columns="lang")

    # --- materializers ----------------------------------------------------
    def synthesize_exact(s, d):
        res = lk.dedupe(_docs(s, d)).apply({"text": lk.exact()}).canonicalize(id="doc_id")
        out = res.synthesize()
        return out.select(
            F.col(CANONICAL_ID).cast("long").alias("canonical_id"),
            F.col("doc_id").cast("long").alias("doc_id"),
            "text", "lang", "source",
            F.col("n_chars").cast("long").alias("n_chars"),
        )

    q["synthesize_exact"] = synthesize_exact

    def canonical_counts(s, d):
        res = lk.dedupe(_docs(s, d)).apply({"text": lk.exact()}).canonicalize(id="doc_id")
        from liken_spark.operators.executor import canonical_counts as cc

        return cc(res.collect(), 2).select(
            F.col(CANONICAL_ID).cast("long").alias("canonical_id"),
            F.col("count").cast("long").alias("count"),
        )

    q["canonical_counts"] = canonical_counts

    # --- suffix/substring pass (pairs; SQL oracle via contains join) ------
    def substring_pairs(s, d):
        docs = _docs(s, d)
        scope = with_row_id(docs)
        pairs = substring(min_len=50).gen_pairs(scope, "text", [])
        return _pairs_to_doc_ids(docs, pairs)

    q["substring_pairs"] = substring_pairs

    # --- text analysis (SQL oracles) ---------------------------------------
    q["token_counts"] = lambda s, d: _docs(s, d).select(
        "doc_id", T.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    q["text_quality"] = lambda s, d: _docs(s, d).select(
        "doc_id",
        F.round(
            F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
            / F.greatest(F.length("text"), F.lit(1)),
            6,
        ).alias("alpha_ratio"),
        F.round(
            F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", ""))
            / F.greatest(F.length("text"), F.lit(1)),
            6,
        ).alias("punct_ratio"),
    )

    def fingerprint_stats(s, d):
        docs = _docs(s, d)
        return docs.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct(T.fingerprint64(F.col("text"))).cast("long").alias("n_unique"),
        )

    q["fingerprint_stats"] = fingerprint_stats

    # --- similarity search (SQL oracle via list_cosine_similarity) --------
    q["ann_cosine_topk"] = lambda s, d: brute_force_topk(_emb(s, d), k=3).select(
        F.col("vec_id").cast("long"), F.col("neighbor_id").cast("long"), F.col("rank").cast("long")
    )

    # --- near-dup operators (clustering needs CC -> rows-only checks) -----
    q["minhash_lsh_dedup"] = lambda s, d: _canon(
        _docs(s, d), lk.lsh(threshold=0.7, ngram=3, num_perm=128)
    )
    q["simhash_dedup"] = lambda s, d: _canon(_docs(s, d), lk.simhash(hamming=3, bands=4))
    q["ngram_jaccard_dedup"] = lambda s, d: _canon(
        _docs(s, d), ngram_jaccard(threshold=0.55, ngram=5)
    )
    q["tfidf_dedup"] = lambda s, d: _canon(
        _docs(s, d), lk.tfidf(threshold=0.85, ngram=3, topn=3)
    )
    q["lang_id_pred"] = lambda s, d: _docs(s, d).select(
        "doc_id", T.lang_id(F.col("text")).alias("lang_pred")
    )
    q["ann_lsh_topk"] = lambda s, d: lsh_topk(_emb(s, d), k=3, n_planes=16, bands=4).select(
        F.col("vec_id").cast("long"), F.col("neighbor_id").cast("long"), F.col("rank").cast("long")
    )
    # fuzzy: exact rapidfuzz-ratio semantics within source blocks (20
    # blocks of ~25 docs — the documented O(n^2)-per-block scale contract)
    q["fuzzy_dedup"] = lambda s, d: _canon(
        _docs(s, d), lk.fuzzy(threshold=0.8, block_by="source")
    )
    # jaccard over compound categorical columns
    q["jaccard_dedup"] = lambda s, d: _canon(
        _docs(s, d), lk.jaccard(threshold=0.3), columns=("lang", "source")
    )

    # cosine over numeric compound columns (lineitem slice keeps the exact
    # O(n^2) block tractable)
    def cosine_dedup(s, d):
        ensure_on_workers(s)
        li = s.read.parquet(f"{d}/lineitem.parquet").where(F.col("l_orderkey") < 400)
        cols = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        out = lk.dedupe(li).apply({cols: lk.cosine(threshold=0.999999)}).canonicalize().collect()
        return out.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct(CANONICAL_ID).cast("long").alias("n_clusters"),
        )

    q["cosine_dedup_lineitem"] = cosine_dedup

    return q


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dedup_text": (
            "SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS canonical_id "
            "FROM documents"
        ),
        "exact_dedup_keep_last": (
            "SELECT doc_id, max(doc_id) OVER (PARTITION BY text) AS canonical_id "
            "FROM documents"
        ),
        "exact_compound_lang_source": (
            "SELECT doc_id, min(doc_id) OVER (PARTITION BY lang, source) AS canonical_id "
            "FROM documents"
        ),
        "exact_drop_duplicates": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents "
            "QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1"
        ),
        "pred_contains_query": (
            "SELECT doc_id, CASE WHEN contains(text, 'query') THEN "
            "  min(CASE WHEN contains(text, 'query') THEN doc_id END) OVER () "
            "ELSE doc_id END AS canonical_id FROM documents"
        ),
        "pred_str_len": (
            "SELECT doc_id, CASE WHEN text IS NOT NULL AND length(text) > 100 "
            "AND length(text) <= 300 THEN "
            "  min(CASE WHEN text IS NOT NULL AND length(text) > 100 AND length(text) <= 300 "
            "      THEN doc_id END) OVER () "
            "ELSE doc_id END AS canonical_id FROM documents"
        ),
        "pred_startswith": (
            "SELECT doc_id, CASE WHEN starts_with(lower(text), 'the ') THEN "
            "  min(CASE WHEN starts_with(lower(text), 'the ') THEN doc_id END) OVER () "
            "ELSE doc_id END AS canonical_id FROM documents"
        ),
        "pred_isin_lang": (
            "SELECT doc_id, CASE WHEN lang IN ('en', 'de') THEN "
            "  min(CASE WHEN lang IN ('en', 'de') THEN doc_id END) OVER () "
            "ELSE doc_id END AS canonical_id FROM documents"
        ),
        "synthesize_exact": (
            "SELECT canonical_id, arg_min(doc_id, doc_id) AS doc_id, "
            "arg_min(text, doc_id) AS text, arg_min(lang, doc_id) AS lang, "
            "arg_min(source, doc_id) AS source, arg_min(n_chars, doc_id) AS n_chars "
            "FROM (SELECT *, min(doc_id) OVER (PARTITION BY text) AS canonical_id "
            "      FROM documents) GROUP BY canonical_id ORDER BY canonical_id"
        ),
        "canonical_counts": (
            "SELECT canonical_id, count(*) AS count FROM "
            "(SELECT min(doc_id) OVER (PARTITION BY text) AS canonical_id FROM documents) "
            "GROUP BY canonical_id HAVING count(*) >= 2"
        ),
        "substring_pairs": (
            "SELECT a.doc_id AS src_doc, b.doc_id AS dst_doc FROM documents a "
            "JOIN documents b ON a.doc_id != b.doc_id "
            "AND length(a.text) >= 50 AND contains(b.text, a.text)"
        ),
        "token_counts": (
            "SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0 "
            "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens "
            "FROM documents"
        ),
        "text_quality": (
            "SELECT doc_id, "
            "round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 "
            "      / greatest(length(text), 1), 6) AS alpha_ratio, "
            "round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0 "
            "      / greatest(length(text), 1), 6) AS punct_ratio "
            "FROM documents"
        ),
        "fingerprint_stats": (
            "SELECT count(*) AS n_docs, "
            "count(DISTINCT trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS n_unique "
            "FROM documents"
        ),
        "ann_cosine_topk": (
            "SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, "
            "row_number() OVER (PARTITION BY a.vec_id ORDER BY "
            "  list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC, "
            "  b.vec_id ASC) AS rank "
            "FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id "
            "QUALIFY rank <= 3"
        ),
        # minhash_lsh_dedup / simhash_dedup / ngram_jaccard_dedup / tfidf_dedup /
        # lang_id_pred / ann_lsh_topk: non-SQL-expressible (signature clustering
        # needs connected components / python heuristics) -> rows-only checks.
    }
