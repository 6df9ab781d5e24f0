"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship dedup pipeline on sf0.001 documents.
``queries()`` — one entry per operator family from SURVEY.md §2 plus the
training-pipeline extras; each callable (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL for EVERY query. Similarity ops
whose clustering needs connected components get exact oracles via a
recursive-CTE min-label propagation (the SQL rendition of union-find).
The hash-seeded ops (MinHash-LSH, SimHash, sign-LSH ANN, rapidfuzz DP)
export their engine-computed signatures/scores as parquet sidecars; their
oracles re-derive candidates + verification + ranking + clustering from
the sidecar independently in DuckDB (the kernels themselves are pinned by
golden vectors in the pytest suite).

All computed columns are aliased identically on both sides; float outputs
are rounded to 6dp or dropped so the value-hash compare is stable. Where a
threshold sits on a float continuum (cosine over lineitem) it was chosen
in a measured gap of the similarity distribution (>1e-6 clearance at both
sf0.001 and sf0.01) so cross-engine float noise cannot flip a pair.
"""

from __future__ import annotations

import getpass
import hashlib
import os
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


def _canon_pipe(df: DataFrame, pipe, keep="first") -> DataFrame:
    out = lk.dedupe(df).apply(pipe).canonicalize(keep=keep, id="doc_id").collect()
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


# Sidecar exports: the hash-seeded ops (SHA1 MinHash, blake2b SimHash,
# random-plane sign-LSH, rapidfuzz DP) have signature kernels that are not
# SQL-expressible — but everything DOWNSTREAM of the kernel (band-collision
# candidate generation, hamming verification, rerank ranking, thresholding,
# connected-components clustering, canonicalization) IS. Each such query
# writes the engine-computed signatures/scores to a parquet sidecar; its
# oracle reads the sidecar with read_parquet and re-derives the final
# result independently in DuckDB. The kernels themselves are pinned by the
# golden-vector suites (tests/test_golden_dedupers.py).
# Namespaced per user + checkout (hash of this file's path) so concurrent
# harness runs from different checkouts or users on a shared host cannot
# clobber each other's sidecars and silently validate against foreign
# signatures. Deliberately NOT pid-scoped: the Spark query and the DuckDB
# oracle may run in different processes, and the path must agree between
# them. Two concurrent runs of the SAME checkout by the same user should
# set LIKEN_SPARK_SIDECAR_DIR to distinct scratch dirs.
try:
    # containers without a passwd entry / LOGNAME raise from getuser()
    _USER = getpass.getuser()
except (KeyError, OSError):
    _USER = str(os.getuid()) if hasattr(os, "getuid") else "u"
_SIDECAR = os.environ.get(
    "LIKEN_SPARK_SIDECAR_DIR",
    "/tmp/liken_spark_oracle_sidecar_%s_%s"
    % (
        _USER,
        hashlib.sha1(str(Path(__file__).resolve()).encode()).hexdigest()[:10],
    ),
)


def _export(df: DataFrame, name: str) -> None:
    df.coalesce(4).write.mode("overwrite").parquet(f"{_SIDECAR}/{name}.parquet")


def _sidecar_sql(name: str) -> str:
    return f"read_parquet('{_SIDECAR}/{name}.parquet/*.parquet')"


# custom deduper: link rows sharing their first-12-char prefix (values are
# placeholder'd single-column strings in ROW_ID order; star pairs to the
# first occurrence, reference custom.py:27-67 contract).
@lk.custom.register
def prefix_link(values, n=12):
    seen: dict[str, int] = {}
    for i, v in enumerate(values):
        k = (v or "")[:n]
        if k in seen:
            yield (seen[k], i)
        else:
            seen[k] = i


# cosine threshold for the lineitem query: midpoint of a measured ~1e-4
# gap in the intra-order pairwise-cosine distribution at BOTH sf0.001 and
# sf0.01, so numpy-vs-DuckDB float noise (~1e-14) cannot flip any pair.
COSINE_T = 0.999052347059740

# embedding near-dup threshold: midpoint of a measured 3.5e-3 gap in the
# all-pairs cosine distribution of the embeddings table at both sfs (the
# synthetic embeddings carry no high-similarity dups; the clustering is
# exercised at the similarity level the data actually has).
EMB_T = 0.420972292386

# SQL-embedded twins of the engine's preprocessor regexes (identical
# pattern text; apostrophes doubled for SQL string literals)

def _stopword_pattern() -> str:
    import re as _re

    from liken_spark.preprocess import NLTK_ENGLISH_STOPWORDS

    pat = r"\b(" + "|".join(_re.escape(w) for w in NLTK_ENGLISH_STOPWORDS) + r")\b"
    return pat.replace("'", "''")


_STOPWORD_PATTERN = _stopword_pattern()

_LANGS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as", "his", "her"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auf", "ich", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "un", "des", "dans", "que", "pour", "pas", "vous"),
    "es": ("el", "la", "los", "las", "y", "es", "una", "un", "en", "que", "por", "para", "con", "del"),
    "it": ("il", "la", "gli", "e", "è", "una", "un", "che", "di", "per", "non", "con", "del"),
}


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
    q["pred_endswith"] = lambda s, d: _canon(_docs(s, d), lk.str_endswith(pattern=".", case=True))
    q["pred_isin_lang"] = lambda s, d: _canon(_docs(s, d), lk.isin(["en", "de"]), columns="lang")

    # isna / ~isna over a derived nullable column (testdata carries no
    # nulls; the derivation is replicated verbatim in the oracle)
    def _with_maybe(s, d):
        return _docs(s, d).withColumn(
            "maybe", F.when(F.col("n_chars") > 250, F.col("source"))
        )

    q["pred_isna_derived"] = lambda s, d: _canon(_with_maybe(s, d), lk.isna(), columns="maybe")
    q["pred_notna_derived"] = lambda s, d: _canon(_with_maybe(s, d), ~lk.isna(), columns="maybe")

    # --- custom deduper (@register; SQL oracle: prefix bucketing) ----------
    q["custom_prefix12"] = lambda s, d: _canon(_docs(s, d), prefix_link(n=12))

    # --- preprocessors (lower + alnum before exact; SQL oracle) -----------
    def prep_exact(s, d):
        pipe = lk.pipeline().step(
            lk.col("text", preprocessors=[lk.preprocessors.lower(), lk.preprocessors.alnum()]).exact()
        )
        return _canon_pipe(_docs(s, d), pipe)

    q["prep_exact_lower_alnum"] = prep_exact

    # strip + remove_punctuation + lower over a derived messy column (the
    # raw text has no edge whitespace/punctuation, so the derivation makes
    # the transforms load-bearing; the oracle replicates it verbatim)
    def prep_strip_punct(s, d):
        messy = _docs(s, d).withColumn(
            "messy", F.concat(F.lit("  "), F.col("text"), F.lit(" !! "))
        )
        pipe = lk.pipeline().step(
            lk.col(
                "messy",
                preprocessors=[
                    lk.preprocessors.strip(),
                    lk.preprocessors.remove_punctuation(),
                    lk.preprocessors.lower(),
                ],
            ).exact()
        )
        return _canon_pipe(messy, pipe)

    q["prep_exact_strip_punct"] = prep_strip_punct

    # lower + remove_stopwords (word-boundary regex removal of the vendored
    # NLTK list — the oracle runs the identical pattern in DuckDB)
    def prep_stopwords(s, d):
        pipe = lk.pipeline().step(
            lk.col(
                "text",
                preprocessors=[lk.preprocessors.lower(), lk.preprocessors.remove_stopwords()],
            ).exact()
        )
        return _canon_pipe(_docs(s, d), pipe)

    q["prep_exact_stopwords"] = prep_stopwords

    # --- AND step: co-cluster iff every deduper agrees ---------------------
    def and_step(s, d):
        pipe = lk.pipeline().step([lk.col("lang").exact(), lk.col("source").exact()])
        return _canon_pipe(_docs(s, d), pipe)

    q["and_step_lang_source"] = and_step

    # --- predicated step: predicate scopes the subset, last deduper decides
    def predicated_step(s, d):
        pipe = lk.pipeline().step(
            [lk.col("text").str_contains(pattern="the", case=True), lk.col("lang").exact()]
        )
        return _canon_pipe(_docs(s, d), pipe)

    q["predicated_step_contains_exact"] = predicated_step

    # --- sequential chaining: canonical values propagate across steps ------
    def chain(s, d):
        pipe = lk.pipeline().step(lk.col("lang").exact()).step(lk.col("source").exact())
        return _canon_pipe(_docs(s, d), pipe)

    q["chain_lang_then_source"] = chain

    # --- full pipeline surface: pipeline-level preprocessors + a predicated
    # step + a second chained step, all in one plan
    def pipeline_full(s, d):
        pipe = (
            lk.pipeline(preprocessors=[lk.preprocessors.lower()])
            .step([lk.col("text").str_contains(pattern="the", case=True), lk.col("lang").exact()])
            .step(lk.col("source").exact())
        )
        return _canon_pipe(_docs(s, d), pipe)

    q["pipeline_full_surface"] = pipeline_full

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
        res = lk.dedupe(_docs(s, d)).apply({("lang", "source"): lk.exact()}).canonicalize(id="doc_id")
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
        # max_key_df=None: the SQL oracle's contains join sees ALL pairs, so
        # the engine's hot-key skew cap must be off here — a legitimately
        # capped key at larger SF would read as a false oracle mismatch.
        pairs = substring(min_len=50, max_key_df=None).gen_pairs(scope, "text", [])
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

    q["lang_id_pred"] = lambda s, d: _docs(s, d).select(
        "doc_id", T.lang_id(F.col("text")).alias("lang_pred")
    )

    # --- similarity search (SQL oracle via list_cosine_similarity) --------
    q["ann_cosine_topk"] = lambda s, d: brute_force_topk(_emb(s, d), k=3).select(
        F.col("vec_id").cast("long"), F.col("neighbor_id").cast("long"), F.col("rank").cast("long")
    )

    # --- near-dup operators -------------------------------------------------
    # exact-oracle family (deterministic scores; recursive-CTE CC in DuckDB)
    q["ngram_jaccard_dedup"] = lambda s, d: _canon(
        _docs(s, d), ngram_jaccard(threshold=0.55, ngram=5)
    )
    q["tfidf_dedup"] = lambda s, d: _canon(
        _docs(s, d), lk.tfidf(threshold=0.85, ngram=3, topn=4, max_df=0.5)
    )
    q["jaccard_dedup"] = lambda s, d: _canon(
        _docs(s, d), lk.jaccard(threshold=0.3), columns=("lang", "source")
    )
    q["fuzzy_lev_dedup"] = lambda s, d: _canon(
        _docs(s, d), lk.fuzzy(threshold=0.7, scorer="lev_ratio", block_by="source")
    )

    # cosine over numeric compound columns, blocked by order (the scale
    # contract: O(n^2) only within each block); output is per-order cluster
    # statistics (no stable per-row single-column key exists on lineitem)
    def cosine_dedup(s, d):
        ensure_on_workers(s)
        li = s.read.parquet(f"{d}/lineitem.parquet").where(F.col("l_orderkey") < 2000)
        cols = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        out = (
            lk.dedupe(li)
            .apply({cols: lk.cosine(threshold=COSINE_T, block_by="l_orderkey")})
            .canonicalize()
            .collect()
        )
        return out.groupBy("l_orderkey").agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct(CANONICAL_ID).cast("long").alias("n_clusters"),
        )

    q["cosine_dedup_lineitem"] = cosine_dedup

    # hash-seeded ops: the signature kernels (SHA1 MinHash / blake2b
    # SimHash / random-plane LSH) are golden-tested, not SQL; each query
    # exports the engine-computed signatures as a parquet sidecar and the
    # oracle re-derives candidates + clustering/ranking from it in DuckDB.
    def minhash_lsh(s, d):
        docs = _docs(s, d)
        spec = lk.lsh(threshold=0.7, ngram=3, num_perm=128)
        base = with_row_id(docs)
        banded = spec._banded(base, "text", [])
        _export(
            banded.join(base.select(ROW_ID, "doc_id"), ROW_ID).select(
                F.col("doc_id").cast("long"), "band", "key"
            ),
            "minhash_bands",
        )
        return _canon(docs, spec)

    q["minhash_lsh_dedup"] = minhash_lsh

    def simhash_dedup(s, d):
        docs = _docs(s, d)
        # max_bucket_reps=None: the sidecar oracle verifies popcount<=hamming
        # over ALL signature pairs, so the engine must see the same candidate
        # universe — a hot bucket legitimately dropped by the default cap
        # would read as a false oracle mismatch at larger scale factors.
        spec = lk.simhash(hamming=3, bands=4, max_bucket_reps=None)
        base = with_row_id(docs)
        sigs = spec._signatures(base, "text", [])
        _export(
            sigs.join(base.select(ROW_ID, "doc_id"), ROW_ID).select(
                F.col("doc_id").cast("long"), "sh"
            ),
            "simhash_sigs",
        )
        return _canon(docs, spec)

    q["simhash_dedup"] = simhash_dedup

    def ann_lsh(s, d):
        from liken_spark.operators.ann import lsh_candidates

        emb = _emb(s, d)
        _export(
            lsh_candidates(emb, n_planes=16, bands=4).select(
                F.col("vec_id").cast("long"), F.col("neighbor_id").cast("long")
            ),
            "ann_lsh_cands",
        )
        return lsh_topk(emb, k=3, n_planes=16, bands=4).select(
            F.col("vec_id").cast("long"), F.col("neighbor_id").cast("long"), F.col("rank").cast("long")
        )

    q["ann_lsh_topk"] = ann_lsh

    # embedding-cosine near-dup clusters, exact brute-force pair generation
    # (the ANN baseline path) + distributed CC; threshold sits in a measured
    # 3.5e-3 gap of the pairwise-cosine distribution at both sfs
    def emb_near_dup(s, d):
        from liken_spark.operators.ann import _dot, _norm_col
        from liken_spark.operators.cc import connected_components

        emb = _emb(s, d)
        v = emb.select(F.col("vec_id").alias("i"), _norm_col("embedding").alias("v")).persist()
        a, b = v.alias("a"), v.alias("b")
        pairs = (
            a.join(b, F.col("a.i") < F.col("b.i"))
            .where(_dot(F.col("a.v"), F.col("b.v")) > EMB_T)
            .select(F.col("a.i").alias("src"), F.col("b.i").alias("dst"))
        )
        comps = connected_components(pairs)
        out = emb.select(F.col("vec_id")).join(
            comps.withColumnRenamed("node", "vec_id"), "vec_id", "left"
        )
        return out.select(
            F.col("vec_id").cast("long"),
            F.coalesce(F.col("comp"), F.col("vec_id")).cast("long").alias("cluster_id"),
        )

    q["emb_near_dup_clusters"] = emb_near_dup

    # fuzzy with the rapidfuzz indel scorer (non-SQL DP) within source
    # blocks. The DP kernel is golden-tested; the sidecar exports the
    # full upper-triangular intra-block score matrix so the oracle
    # re-applies the strict >80 threshold + CC clustering in DuckDB.
    def fuzzy_dedup(s, d):
        import numpy as np
        import pandas as pd

        docs = _docs(s, d)

        def score_block(pdf: pd.DataFrame) -> pd.DataFrame:
            from liken_spark.functions.similarity import pairwise_scores

            pdf = pdf.sort_values("doc_id").reset_index(drop=True)
            ids = pdf["doc_id"].to_numpy()
            m = pairwise_scores(pdf["t"].tolist(), "simple_ratio")
            ii, jj = np.triu_indices(len(ids), k=1)
            return pd.DataFrame({"a": ids[ii], "b": ids[jj], "score": m[ii, jj]})

        blocks = docs.select(
            F.col("doc_id").cast("long"),
            F.col("source"),
            F.coalesce(F.col("text"), F.lit("na")).alias("t"),
        )
        _export(
            blocks.groupBy("source").applyInPandas(score_block, "a long, b long, score double"),
            "fuzzy_scores",
        )
        return _canon(docs, lk.fuzzy(threshold=0.8, block_by="source"))

    q["fuzzy_dedup"] = fuzzy_dedup

    # --- pandas-UDF preprocessors, value-level oracles ---------------------
    # Each returns the engine-preprocessed VALUE of a deterministically
    # constructed messy input (the raw tables are ASCII-clean, so the
    # construction makes the transform load-bearing); the oracle re-derives
    # the value with DuckDB string surgery.
    def prep_norm_unicode(s, d):
        from liken_spark import preprocess as P

        # DECOMPOSED input (e + U+0301 combining acute; U+212B Angstrom
        # sign): NFC must compose them to e-acute / A-ring on both engines
        col = F.concat(
            F.coalesce(F.col("text"), F.lit("na")),
            F.lit(" cafe\u0301 \u212b"),
        )
        return _docs(s, d).select(
            F.col("doc_id").cast("long"),
            P.normalize_unicode("NFC").apply(col).alias("norm_text"),
        )

    q["prep_normalize_unicode"] = prep_norm_unicode

    def prep_ascii_fold(s, d):
        from liken_spark import preprocess as P

        # precomposed accents (U+00E9, U+00EF, U+00FC): NFKD decomposes,
        # the U+0300-U+036F strip drops the marks -> "cafe naive uber"
        col = F.concat(
            F.coalesce(F.col("text"), F.lit("na")),
            F.lit(" café naïve über"),
        )
        return _docs(s, d).select(
            F.col("doc_id").cast("long"),
            P.ascii_fold().apply(col).alias("folded_text"),
        )

    q["prep_ascii_fold"] = prep_ascii_fold

    def prep_norm_names(s, d):
        from liken_spark import preprocess as P

        ensure_on_workers(s)
        cust = s.read.parquet(f"{d}/customer.parquet")
        p = P.normalize_names()
        return cust.select(
            F.col("c_custkey").cast("long"),
            p.apply(F.concat(F.lit("Mr. "), F.col("c_name"), F.lit(" Jr."))).alias("n_titled"),
            p.apply(F.concat(F.lit("Doe, "), F.col("c_name"))).alias("n_comma"),
        )

    q["prep_normalize_names"] = prep_norm_names

    def prep_norm_company(s, d):
        from liken_spark import preprocess as P

        ensure_on_workers(s)
        supp = s.read.parquet(f"{d}/supplier.parquet")
        return supp.select(
            F.col("s_suppkey").cast("long"),
            P.normalize_company()
            .apply(F.concat(F.col("s_name"), F.lit(" Co. Ltd.")))
            .alias("company"),
        )

    q["prep_normalize_company"] = prep_norm_company

    return q


# ---------------------------------------------------------------------------
# oracle SQL


def _cc_oracle(pairs_sql: str, nodes_sql: str = "SELECT doc_id FROM documents") -> str:
    """Recursive-CTE connected components: ``pairs_sql`` must yield (a, b)
    node-id pairs; result is (doc_id, canonical_id = min node id of the
    component), singletons keeping their own id — exactly the engine's
    keep="first" id="doc_id" semantics (node ids are doc_ids, which are
    monotone in row order in the testdata)."""
    return f"""
WITH RECURSIVE
pairs AS ({pairs_sql}),
edges AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
cc(node, comp) AS (
    SELECT n.doc_id, n.doc_id FROM ({nodes_sql}) n
  UNION
    SELECT e.b, cc.comp FROM cc JOIN edges e ON cc.node = e.a WHERE cc.comp < e.b
)
SELECT node AS doc_id, min(comp) AS canonical_id FROM cc GROUP BY node
"""


def _lang_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _LANGS[lang])
    return (
        f"len(list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'), "
        f"x -> list_contains([{words}], x))) AS h_{lang}"
    )


def oracle_sql() -> dict[str, str]:
    sql = {
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
        "pred_endswith": (
            "SELECT doc_id, CASE WHEN ends_with(text, '.') THEN "
            "  min(CASE WHEN ends_with(text, '.') THEN doc_id END) OVER () "
            "ELSE doc_id END AS canonical_id FROM documents"
        ),
        "pred_isin_lang": (
            "SELECT doc_id, CASE WHEN lang IN ('en', 'de') THEN "
            "  min(CASE WHEN lang IN ('en', 'de') THEN doc_id END) OVER () "
            "ELSE doc_id END AS canonical_id FROM documents"
        ),
        # derived maybe = CASE WHEN n_chars > 250 THEN source END; isna
        # clusters its nulls, ~isna its non-nulls
        "pred_isna_derived": (
            "SELECT doc_id, CASE WHEN n_chars <= 250 THEN "
            "  min(CASE WHEN n_chars <= 250 THEN doc_id END) OVER () "
            "ELSE doc_id END AS canonical_id FROM documents"
        ),
        "pred_notna_derived": (
            "SELECT doc_id, CASE WHEN n_chars > 250 THEN "
            "  min(CASE WHEN n_chars > 250 THEN doc_id END) OVER () "
            "ELSE doc_id END AS canonical_id FROM documents"
        ),
        "custom_prefix12": (
            "SELECT doc_id, min(doc_id) OVER "
            "(PARTITION BY substr(coalesce(text, 'na'), 1, 12)) AS canonical_id "
            "FROM documents"
        ),
        "prep_exact_lower_alnum": (
            "SELECT doc_id, min(doc_id) OVER (PARTITION BY "
            "regexp_replace(lower(coalesce(text, 'na')), '[^0-9a-z]+', '', 'g')"
            ") AS canonical_id FROM documents"
        ),
        # messy = '  ' || text || ' !! '; strip (engine's exact whitespace
        # class) -> remove_punctuation ([^\w\s]+) -> lower
        "prep_exact_strip_punct": (
            "SELECT doc_id, min(doc_id) OVER (PARTITION BY "
            "lower(regexp_replace(regexp_replace("
            "coalesce('  ' || text || ' !! ', 'na'), "
            "'^[\\s   ]+|[\\s   ]+$', '', 'g'), "
            "'[^\\w\\s]+', '', 'g'))"
            ") AS canonical_id FROM documents"
        ),
        "prep_exact_stopwords": (
            "SELECT doc_id, min(doc_id) OVER (PARTITION BY "
            "regexp_replace(lower(coalesce(text, 'na')), "
            f"'{_STOPWORD_PATTERN}', '', 'g')"
            ") AS canonical_id FROM documents"
        ),
        "and_step_lang_source": (
            "SELECT doc_id, min(doc_id) OVER (PARTITION BY lang, source) AS canonical_id "
            "FROM documents"
        ),
        "predicated_step_contains_exact": (
            "SELECT doc_id, CASE WHEN contains(text, 'the') THEN "
            "  min(CASE WHEN contains(text, 'the') THEN doc_id END) "
            "    OVER (PARTITION BY lang) "
            "ELSE doc_id END AS canonical_id FROM documents"
        ),
        "chain_lang_then_source": (
            "SELECT doc_id, arg_min(c1, doc_id) OVER (PARTITION BY source) AS canonical_id "
            "FROM (SELECT doc_id, source, min(doc_id) OVER (PARTITION BY lang) AS c1 "
            "      FROM documents)"
        ),
        # step 1 (predicated, on lowered inputs): matched rows cluster by
        # lang; step 2 rewrites with the canonical value of the min-row per
        # source group (value propagation across steps)
        "pipeline_full_surface": (
            "SELECT doc_id, arg_min(c1, doc_id) OVER (PARTITION BY source) AS canonical_id "
            "FROM (SELECT doc_id, source, "
            "  CASE WHEN contains(lower(text), 'the') THEN "
            "    min(CASE WHEN contains(lower(text), 'the') THEN doc_id END) "
            "      OVER (PARTITION BY lang) "
            "  ELSE doc_id END AS c1 FROM documents)"
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
            "(SELECT min(doc_id) OVER (PARTITION BY lang, source) AS canonical_id "
            " FROM documents) "
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
        "lang_id_pred": (
            "SELECT doc_id, CASE "
            "WHEN mx = 0 OR mx IS NULL THEN 'und' "
            "WHEN h_en = mx THEN 'en' WHEN h_de = mx THEN 'de' "
            "WHEN h_fr = mx THEN 'fr' WHEN h_es = mx THEN 'es' ELSE 'it' "
            "END AS lang_pred FROM ("
            "  SELECT doc_id, h_en, h_de, h_fr, h_es, h_it, "
            "  greatest(h_en, h_de, h_fr, h_es, h_it) AS mx FROM ("
            "    SELECT doc_id, "
            + ", ".join(_lang_hits(lang) for lang in _LANGS)
            + "    FROM documents))"
        ),
        "ann_cosine_topk": (
            "SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, "
            "row_number() OVER (PARTITION BY a.vec_id ORDER BY "
            "  list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC, "
            "  b.vec_id ASC) AS rank "
            "FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id "
            "QUALIFY rank <= 3"
        ),
    }

    # --- near-dup oracles: deterministic similarity + recursive-CTE CC ----

    # exact char-5-gram jaccard, threshold 0.55 (ratios are exact rational
    # divisions -> identical doubles on both engines)
    sql["ngram_jaccard_dedup"] = _cc_oracle(
        """
        WITH dnj AS (SELECT doc_id, coalesce(text, 'na') AS t FROM documents),
        g AS (SELECT DISTINCT doc_id, substr(t, i, 5) AS gr
              FROM dnj, LATERAL (SELECT unnest(range(1, length(t) - 3)) AS i)
              WHERE length(t) >= 5),
        sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
        inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
                  FROM g x JOIN g y ON x.gr = y.gr AND x.doc_id < y.doc_id
                  GROUP BY 1, 2)
        SELECT a, b FROM inter
        JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
        WHERE c * 1.0 / (sa.sz + sb.sz - c) > 0.55
        """
    )

    # sklearn-compatible char-3-gram tfidf cosine, threshold 0.85, topn=4,
    # max_df=0.5 (topn=4 exceeds the max candidate count at both sfs, so
    # float-noise rank swaps cannot change the kept pair set; threshold
    # margin measured > 3e-3)
    sql["tfidf_dedup"] = _cc_oracle(
        """
        WITH dtf AS (SELECT doc_id,
                     lower(regexp_replace(coalesce(text, 'na'), '\\s\\s+', ' ', 'g')) AS t
                     FROM documents),
        stats AS (SELECT count(*) AS n FROM dtf),
        grams AS (SELECT doc_id, substr(t, i, 3) AS term
                  FROM dtf, LATERAL (SELECT unnest(range(1, length(t) - 1)) AS i)
                  WHERE length(t) >= 3),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM grams GROUP BY 1, 2),
        dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1
                HAVING df <= (SELECT cast(0.5 * n AS int) FROM stats)),
        w AS (SELECT doc_id, tf.term,
                     tf * (ln(((SELECT n FROM stats) + 1.0) / (df + 1.0)) + 1.0) AS w
              FROM tf JOIN dfq ON tf.term = dfq.term),
        nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
        p AS (SELECT w.doc_id, term, w / nrm AS wn FROM w JOIN nrm ON w.doc_id = nrm.doc_id),
        sims AS (SELECT x.doc_id AS i, y.doc_id AS j, sum(x.wn * y.wn) AS sim
                 FROM p x JOIN p y ON x.term = y.term AND x.doc_id != y.doc_id
                 GROUP BY 1, 2),
        cand AS (SELECT i, j, sim FROM sims WHERE sim >= 0.85
                 UNION ALL SELECT doc_id, doc_id, 1.0 FROM dtf),
        topn AS (SELECT i, j,
                        row_number() OVER (PARTITION BY i ORDER BY sim DESC, j ASC) AS rn
                 FROM cand)
        SELECT i AS a, j AS b FROM topn WHERE rn <= 4 AND i != j
        """
    )

    # set-jaccard over the (lang, source) value sets, threshold 0.3 (tagged
    # values are all strings here, so plain string equality matches the
    # engine's type-tagging)
    sql["jaccard_dedup"] = _cc_oracle(
        """
        WITH v AS (SELECT doc_id, list_distinct([x for x in [lang, source] if x IS NOT NULL]) AS vs
                   FROM documents)
        SELECT x.doc_id AS a, y.doc_id AS b
        FROM v x JOIN v y ON x.doc_id < y.doc_id
        WHERE len(list_intersect(x.vs, y.vs)) > 0
          AND len(list_intersect(x.vs, y.vs)) * 1.0 /
              (len(x.vs) + len(y.vs) - len(list_intersect(x.vs, y.vs))) > 0.3
        """
    )

    # normalized-levenshtein fuzzy within source blocks, threshold 0.7
    # (DuckDB levenshtein() is bit-compatible with the engine's lev_ratio)
    sql["fuzzy_lev_dedup"] = _cc_oracle(
        """
        WITH dfz AS (SELECT doc_id, source, coalesce(text, 'na') AS t FROM documents)
        SELECT x.doc_id AS a, y.doc_id AS b
        FROM dfz x JOIN dfz y ON x.source = y.source AND x.doc_id < y.doc_id
        WHERE 100.0 * (1.0 - levenshtein(x.t, y.t) * 1.0 /
                       greatest(length(x.t), length(y.t), 1)) > 70.0
        """
    )

    # cosine clusters per order: recursive CC over intra-order edges, then
    # per-order (row count, cluster count) statistics
    # node ids: (l_orderkey, l_linenumber) is NOT unique in the synthetic
    # testdata, so rows get per-order row_number ids — cluster counts are
    # label-invariant (identical-valued rows are symmetric), so any
    # distinct-per-row labeling yields the same per-order statistics.
    sql["cosine_dedup_lineitem"] = f"""
WITH RECURSIVE
li AS (SELECT l_orderkey AS k,
              l_orderkey * 1000 +
              row_number() OVER (PARTITION BY l_orderkey
                                 ORDER BY l_quantity, l_extendedprice,
                                          l_discount, l_tax) AS rid,
              l_quantity AS q, l_extendedprice AS e, l_discount AS dc, l_tax AS t
       FROM lineitem WHERE l_orderkey < 2000),
nn AS (SELECT k, rid, q/nrm AS q, e/nrm AS e, dc/nrm AS dc, t/nrm AS t FROM
       (SELECT *, CASE WHEN sqrt(q*q + e*e + dc*dc + t*t) = 0 THEN 1
                       ELSE sqrt(q*q + e*e + dc*dc + t*t) END AS nrm FROM li)),
pairs AS (SELECT x.rid AS a, y.rid AS b
          FROM nn x JOIN nn y ON x.k = y.k AND x.rid < y.rid
          WHERE x.q*y.q + x.e*y.e + x.dc*y.dc + x.t*y.t > {COSINE_T!r}),
edges AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
cc(node, comp) AS (
    SELECT rid, rid FROM li
  UNION
    SELECT e.b, cc.comp FROM cc JOIN edges e ON cc.node = e.a WHERE cc.comp < e.b
),
lbl AS (SELECT node, min(comp) AS comp FROM cc GROUP BY node)
SELECT node // 1000 AS l_orderkey, count(*) AS n_rows,
       count(DISTINCT comp) AS n_clusters
FROM lbl GROUP BY 1
"""

    # embedding near-dup clusters: exact pairs + recursive CC over vec_id
    sql["emb_near_dup_clusters"] = f"""
WITH RECURSIVE
pairs AS (SELECT a.vec_id AS a, b.vec_id AS b
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                > {EMB_T!r}),
edges AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
cc(node, comp) AS (
    SELECT vec_id, vec_id FROM embeddings
  UNION
    SELECT e.b, cc.comp FROM cc JOIN edges e ON cc.node = e.a WHERE cc.comp < e.b
)
SELECT node AS vec_id, min(comp) AS cluster_id FROM cc GROUP BY node
"""

    # --- sidecar oracles: hash-seeded ops -----------------------------------
    # The signature kernels are golden-tested, not SQL; the queries export
    # the engine-computed signatures to parquet sidecars (written by the
    # SAME query run the driver compares against) and DuckDB independently
    # re-derives candidates, verification, ranking and clustering from them.

    # MinHash-LSH: clusters = connected components of the band-collision
    # graph (any shared (band, key) links a pair; the engine's salted star
    # edges span exactly these components)
    mb = _sidecar_sql("minhash_bands")
    sql["minhash_lsh_dedup"] = _cc_oracle(
        f"""
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM {mb} x JOIN {mb} y
          ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        """
    )

    # SimHash: with bands=4 >= hamming+1 the band filter is recall-lossless
    # (pigeonhole), so the final link condition is exactly
    # popcount(xor(sh_a, sh_b)) <= 3 — verified here over ALL pairs, which
    # also checks that the engine's banding dropped nothing
    ss = _sidecar_sql("simhash_sigs")
    sql["simhash_dedup"] = _cc_oracle(
        f"""
        SELECT x.doc_id AS a, y.doc_id AS b
        FROM {ss} x JOIN {ss} y ON x.doc_id < y.doc_id
        WHERE bit_count(xor(x.sh, y.sh)) <= 3
        """
    )

    # sign-LSH ANN: rerank the engine's exported band-collision candidate
    # set with exact cosine in DuckDB (same rank/tie-break as the engine;
    # the cross-engine cosine rank agreement is already proven by the
    # driver-green brute-force ann_cosine_topk)
    ac = _sidecar_sql("ann_lsh_cands")
    sql["ann_lsh_topk"] = f"""
SELECT c.vec_id, c.neighbor_id,
       row_number() OVER (PARTITION BY c.vec_id ORDER BY
         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
         c.neighbor_id ASC) AS rank
FROM {ac} c
JOIN embeddings a ON a.vec_id = c.vec_id
JOIN embeddings b ON b.vec_id = c.neighbor_id
QUALIFY rank <= 3
"""

    # fuzzy (rapidfuzz indel DP): the exported sidecar holds the full
    # upper-triangular intra-block score matrix; DuckDB re-applies the
    # strict >80 threshold and re-clusters with recursive-CTE CC
    fs = _sidecar_sql("fuzzy_scores")
    sql["fuzzy_dedup"] = _cc_oracle(
        f"SELECT a, b FROM {fs} WHERE score > 80.0"
    )

    # --- pandas-UDF preprocessors, value-level oracles ---------------------
    sql["prep_normalize_unicode"] = (
        "SELECT doc_id, nfc_normalize(coalesce(text, 'na') || ' cafe' || chr(769) "
        "|| ' ' || chr(8491)) AS norm_text FROM documents"
    )
    sql["prep_ascii_fold"] = (
        "SELECT doc_id, strip_accents(coalesce(text, 'na') "
        "|| ' caf' || chr(233) || ' na' || chr(239) || 've ' || chr(252) || 'ber') "
        "AS folded_text FROM documents"
    )
    sql["prep_normalize_names"] = (
        "SELECT c_custkey, "
        "regexp_replace(regexp_replace('Mr. ' || c_name || ' Jr.', "
        "'^(mr|mrs|ms|dr|prof)\\.?\\s+', '', 'i'), "
        "'\\s+(jr|sr|ii|iii)\\.?$', '', 'i') AS n_titled, "
        "trim(split_part('Doe, ' || c_name, ',', 2)) || ' ' || "
        "trim(split_part('Doe, ' || c_name, ',', 1)) AS n_comma "
        "FROM customer"
    )
    sql["prep_normalize_company"] = (
        "SELECT s_suppkey, "
        "rtrim(regexp_replace(s_name || ' Co. Ltd.', "
        "'(\\s+(co|ltd|inc|corp|llc)[.,&]*)+$', '', 'i'), ' .,') AS company "
        "FROM supplier"
    )

    return sql
