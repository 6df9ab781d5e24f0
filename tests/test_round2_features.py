"""Round-2 feature tests: scale guards, salted LSH knob, SimHash hot-bucket
linearity, fuzzy prefilter mode, lev_ratio DuckDB bit-compat,
collect_ordered, streaming watermark dedup plan."""

from __future__ import annotations

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

import liken_spark as lk
from liken_spark.constants import CANONICAL_ID, ROW_ID
from liken_spark.functions.similarity import lev_ratio
from liken_spark.ids import with_row_id
from liken_spark.operators.textdedup import SimHashSpec


def test_lsh_salt_exposed():
    spec = lk.lsh(threshold=0.8, salt=4)
    assert spec._salt == 4
    assert lk.lsh()._salt == 8  # default


def test_global_block_guard_fuzzy(spark):
    # the cheap bounded driver probe (limit(n+1).count()) fails fast with
    # the TYPED error before anything is shuffled into the single task
    from liken_spark.operators.dedupers import GlobalBlockTooLargeError

    big = spark.range(60_000).select(F.col("id").cast("string").alias("t"))
    with pytest.raises(GlobalBlockTooLargeError, match="block_by"):
        lk.dedupe(big).apply({"t": lk.fuzzy(threshold=0.9)}).canonicalize().collect().count()


def test_global_block_guard_cosine(spark):
    from liken_spark.operators.dedupers import GlobalBlockTooLargeError

    big = spark.range(60_000).select(
        F.col("id").cast("double").alias("a"), (F.col("id") * 2).cast("double").alias("b")
    )
    with pytest.raises(GlobalBlockTooLargeError, match="block_by"):
        lk.dedupe(big).apply({("a", "b"): lk.cosine(threshold=0.9)}).canonicalize().collect().count()


def test_simhash_hot_bucket_linear_pairs(spark):
    """A planted hot bucket (many identical texts) must emit a LINEAR star
    pair set (n-1 member edges), not the O(n^2) bucket join."""
    n = 1000
    df = spark.range(n).select(F.lit("identical hot bucket text payload").alias("t"))
    scope = with_row_id(df)
    pairs = SimHashSpec(hamming=3, bands=4).gen_pairs(scope, "t", [])
    assert pairs.count() == n - 1


def test_simhash_mixed_bucket_clusters_unchanged(spark):
    """Signature-collapse + rep pairing must produce the same clusters as
    the definition (all pairs with hamming <= k link)."""
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon zeta",   # exact dup
        "alpha beta gamma delta epsilon zetaX",  # near dup
        "totally different words entirely here now",
        "unrelated content again for the corpus",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    out = lk.dedupe(df).apply({"t": lk.simhash(hamming=3, bands=4)}).canonicalize(id="i").collect()
    rows = {r["i"]: r[CANONICAL_ID] for r in out.collect()}
    assert rows[0] == rows[1]  # exact dups cluster
    assert rows[3] != rows[0] and rows[4] != rows[0]


def test_fuzzy_prefilter_agrees_with_exhaustive(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog!"),  # near dup of 0
        (2, "a completely different sentence about spark engines"),
        (3, "a completely different sentence about spark engines"),  # exact dup of 2
        (4, "nothing like the others at all in any way whatsoever"),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    exhaustive = (
        lk.dedupe(df).apply({"t": lk.fuzzy(threshold=0.9)}).canonicalize(id="i").collect()
    )
    prefiltered = (
        lk.dedupe(df)
        .apply({"t": lk.fuzzy(threshold=0.9, prefilter=lk.lsh(threshold=0.5, ngram=3))})
        .canonicalize(id="i")
        .collect()
    )
    a = {(r["i"], r[CANONICAL_ID]) for r in exhaustive.collect()}
    b = {(r["i"], r[CANONICAL_ID]) for r in prefiltered.collect()}
    assert a == b


def test_lev_ratio_matches_duckdb():
    con = duckdb.connect()
    rnd = random.Random(7)
    for _ in range(100):
        a = "".join(rnd.choices(string.ascii_lowercase[:8], k=rnd.randint(0, 25)))
        b = "".join(rnd.choices(string.ascii_lowercase[:8], k=rnd.randint(0, 25)))
        expected = con.sql(
            "SELECT 100.0 * (1.0 - levenshtein(?, ?) * 1.0 / greatest(length(?), length(?), 1))",
            params=[a, b, a, b],
        ).fetchone()[0]
        assert lev_ratio(a, b) == pytest.approx(expected, abs=0)


def test_isin_accepts_generator(spark):
    df = spark.createDataFrame([(1, "en"), (2, "de"), (3, "fr")], "i long, lang string")
    spec = lk.isin(v for v in ["en", "de"])
    # evaluate the mask twice: a one-shot iterable would silently empty out
    for _ in range(2):
        matched = df.where(spec.mask_column(df, "lang", [])).count()
        assert matched == 2


def test_collect_ordered_false_same_assignments(spark):
    df = spark.createDataFrame(
        [(i, ["x", "y", "z"][i % 3]) for i in range(30)], "i long, k string"
    )
    ordered = lk.dedupe(df).apply({"k": lk.exact()}).canonicalize(id="i").collect()
    unordered = (
        lk.dedupe(df, collect_ordered=False).apply({"k": lk.exact()}).canonicalize(id="i").collect()
    )
    a = {(r["i"], r[CANONICAL_ID]) for r in ordered.collect()}
    b = {(r["i"], r[CANONICAL_ID]) for r in unordered.collect()}
    assert a == b
    # ordered output preserves input row order
    assert [r["i"] for r in ordered.collect()] == list(range(30))


def test_streaming_watermark_dedup_is_per_key(spark):
    """dropDuplicatesWithinWatermark plan: dedup keys must be the key cols
    alone (not key + event time)."""
    from liken_spark.streaming.incremental import streaming_drop_duplicates

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .select(F.col("value").cast("string").alias("k"), F.col("timestamp"))
    )
    out = streaming_drop_duplicates(stream, ["k"], event_time_col="timestamp", delay="5 minutes")
    assert out.isStreaming
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in plan, plan


def test_deterministic_source_same_assignments(tmp_path, spark):
    df = spark.createDataFrame(
        [(i, ["x", "y", "z"][i % 3]) for i in range(30)], "i long, k string"
    )
    path = str(tmp_path / "t.parquet")
    df.write.mode("overwrite").parquet(path)
    src = spark.read.parquet(path)
    a = lk.dedupe(src).apply({"k": lk.exact()}).canonicalize(id="i").collect()
    b = (
        lk.dedupe(src, deterministic_source=True, collect_ordered=False)
        .apply({"k": lk.exact()})
        .canonicalize(id="i")
        .collect()
    )
    sa = {(r["i"], r[CANONICAL_ID]) for r in a.collect()}
    sb = {(r["i"], r[CANONICAL_ID]) for r in b.collect()}
    assert sa == sb


def test_substring_winnow_same_pairs_fewer_candidates(spark):
    """Winnowed substring emission must produce the IDENTICAL verified pair
    set as the exact emission, from a much smaller haystack key set."""
    import random

    from liken_spark.operators.textdedup import SubstringSpec

    rnd = random.Random(5)
    vocab = [f"w{k}" for k in range(50)]
    texts = []
    for i in range(60):
        base = " ".join(rnd.choices(vocab, k=rnd.randint(12, 30)))
        texts.append(base)
        if i % 3 == 0:  # containment: base embedded in a longer text
            texts.append("pre fix " + base + " post fix")
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    scope = with_row_id(df)
    exact_pairs = {
        (r["src"], r["dst"])
        for r in SubstringSpec(min_len=40, winnow=None).gen_pairs(scope, "t", []).collect()
    }
    winnowed_pairs = {
        (r["src"], r["dst"])
        for r in SubstringSpec(min_len=40, winnow=8).gen_pairs(scope, "t", []).collect()
    }
    assert exact_pairs == winnowed_pairs
    assert len(exact_pairs) > 0
