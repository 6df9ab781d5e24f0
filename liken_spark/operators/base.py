"""Deduper spec base classes.

A *spec* is a small, picklable description of a deduplication operator —
the engine's logical-plan node. Unlike the reference (where each deduper
is an imperative pair generator over an in-memory Arrow array,
core/deduper.py:89-125), specs compile to one of three *physical*
strategies, chosen for how they scale on Spark:

- ``BucketDeduper``   : equality semantics -> groupBy/window on a key
  expression. Zero pair materialization; one shuffle. (exact)
- ``PredicateSpec``   : boolean row filter -> all matching rows form one
  cluster (the reference's star topology, core/deduper.py:228-237 — only
  the component partition matters). One scalar aggregate, no pairs.
- ``PairsDeduper``    : similarity semantics -> a candidate-pair DataFrame
  fed to distributed connected components. (lsh, tfidf, fuzzy, cosine,
  jaccard, custom)

Threshold validation mirrors the reference (0 <= t < 1, strict-greater
comparisons; core/deduper.py:296-301).
"""

from __future__ import annotations

from typing import Any, Callable, ClassVar

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StringType

from liken_spark.constants import NA_PLACEHOLDER, ROW_ID
from liken_spark.preprocess import Preprocessor, apply_all

Columns = str | tuple[str, ...]

# name -> factory registry; custom.register() adds entries (reference:
# core/registries.py + custom.py:162)
DEDUPER_REGISTRY: dict[str, Callable[..., "DeduperSpec"]] = {}


def register_deduper(name: str, factory: Callable[..., "DeduperSpec"]) -> None:
    DEDUPER_REGISTRY[name] = factory


class DeduperSpec:
    """Base logical node."""

    name: ClassVar[str] = "deduper"
    # nulls -> "na" for single-column inputs (reference core/deduper.py:78)
    with_na_placeholder: ClassVar[bool] = True
    # None = both allowed; True = single only; False = compound only
    single_column: ClassVar[bool | None] = None

    def __init__(self, **display_kwargs: Any):
        self._display_kwargs = display_kwargs

    def validate(self, columns: Columns) -> None:
        if self.single_column is True and not isinstance(columns, str):
            raise ValueError("For single column dedupers, `columns` must be defined as a string")
        if self.single_column is False and not isinstance(columns, tuple):
            raise ValueError("For compound columns dedupers, `columns` must be defined as a tuple")

    def extra_columns(self) -> list[str]:
        """Additional input columns this spec reads beyond ``columns``
        (e.g. a blocking key) — kept by the executor's narrow projection."""
        block_by = getattr(self, "_block_by", None)
        return [block_by] if block_by else []

    # -- display ----------------------------------------------------------
    def __repr__(self) -> str:
        kw = ", ".join(f"{k}={v!r}" for k, v in self._display_kwargs.items())
        return f"{self.name}({kw})"

    __str__ = __repr__

    # -- input preparation -------------------------------------------------
    def prepared_column(
        self, df: DataFrame, column: str, preprocessors: list[Preprocessor]
    ) -> Column:
        """Single-column input after NA placeholder + preprocessors, in the
        reference's order (placeholder first: core/deduper.py:111-113)."""
        dtype = df.schema[column].dataType
        col = F.col(column)
        if self.with_na_placeholder:
            if not isinstance(dtype, StringType):
                col = col.cast("string")
            col = F.coalesce(col, F.lit(NA_PLACEHOLDER))
        col = apply_all(col, preprocessors)
        return col


class ThresholdMixin:
    def _check_threshold(self, threshold: float) -> float:
        if not (0 <= threshold < 1):
            raise ValueError("The threshold value must be greater or equal to 0 and less than 1")
        return threshold


class BucketDeduper(DeduperSpec):
    """Equality bucketing: rows sharing the key co-cluster."""

    kind: ClassVar[str] = "bucket"

    def key_column(self, df: DataFrame, columns: Columns, preprocessors: list[Preprocessor]) -> Column:
        raise NotImplementedError


class PredicateSpec(DeduperSpec):
    """Boolean filter: all matching rows form one cluster. Supports ``~``."""

    kind: ClassVar[str] = "predicate"

    def mask_column(self, df: DataFrame, column: str, preprocessors: list[Preprocessor]) -> Column:
        """Must be null-free boolean (callers rely on coalesce-to-False)."""
        raise NotImplementedError

    def __invert__(self) -> "PredicateSpec":
        return NegatedPredicate(self)


class NegatedPredicate(PredicateSpec):
    """``~pred`` — inverted match set (reference core/deduper.py:255-284).
    ``isna`` overrides its own inversion, mirroring isna.py:53-54."""

    def __init__(self, inner: PredicateSpec):
        super().__init__()
        self._inner = inner

    @property
    def with_na_placeholder(self) -> bool:  # type: ignore[override]
        return self._inner.with_na_placeholder

    def validate(self, columns: Columns) -> None:
        self._inner.validate(columns)

    def mask_column(self, df: DataFrame, column: str, preprocessors: list[Preprocessor]) -> Column:
        return ~self._inner.mask_column(df, column, preprocessors)

    def __repr__(self) -> str:
        return f"~{self._inner!r}"

    __str__ = __repr__


class PairsDeduper(DeduperSpec):
    """Similarity semantics: emits a candidate/linked pair DataFrame
    ``(src, dst)`` of ROW_ID values; consumed by connected components."""

    kind: ClassVar[str] = "pairs"

    def gen_pairs(
        self, scope: DataFrame, columns: Columns, preprocessors: list[Preprocessor]
    ) -> DataFrame:
        raise NotImplementedError

    def gen_candidate_pairs(
        self, scope: DataFrame, columns: Columns, preprocessors: list[Preprocessor]
    ) -> DataFrame:
        """Pairs to feed a downstream VERIFIER (e.g. ``fuzzy(prefilter=...)``).

        Differs from ``gen_pairs`` when the operator's own edge set relies
        on CC transitivity (star edges): a verifier filters edges
        independently, so it must see the actual candidate pairs, not a
        spanning structure. Default: same as ``gen_pairs``."""
        return self.gen_pairs(scope, columns, preprocessors)

    # -- helper for block-scoped pairwise operators ------------------------
    @staticmethod
    def _block_expr(block_by: str | None) -> Column:
        """Blocking key for inherently-pairwise operators (fuzzy/cosine/
        custom). ``None`` = one global block — exact reference parity, but
        O(n^2) in the block; at scale pass ``block_by`` (the reference makes
        the same demand via partition-as-blocking,
        docs/in-practice/performance.md:99-104 — ours is global-correct
        *within* each block)."""
        return F.lit(0) if block_by is None else F.xxhash64(F.col(block_by))
