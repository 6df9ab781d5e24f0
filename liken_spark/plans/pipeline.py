"""Deduper-collection DSL: Sequential / Dict / Pipeline APIs.

API-compatible with the reference's three application styles
(collections/base.py:54-95, collections/pipelines.py, collections/dict.py):

- Sequential: ``.apply(deduper)`` repeatedly; columns given at execute time
- Dict: ``.apply({"col": deduper | (d1, d2, ...)})``
- Pipeline: ``lk.pipeline().step([lk.col("a").exact(), ...])`` with
  three-level preprocessor precedence (col > step > pipeline,
  pipelines.py:452-468) and predicates sorted to the front of each step
  (pipelines.py:471).

The compiled form is a list of executor ``Unit`` steps.
"""

from __future__ import annotations

import warnings
from typing import Iterable

from liken_spark.constants import SEQUENTIAL_API_DEFAULT_KEY
from liken_spark.operators.base import DEDUPER_REGISTRY, Columns, DeduperSpec, PredicateSpec
from liken_spark.operators.executor import Unit
from liken_spark.preprocess import Preprocessor


class InvalidDeduperError(TypeError):
    pass


def _as_preprocessors(p) -> list[Preprocessor]:
    if p is None:
        return []
    if isinstance(p, Preprocessor):
        return [p]
    out = list(p)
    for x in out:
        if not isinstance(x, Preprocessor):
            raise TypeError(f"preprocessor must be instance of Preprocessor, got {type(x).__name__}")
    return out


class Col:
    """One column (or column tuple) awaiting a deduper method call:
    ``col("address").exact()`` (reference pipelines.py:249-357)."""

    def __init__(self, columns: Columns, preprocessors=None):
        self._columns = columns
        self._preprocessors = _as_preprocessors(preprocessors)
        self._unit: Unit | None = None

    def __getattr__(self, attr: str):
        if attr.startswith("__"):
            raise AttributeError(attr)
        try:
            factory = DEDUPER_REGISTRY[attr]
        except KeyError:
            raise AttributeError(f"unknown deduper {attr!r}") from None

        def wrapper(*args, **kwargs):
            spec = factory(*args, **kwargs)
            self._unit = Unit(self._columns, spec, self._preprocessors)
            return self

        return wrapper

    def __invert__(self) -> "Col":
        if self._unit is None:
            raise TypeError("no deduper applied to Col yet")
        spec = self._unit.spec
        if not isinstance(spec, PredicateSpec):
            raise TypeError("Only predicate dedupers support inversion")
        new = Col(self._columns)
        new._unit = Unit(self._columns, ~spec, self._unit.preprocessors)
        return new

    @property
    def unit(self) -> Unit:
        if self._unit is None:
            raise TypeError("no deduper applied to Col")
        return self._unit

    def __str__(self) -> str:
        unit = self.unit
        prefix, srep = "lk.col", str(unit.spec)
        if srep.startswith("~"):
            prefix, srep = "~lk.col", srep[1:]
        return f"{prefix}('{unit.columns}').{srep}"


def col(columns: Columns, /, *, preprocessors=None) -> Col:
    return Col(columns, preprocessors=preprocessors)


class Pipeline:
    def __init__(self, preprocessors=None):
        self._preprocessors = _as_preprocessors(preprocessors)
        self._steps: list[list[Unit]] = []
        self._display: list[list[Col]] = []

    def step(self, cols: Col | list[Col], /, *, preprocessors=None) -> "Pipeline":
        step_preps = _as_preprocessors(preprocessors) or self._preprocessors
        if isinstance(cols, Col):
            cols_list = [cols]
        elif isinstance(cols, list):
            cols_list = cols
        else:
            raise TypeError("Must be an instance of Col, used as `lk.col(...)` or a list of the same.")
        units = [c.unit for c in cols_list]
        # preprocessor precedence: unit-level wins (pipelines.py:452-468)
        units = [
            Unit(u.columns, u.spec, u.preprocessors if u.preprocessors else step_preps)
            for u in units
        ]
        # predicates first (pipelines.py:471)
        units = sorted(units, key=lambda u: not isinstance(u.spec, PredicateSpec))
        self._steps.append(units)
        self._display.append(cols_list)
        return self

    @property
    def steps(self) -> list[list[Unit]]:
        return self._steps

    def __str__(self) -> str:
        pros = ""
        if self._preprocessors:
            pros = "preprocessors=" + f"{[str(p) for p in self._preprocessors]}"
        inner = ""
        for step in self._display:
            inner += "\n\t\t.step(["
            for c in step:
                inner += "\n\t\t\t" + str(c) + ","
            inner += "\n\t\t])"
        return f"(\n\tlk.pipeline({pros}){inner}\n)"


def pipeline(preprocessors=None) -> Pipeline:
    return Pipeline(preprocessors)


class CollectionsManager:
    """Normalizes the three APIs into either an ordered dict of
    (columns -> tuple of specs) or a Pipeline (reference
    collections/base.py:24-127)."""

    def __init__(self) -> None:
        self._dict: dict[Columns, tuple[DeduperSpec, ...]] = {SEQUENTIAL_API_DEFAULT_KEY: ()}
        self._pipeline: Pipeline | None = None
        self.has_applies = False

    @property
    def is_sequential_applied(self) -> bool:
        if self._pipeline is not None:
            return False
        return set(self._dict) == {SEQUENTIAL_API_DEFAULT_KEY}

    def apply(self, deduper) -> None:
        self.has_applies = True
        if isinstance(deduper, DeduperSpec):
            if not self.is_sequential_applied:
                raise InvalidDeduperError(
                    "Cannot apply a deduper after a deduper mapping (dict) has been set."
                )
            self._dict[SEQUENTIAL_API_DEFAULT_KEY] = self._dict[SEQUENTIAL_API_DEFAULT_KEY] + (deduper,)
            return
        if isinstance(deduper, dict):
            if self._dict.get(SEQUENTIAL_API_DEFAULT_KEY):
                warnings.warn("Replacing previously added sequence deduper with a dict deduper")
            normalized: dict[Columns, tuple[DeduperSpec, ...]] = {}
            for key, value in deduper.items():
                if not isinstance(key, (str, tuple)):
                    raise InvalidDeduperError(
                        f"Invalid type for dict key type: expected str or tuple, got '{type(key).__name__}'"
                    )
                if isinstance(value, DeduperSpec):
                    value = (value,)
                elif isinstance(value, (list, tuple)):
                    for i, member in enumerate(value):
                        if not isinstance(member, DeduperSpec):
                            raise InvalidDeduperError(
                                f"Invalid type for dict value member: at index {i} for key '{key}'"
                            )
                    value = tuple(value)
                else:
                    raise InvalidDeduperError(
                        f"Invalid type for dict value: expected list, tuple or deduper, got '{type(value).__name__}'"
                    )
                normalized[key] = value
            self._dict = normalized
            self._pipeline = None
            return
        if isinstance(deduper, Col):
            deduper = Pipeline().step(deduper)
        if isinstance(deduper, Pipeline):
            if self._pipeline is not None:
                warnings.warn("Replacing previously added Pipeline deduper with a new Pipeline deduper")
            self._pipeline = deduper
            return
        raise InvalidDeduperError(
            f"Invalid deduper: Expected a deduper, a dict or Pipeline, got '{type(deduper).__name__}'"
        )

    def compile(self, columns: Columns | None) -> list[list[Unit]]:
        """-> executor steps. Sequential/dict entries each become a
        single-unit step (they apply iteratively, reference
        executor.py:89-101); pipeline steps pass through."""
        if self._pipeline is not None:
            return self._pipeline.steps
        steps: list[list[Unit]] = []
        if self.is_sequential_applied:
            for spec in self._dict[SEQUENTIAL_API_DEFAULT_KEY]:
                steps.append([Unit(columns, spec, [])])  # type: ignore[arg-type]
        else:
            for key, specs in self._dict.items():
                for spec in specs:
                    steps.append([Unit(key, spec, [])])
        return steps

    def pretty(self) -> str | None:
        if self._pipeline is not None:
            return str(self._pipeline)
        if self.is_sequential_applied:
            specs = self._dict[SEQUENTIAL_API_DEFAULT_KEY]
            if not specs:
                return None
            return ", ".join(str(s) for s in specs)
        rep = ""
        for k, values in self._dict.items():
            krep = "".join("\n\t\t" + str(v) + "," for v in values)
            rep += f"\n\t'{k}': ({krep}\n\t\t),"
        return "{" + rep + "\n}"

    def reset(self) -> None:
        self._dict = {SEQUENTIAL_API_DEFAULT_KEY: ()}
        self._pipeline = None
        self.has_applies = False


def validate_keep(keep: str) -> str:
    if keep not in ("first", "last"):
        raise ValueError(f"Invalid arg: keep arg must be one of 'first' or 'last', got {keep}")
    return keep


def validate_columns(columns: Columns | None, is_sequential: bool) -> Columns | None:
    """Sequential API requires columns; dict/pipeline forbid them
    (reference validators.py:55-82)."""
    if is_sequential:
        if columns is None:
            raise ValueError(
                "Invalid arg: columns cannot be None; a column label or tuple of column labels "
                "must be provided when using the sequential API."
            )
        if isinstance(columns, tuple) and len(set(columns)) != len(columns):
            raise ValueError("Invalid arg: columns labels cannot be repeated.")
    elif columns is not None:
        raise ValueError(
            "Invalid arg: columns must be None when using the dict/pipeline API."
        )
    return columns
