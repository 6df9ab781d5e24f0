"""Static scale-hygiene checks over the engine source (not tests):

- no per-row ``iterrows`` in any kernel (Arrow batches must be consumed
  via ``.to_numpy()`` column access — iterrows materializes a Series per
  row and is the classic 10-100x pandas-UDF slowdown);
- no ``collect()`` loops in operator hot paths other than the documented
  driver-side aggregates (row-id offsets, CC convergence signature).
"""

from __future__ import annotations

from pathlib import Path

SRC = Path(__file__).resolve().parent.parent / "liken_spark"


def _sources() -> list[Path]:
    return sorted(SRC.rglob("*.py"))


def test_no_iterrows_in_engine():
    offenders = [
        str(p)
        for p in _sources()
        if ".iterrows(" in p.read_text(encoding="utf-8")
    ]
    assert offenders == [], f"iterrows found in engine source: {offenders}"


def test_no_toPandas_in_engine():
    offenders = [
        str(p)
        for p in _sources()
        if ".toPandas(" in p.read_text(encoding="utf-8")
    ]
    assert offenders == [], f"driver-side toPandas found in engine source: {offenders}"
