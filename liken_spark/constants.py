"""Engine-wide constants.

Semantics mirrored from the reference implementation
(/root/reference/src/liken/constants.py:8-15): the reserved canonical-id
column name (overridable via env), the string placeholder that single-column
dedupers see in place of nulls, and the default key used by the sequential
API.
"""

from __future__ import annotations

import os
from typing import Final

# Reserved output column (reference: constants.py:8)
CANONICAL_ID: Final[str] = os.environ.get("CANONICAL_ID", "canonical_id")

# Placeholder substituted for nulls in single-column dedupers
# (reference: constants.py:10-12). A real value "na" therefore equals null —
# a documented hazard we reproduce for parity.
NA_PLACEHOLDER: Final[str] = "na"

# Sequential-API collection key (reference: constants.py:15)
SEQUENTIAL_API_DEFAULT_KEY: Final[str] = "_default_"

# Internal row-order column added by the engine. Unlike the reference (which
# relies on in-memory row positions, core/deduper.py:119-121), we materialize
# an explicit global row id so keep="first"/"last" semantics survive shuffles.
ROW_ID: Final[str] = "__lk_row_id"

# Internal prefix for temporary columns; never leaks into user output.
TMP_PREFIX: Final[str] = "__lk_tmp_"
