"""Row-content fingerprints.

The reference computes its SCD content hashes as
``sha2(concat_ws("", *cols), 256)`` (scd_handler.py:102-103). The
empty separator plus concat_ws's null-skipping is a collision hazard:
("ab","c") == ("a","bc") and NULL == "". The default here is
null-safe and separator-safe: each column is cast to string,
NULL mapped to a sentinel, joined with a unit separator. A compat
mode reproduces the reference's exact hashes (needed to interoperate
with tables the reference wrote).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

_SEP = "\x1f"  # ASCII unit separator
_NULL = "\x00N"  # sentinel distinct from any cast-to-string value


def row_fingerprint(cols: Sequence[str | Column], compat: bool = False) -> Column:
    """sha2-256 hex fingerprint of the given columns' values.

    compat=True reproduces the reference's ``sha2(concat_ws('', ...))``
    (scd_handler.py:102-103) including its null/separator collisions.
    """
    columns = [F.col(c) if isinstance(c, str) else c for c in cols]
    if compat:
        return F.sha2(F.concat_ws("", *columns), 256)
    safe = [F.coalesce(c.cast("string"), F.lit(_NULL)) for c in columns]
    return F.sha2(F.concat_ws(_SEP, *safe), 256)
