"""Dynamic-column accessors — the engine-side spellings of
ClickHouse's ``dynamicType(d)`` and ``dynamicElement(d, 'T')`` (docs:
sql-reference/data-types/dynamic, 'Reading ... as subcolumns').

The Dynamic column surfaces type-erased as ``struct<type, value>``
(native/types.py parse_type explains why), so these helpers are thin
COLUMN EXPRESSIONS — pure Catalyst, no UDFs, fully codegen'd:

* ``dynamic_type(d)`` — the stored type name per row (NULL for NULL
  rows), exactly ClickHouse's ``dynamicType``.
* ``dynamic_element(d, 'Int64')`` — the value as its real Spark type
  when the row holds that variant, else NULL — ClickHouse's
  ``d.Int64`` subcolumn / ``dynamicElement(d, 'Int64')``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(d) -> Column:
    return F.col(d) if isinstance(d, str) else d


def dynamic_type(d) -> Column:
    """``dynamicType(d)`` — the ClickHouse type name stored in the row
    (NULL for a NULL Dynamic value)."""
    return _col(d)["type"]


def dynamic_element(d, type_name: str) -> Column:
    """``dynamicElement(d, 'T')`` / the ``d.T`` subcolumn: the value
    cast to T's Spark type where the row holds that variant, NULL
    elsewhere.  ``type_name`` must be a scalar ClickHouse spelling the
    Dynamic codec accepts (named refusal otherwise — same contract as
    decode)."""
    from ..native.codec import _check_dynamic_member
    from ..native.types import parse_type
    from ..sources.native_datasource import _ch_to_spark

    t = parse_type("String") if type_name == "SharedVariant" else parse_type(
        type_name
    )
    _check_dynamic_member(t, type_name)
    col = _col(d)
    return F.when(
        col["type"] == type_name, col["value"].cast(_ch_to_spark(t))
    )
