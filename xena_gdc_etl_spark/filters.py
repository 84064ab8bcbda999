"""Declarative AND-filter specs, parity with the reference's GDC query filter.

The reference builds GDC API filters from two dicts — "in" conditions and
"exclude" conditions, AND-ed together
(/root/reference/xena_gdc_etl/gdc.py:175 ``simple_and_filter``). Here the
same spec compiles to a native Spark ``Column`` predicate so Catalyst pushes
it into the parquet scan (visible as PushedFilters in explain output) —
the distributed equivalent of the API doing server-side filtering.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_list(value: Any) -> list:
    if isinstance(value, (list, tuple, set)):
        return list(value)
    return [value]


@dataclass(frozen=True)
class FilterSpec:
    """AND of per-field membership conditions.

    ``include``: field -> value(s); hit must match one of the values ("in").
    ``exclude``: field -> value(s); hit must match none of them ("exclude").
    """

    include: Mapping[str, Any] = field(default_factory=dict)
    exclude: Mapping[str, Any] = field(default_factory=dict)

    def predicate(self) -> Column:
        conds: list[Column] = []
        for key, value in self.include.items():
            conds.append(F.col(key).isin(_as_list(value)))
        for key, value in self.exclude.items():
            conds.append(~F.col(key).isin(_as_list(value)))
        if not conds:
            return F.lit(True)
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(self.predicate())

    def to_gdc(self) -> dict:
        """Render the spec in the GDC API's JSON filter grammar — the exact
        output shape of the reference's ``simple_and_filter``
        (/root/reference/xena_gdc_etl/gdc.py:175): an ``and`` of ``in`` /
        ``exclude`` ops, each ``{"field": ..., "value": [...]}``. Empty spec
        renders as ``{}`` (no filtering), matching the reference.
        """
        content = [
            {"op": "in", "content": {"field": k, "value": _as_list(v)}}
            for k, v in self.include.items()
        ] + [
            {"op": "exclude", "content": {"field": k, "value": _as_list(v)}}
            for k, v in self.exclude.items()
        ]
        if not content:
            return {}
        return {"op": "and", "content": content}


def search(
    df: DataFrame,
    include: Mapping[str, Any] | None = None,
    exclude: Mapping[str, Any] | None = None,
    fields: Sequence[str] | None = None,
) -> DataFrame:
    """Filter + project, the engine-side analog of ``gdc.search``
    (/root/reference/xena_gdc_etl/gdc.py:221): declarative conditions plus a
    field list; both reach the scan (pushdown + column pruning).
    """
    out = FilterSpec(include or {}, exclude or {}).apply(df)
    if fields:
        out = out.select(*fields)
    return out
