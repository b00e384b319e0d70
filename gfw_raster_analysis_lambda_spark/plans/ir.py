"""Query IR — the parsed form of a zonal "Raster SQL" query.

Mirrors the reference's Query object surface (selectors, aggregates,
filter tree, groups, order, limit — reference query.py:131-155) as plain
picklable dataclasses so the zonal kernel can close over them and ship to
executors.

Filter literals are stored **already encoded to raw pixel space** (the
planner calls ``DataEnvironment.encode_filter_literal`` at parse time —
constant folding the categorical lookup out of the hot path, reference
query.py:268-279 semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union

VALID_OPS = (">", "<", ">=", "<=", "==", "!=", "in")


@dataclass(frozen=True)
class FilterLeaf:
    layer: str
    op: str  # one of VALID_OPS
    values: tuple  # 1 value for comparisons; n for "in"


@dataclass(frozen=True)
class FilterAnd:
    children: tuple


@dataclass(frozen=True)
class FilterOr:
    children: tuple


Filter = Union[FilterLeaf, FilterAnd, FilterOr]


@dataclass(frozen=True)
class Aggregate:
    func: str  # count | sum | avg | min | max | percentile | mode | count_distinct
    layer: Optional[str]  # None for count(*); may be area__ha / reserved
    alias: str
    param: Optional[float] = None  # percentile fraction (0, 1]


@dataclass(frozen=True)
class OrderBy:
    column: str
    ascending: bool = True


@dataclass(frozen=True)
class ZonalQuery:
    """One zonal-statistics query over the images corpus.

    ``base_layer`` is the FROM layer — its non-NoData pixels implicitly
    mask the computation (reference query_executor.py:29-39) unless it is
    the pseudo-table ``data``. ``group_layers`` are both the grouping keys
    and the leading output columns. ``select_pixels`` switches to pixel-row
    extraction mode (latitude/longitude/value rows, no aggregation).
    """

    base_layer: str
    group_layers: tuple = ()
    aggregates: tuple = ()
    where: Optional[Filter] = None
    select_pixels: tuple = ()  # pixel-mode output column names
    order_by: tuple = ()  # tuple[OrderBy]
    limit: Optional[int] = None
    isoweek_layers: tuple = ()  # group layers wrapped in isoweek()
    compat_avg: bool = False  # reproduce the reference's AVG quirk (A3)

    def layer_names(self) -> list[str]:
        """Every layer referenced anywhere (dedup, stable order)."""
        names: dict[str, None] = {}
        for g in self.group_layers:
            names.setdefault(g, None)
        for a in self.aggregates:
            if a.layer:
                names.setdefault(a.layer, None)
        for col in self.select_pixels:
            names.setdefault(col, None)

        def walk(f):
            if f is None:
                return
            if isinstance(f, FilterLeaf):
                names.setdefault(f.layer, None)
            else:
                for c in f.children:
                    walk(c)

        walk(self.where)
        if self.base_layer != "data":
            names.setdefault(self.base_layer, None)
        return list(names)
