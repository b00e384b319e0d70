"""Layer catalog — the engine's "data environment".

Reimplements the reference's request-supplied layer schema
(data_environment.py:30-100 semantics; see SURVEY.md section 1.2):

- ``SourceLayer``  — a stored raster layer: tiles live as rows of the
  images table with ``image_id = f"{name}/{cell_id:016x}"``. Carries
  NoData, an optional categorical ``raster_table`` (raw value -> meaning,
  plus optional ``default_meaning``), optional encode/decode expressions
  (e.g. packed dates), a grid name, and a pixel dtype.
- ``DerivedLayer`` — computed from a source layer by a whitelisted calc
  expression (``A % 10000``, ``where(A > 0, area, 0)`` ...).
- ``ReservedLayer`` — computed, never read: ``area__ha``, ``latitude``,
  ``longitude``.

Plus the implicit ``__ha`` rule: any queried ``<prefix>__ha`` matching a
source layer ``<prefix>__<suffix>`` auto-derives
``calc = "where(A > 0, area, 0)"`` (reference data_environment.py:91-100).

Filter-literal encoding (reference P5, query.py:268-279): a predicate on a
categorical layer is translated *at plan time* from meaning space to raw
pixel space, possibly to a set of raw values OR-ed together
(``threshold >= 30`` on a binned table -> ``raw IN (5, 6, 7)``).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from typing import Union

import numpy as np

from ..functions.expressions import compile_expression

AREA_HA = "area__ha"
LATITUDE = "latitude"
LONGITUDE = "longitude"
FROM_DATA = "data"  # FROM data = no base-layer mask (reference query.py:179-180)

RESERVED_LAYERS = (AREA_HA, LATITUDE, LONGITUDE)


@dataclass(frozen=True)
class SourceLayer:
    name: str
    grid: str = "4/1024"
    dtype: str = "uint8"
    no_data: float | None = 0.0  # None => everything is data; nan allowed
    fmt: str = "png"
    raster_table: dict[int, Union[str, int, float]] | None = None
    default_meaning: Union[str, int, float, None] = None
    decode_expression: str | None = None
    encode_expression: str | None = None

    @property
    def kind(self) -> str:
        return "source"


@dataclass(frozen=True)
class DerivedLayer:
    """Computed from a source layer by a whitelisted calc expression. May
    carry its own value encoding (e.g. the packed alert date derives as
    ``A % 10000`` and decodes days-since-2015 to date strings)."""

    name: str
    source_layer: str
    calc: str
    no_data: float | None = 0.0
    raster_table: dict[int, Union[str, int, float]] | None = None
    default_meaning: Union[str, int, float, None] = None
    decode_expression: str | None = None
    encode_expression: str | None = None

    @property
    def kind(self) -> str:
        return "derived"


@dataclass(frozen=True)
class MultiDerivedLayer:
    """Raster map algebra across SEVERAL co-registered source layers:
    ``calc`` names them positionally A, B, C, ... in ``source_layers``
    order (e.g. ``"(A - B) / (A + B)"``). Beyond the reference (its
    DerivedLayer reads exactly one source, data_environment.py:63-66);
    layers on different grids co-register to the finest grid in the
    kernel like any multi-grid query. ``dtype`` declares the RESULT type
    (a ratio of int layers is float) so NaN-aware aggregation applies."""

    name: str
    source_layers: tuple
    calc: str
    dtype: str = "float64"
    no_data: float | None = 0.0
    raster_table: dict[int, Union[str, int, float]] | None = None
    default_meaning: Union[str, int, float, None] = None
    decode_expression: str | None = None
    encode_expression: str | None = None

    @property
    def kind(self) -> str:
        return "multi_derived"


@dataclass(frozen=True)
class ReservedLayer:
    name: str

    @property
    def kind(self) -> str:
        return "reserved"


Layer = Union[SourceLayer, DerivedLayer, MultiDerivedLayer, ReservedLayer]

# layer kinds that carry value encodings (raster_table / expressions)
_VALUE_LAYERS = (SourceLayer, DerivedLayer, MultiDerivedLayer)


class LayerNotFoundError(KeyError):
    pass


@dataclass
class DataEnvironment:
    layers: list[Layer] = field(default_factory=list)
    # opt-in fault tolerance: a tile whose payload fails to decode is
    # treated like a MISSING tile (zeros / S2 semantics) instead of
    # failing the whole analysis — the reference's per-tile-Lambda
    # failure isolation (a bad tile fails one invocation, not the
    # request). Default False: corrupt data raises loudly.
    skip_corrupt_tiles: bool = False

    def __post_init__(self):
        self._by_name = {l.name: l for l in self.layers}
        for r in RESERVED_LAYERS:
            self._by_name.setdefault(r, ReservedLayer(r))

    # -- resolution ---------------------------------------------------------
    def get_layer(self, name: str) -> Layer:
        layer = self._by_name.get(name)
        if layer is not None:
            return layer
        # implicit __ha derivation (reference data_environment.py:91-100)
        if name.endswith("__ha"):
            prefix = name[: -len("__ha")]
            for cand in self.layers:
                if isinstance(cand, SourceLayer) and (
                    cand.name.startswith(prefix + "__") or cand.name.startswith(prefix + "_")
                ):
                    derived = DerivedLayer(
                        name=name, source_layer=cand.name, calc="where(A > 0, area, 0)"
                    )
                    self._by_name[name] = derived
                    return derived
        raise LayerNotFoundError(name)

    def has_layer(self, name: str) -> bool:
        try:
            self.get_layer(name)
            return True
        except LayerNotFoundError:
            return False

    def resolve_source(self, name: str) -> SourceLayer | None:
        """The stored layer a queried name ultimately reads (None for
        reserved layers)."""
        layer = self.get_layer(name)
        if isinstance(layer, ReservedLayer):
            return None
        if isinstance(layer, MultiDerivedLayer):
            # the FIRST source stands in where one stored layer is needed
            # (dtype decisions use the layer's own declared dtype instead)
            srcs = self.resolve_sources(name)
            return srcs[0]
        if isinstance(layer, DerivedLayer):
            src = self.get_layer(layer.source_layer)
            if not isinstance(src, SourceLayer):
                raise ValueError(f"derived layer {name} source {layer.source_layer} is not a source layer")
            return src
        return layer

    def resolve_sources(self, name: str) -> "list[SourceLayer]":
        """ALL stored layers a queried name reads (multi-derived layers
        read several; everything else 0 or 1)."""
        layer = self.get_layer(name)
        if isinstance(layer, MultiDerivedLayer):
            out = []
            for s in layer.source_layers:
                src = self.get_layer(s)
                if not isinstance(src, SourceLayer):
                    raise ValueError(
                        f"multi-derived layer {name} source {s} is not a source layer"
                    )
                out.append(src)
            if not out:
                raise ValueError(f"multi-derived layer {name} has no sources")
            return out
        src = self.resolve_source(name)
        return [] if src is None else [src]

    def source_layer_names(self, names: list[str]) -> list[str]:
        """Unique stored-layer names needed to evaluate ``names`` (column
        pruning — only these are scanned; reference query.py:169-182)."""
        out: dict[str, None] = {}
        for n in names:
            for src in self.resolve_sources(n):
                out.setdefault(src.name, None)
        return list(out)

    # -- literal encode / value decode (categorical + expression) -----------
    def encode_filter_literal(self, layer_name: str, op: str, value) -> tuple[str, list]:
        """Translate a predicate from meaning space to raw pixel space.

        Returns ``(op, values)`` where op is either the original comparison
        with a single raw value, or ``"in"`` with the raw values whose
        meaning satisfies the predicate (reference
        data_environment.py:142-166; query.py:272-279).
        """
        layer = self.get_layer(layer_name)
        if isinstance(layer, _VALUE_LAYERS):
            if layer.raster_table:
                raws = [
                    raw
                    for raw, meaning in layer.raster_table.items()
                    if _cmp(meaning, op, value)
                ]
                return "in", sorted(raws)
            if layer.encode_expression:
                fn = compile_expression(layer.encode_expression)
                return op, [_to_scalar(fn(value))]
        return op, [value]

    def decode_values(self, layer_name: str, values: np.ndarray):
        """Raw group values -> meanings, applied *after* aggregation
        (reference tiling.py:95-98; data_environment.py:168-181)."""
        layer = self.get_layer(layer_name)
        if not isinstance(layer, _VALUE_LAYERS):
            return values
        if layer.raster_table:
            table = layer.raster_table
            default = layer.default_meaning
            return np.asarray(
                [table.get(int(v), default if default is not None else v) for v in values],
                dtype=object,
            )
        if layer.decode_expression:
            return compile_expression(layer.decode_expression)(values)
        return values

    def keeps_nodata_groups(self, layer_name: str) -> bool:
        """A GROUP BY layer with a default-valued encoding keeps its NoData
        value as a real group (reference data_environment.py:215-222;
        exercised test_raster_analysis.py:573-595)."""
        layer = self.get_layer(layer_name)
        return (
            isinstance(layer, _VALUE_LAYERS)
            and layer.default_meaning is not None
        )

    def nodata_of(self, name: str) -> float | None:
        layer = self.get_layer(name)
        if isinstance(layer, ReservedLayer):
            return None
        return layer.no_data

    # -- (de)serialization ---------------------------------------------------
    def to_json(self) -> str:
        out = []
        for l in self.layers:
            d = {"kind": l.kind, "name": l.name}
            if isinstance(l, SourceLayer):
                d.update(
                    grid=l.grid, dtype=l.dtype, fmt=l.fmt,
                    no_data=("nan" if l.no_data is not None and isinstance(l.no_data, float) and math.isnan(l.no_data) else l.no_data),
                    raster_table=l.raster_table, default_meaning=l.default_meaning,
                    decode_expression=l.decode_expression, encode_expression=l.encode_expression,
                )
            elif isinstance(l, DerivedLayer):
                d.update(
                    source_layer=l.source_layer, calc=l.calc, no_data=l.no_data,
                    raster_table=l.raster_table, default_meaning=l.default_meaning,
                    decode_expression=l.decode_expression, encode_expression=l.encode_expression,
                )
            elif isinstance(l, MultiDerivedLayer):
                d.update(
                    source_layers=list(l.source_layers), calc=l.calc,
                    dtype=l.dtype,
                    no_data=("nan" if l.no_data is not None and isinstance(l.no_data, float) and math.isnan(l.no_data) else l.no_data),
                    raster_table=l.raster_table, default_meaning=l.default_meaning,
                    decode_expression=l.decode_expression, encode_expression=l.encode_expression,
                )
            out.append(d)
        if self.skip_corrupt_tiles:
            out.append({"kind": "options", "skip_corrupt_tiles": True})
        return json.dumps(out)

    @classmethod
    def from_json(cls, s: str) -> "DataEnvironment":
        layers: list[Layer] = []
        opts: dict = {}
        for d in json.loads(s):
            kind = d.pop("kind")
            if kind == "options":
                opts.update(d)
                continue
            if kind == "source":
                nd = d.get("no_data")
                if nd == "nan":  # reference pydantic validator semantics
                    d["no_data"] = float("nan")
                rt = d.get("raster_table")
                if rt:
                    d["raster_table"] = {int(k): v for k, v in rt.items()}
                layers.append(SourceLayer(**d))
            elif kind == "derived":
                rt = d.get("raster_table")
                if rt:
                    d["raster_table"] = {int(k): v for k, v in rt.items()}
                layers.append(DerivedLayer(**d))
            elif kind == "multi_derived":
                if d.get("no_data") == "nan":
                    d["no_data"] = float("nan")
                rt = d.get("raster_table")
                if rt:
                    d["raster_table"] = {int(k): v for k, v in rt.items()}
                d["source_layers"] = tuple(d["source_layers"])
                layers.append(MultiDerivedLayer(**d))
            elif kind == "reserved":
                layers.append(ReservedLayer(**d))
        return cls(layers, **opts)


def _cmp(meaning, op: str, value) -> bool:
    if op == "==":
        return meaning == value or str(meaning) == str(value)
    if op == "!=":
        return meaning != value and str(meaning) != str(value)
    try:
        m, v = float(meaning), float(value)
    except (TypeError, ValueError):
        return False
    return {"<": m < v, "<=": m <= v, ">": m > v, ">=": m >= v}[op]


def _to_scalar(x):
    arr = np.asarray(x)
    return arr.item() if arr.ndim == 0 else arr.ravel()[0].item()
