"""Projector algebra — base/infrastructure/projector.h:188-381.

The reference threads declarative column-selection objects
(SingleSourceProjector) through every operator: ProjectNamedAttribute (:363),
ProjectAttributeAt (:376), ProjectRename (:347), ProjectAllAttributes, and
compound concatenation.  Spark's select-list is the same idea; this module
gives it the reference's composable shape so operator signatures line up.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Projector:
    """A composable column selector: resolves to a list of Columns against a
    DataFrame (≈ BoundSingleSourceProjector)."""

    items: list = field(default_factory=list)  # each: callable(df) -> list[Column]

    def columns(self, df: DataFrame) -> list[Column]:
        out: list[Column] = []
        for item in self.items:
            out.extend(item(df))
        return out

    def apply(self, df: DataFrame) -> DataFrame:
        return df.select(*self.columns(df))

    def __add__(self, other: "Projector") -> "Projector":
        return Projector(self.items + other.items)


def project_named_attribute(*names: str) -> Projector:
    """projector.h:363 — select by name (also the n-ary ProjectNamedAttributes)."""
    return Projector([lambda df, ns=names: [F.col(n) for n in ns]])


def project_attribute_at(*positions: int) -> Projector:
    """projector.h:376 — positional selection."""
    return Projector([lambda df, ps=positions: [F.col(df.columns[p]) for p in ps]])


def project_rename(mapping: dict[str, str]) -> Projector:
    """projector.h:347 — select+rename {source_name: new_name}."""
    return Projector(
        [lambda df, m=mapping: [F.col(src).alias(dst) for src, dst in m.items()]]
    )


def project_all_attributes(prefix: str = "") -> Projector:
    """ProjectAllAttributes([prefix]) — everything, optionally prefixed
    (used to disambiguate join sides, projector.h)."""
    return Projector(
        [lambda df, p=prefix: [F.col(c).alias(p + c) for c in df.columns]]
    )


def as_projector(spec) -> Projector:
    """Coerce user-friendly specs: Projector | list[str] | dict[str,str] | None."""
    if spec is None:
        return project_all_attributes()
    if isinstance(spec, Projector):
        return spec
    if isinstance(spec, dict):
        return project_rename(spec)
    if isinstance(spec, (list, tuple)):
        items: list = []
        for s in spec:
            if isinstance(s, str):
                items.append(lambda df, n=s: [F.col(n)])
            elif isinstance(s, Column):
                items.append(lambda df, c=s: [c])
            else:
                raise TypeError(f"bad projector element: {s!r}")
        return Projector(items)
    raise TypeError(f"bad projector spec: {spec!r}")
