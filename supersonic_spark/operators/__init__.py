"""Operator inventory (SURVEY.md §2.2-2.6; CursorId enum
cursor/proto/cursors.proto:13-62) as DataFrame→DataFrame functions.

- ``core``      — ScanView, Generate, Project, Compute, Filter, Limit
- ``projector`` — SingleSourceProjector algebra (named/positional/rename)
- ``aggregate`` — GroupAggregate / ScalarAggregate / with-limit variant
- ``sort``      — Sort / ExtendedSort / SortOrder
- ``join``      — HashJoin, RowidMergeJoin, ForeignFilter
- ``setops``    — MergeUnionAll, Coalesce (positional zip), Splitter
- ``rowid``     — scalable contiguous row-id assignment (ordering discipline)

Composition style matches the reference's Operation trees (operation.h:35):
each function returns a lazy DataFrame ≈ an Operation whose CreateCursor is
Spark's plan/execute."""

from supersonic_spark.operators.projector import (
    Projector,
    project_all_attributes,
    project_attribute_at,
    project_named_attribute,
    project_rename,
)

__all__ = [
    "Projector",
    "project_all_attributes",
    "project_attribute_at",
    "project_named_attribute",
    "project_rename",
]
