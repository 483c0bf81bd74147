"""Serialized Operation trees → DataFrame (SURVEY.md §3.2 as data).

The reference's plan API is a nested tree of Operation factories —
``GroupAggregate(projector, spec, opts, ScanView(v))``
(cursor/base/operation.h:35; test/guide/primer.cc:281-286).  This module
deserializes that shape from JSON so WHOLE PLANS ship as data, pairing
with functions.serde (expressions) the way
``BuildExpressionFromProto`` pairs with the proto Operation wrappers.

Node grammar — one ``op`` field plus op-specific fields; ``input`` (or
``inputs``) holds child nodes:

    {"op": "scan", "table": "lineitem"}
    {"op": "filter", "predicate": <expr-json>, "input": {...}}
    {"op": "compute", "exprs": {"out": <expr-json>, ...}, "input": {...}}
    {"op": "project", "columns": ["a", "b"] | {"a": "renamed"}, "input": {...}}
    {"op": "group_aggregate", "keys": [...],
     "aggregations": [{"function": "SUM", "input": "x", "output": "s",
                       "distinct": false}, ...], "input": {...}}
    {"op": "scalar_aggregate", "aggregations": [...], "input": {...}}
    {"op": "sort", "order": [{"column": "a", "ascending": true}],
     "limit": 10, "input": {...}}
    {"op": "limit", "count": 10, "offset": 0, "input": {...}}
    {"op": "hash_join", "on": ["k"], "how": "inner",
     "inputs": [left, right]}
    {"op": "union_all", "inputs": [...]}

Binding errors (unknown op/aggregation, missing table) raise ValueError
at deserialization — the reference's CreateCursor-time failure stage;
schema errors surface from Catalyst when the plan first binds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from supersonic_spark.functions.serde import (
    expression_from_json,
    expressions_from_json,
)
from supersonic_spark.operators import aggregate as _agg
from supersonic_spark.operators import core as _core
from supersonic_spark.operators import join as _join
from supersonic_spark.operators import setops as _setops
from supersonic_spark.operators import sort as _sort
from supersonic_spark.operators.aggregate import AggSpec, Aggregation
from supersonic_spark.operators.sort import SortKey


def _agg_specs(items: list[dict]) -> list[AggSpec]:
    specs = []
    for a in items:
        fname = str(a.get("function", "")).upper()
        try:
            fn = Aggregation[fname]
        except KeyError:
            raise ValueError(
                f"unknown aggregation {fname!r} (one of {[x.name for x in Aggregation]})"
            ) from None
        specs.append(
            AggSpec(
                fn,
                a.get("input"),
                a.get("output") or (a.get("input") or fname.lower()),
                distinct=bool(a.get("distinct", False)),
                output_type=a.get("output_type"),
            )
        )
    return specs


def operation_from_json(
    spark: SparkSession, node: dict, tables: dict[str, DataFrame] | None = None
) -> DataFrame:
    """Deserialize an Operation-tree node (recursively) into a DataFrame.

    ``tables`` resolves scan names; with None, names resolve through the
    session catalog (temp views) — the ScanView analog either way."""

    def child(n=node, key="input"):
        if key not in n:
            raise ValueError(f"{n.get('op')!r} node needs {key!r}")
        return operation_from_json(spark, n[key], tables)

    if not isinstance(node, dict) or "op" not in node:
        raise ValueError(f"operation node needs an 'op' field: {node!r}")
    op = str(node["op"]).lower()

    if op == "scan":
        name = node.get("table")
        if tables is not None:
            if name not in tables:
                raise ValueError(f"unknown table {name!r} (have {sorted(tables)})")
            return tables[name]
        return spark.table(name)
    if op == "filter":
        return _core.filter_op(
            child(), expression_from_json(node["predicate"]), node.get("projector")
        )
    if op == "compute":
        return _core.compute(
            child(), expressions_from_json(node["exprs"]),
            keep_input=bool(node.get("keep_input", False)),
        )
    if op == "project":
        return _core.project(child(), node["columns"])
    if op == "group_aggregate":
        return _agg.group_aggregate(
            child(), list(node.get("keys", [])), _agg_specs(node["aggregations"])
        )
    if op == "scalar_aggregate":
        return _agg.scalar_aggregate(child(), _agg_specs(node["aggregations"]))
    if op == "sort":
        order = [
            SortKey(
                o["column"],
                ascending=bool(o.get("ascending", True)),
                nulls_first=bool(o.get("nulls_first", True)),
                case_insensitive=bool(o.get("case_insensitive", False)),
            )
            for o in node["order"]
        ]
        return _sort.extended_sort(child(), order, limit=node.get("limit"))
    if op == "limit":
        return _core.limit(
            child(), int(node["count"]), offset=int(node.get("offset", 0)),
            order=node.get("order"),
        )
    if op == "hash_join":
        ins = node.get("inputs")
        if not isinstance(ins, list) or len(ins) != 2:
            raise ValueError("hash_join needs exactly 2 inputs")
        left = operation_from_json(spark, ins[0], tables)
        right = operation_from_json(spark, ins[1], tables)
        return _join.hash_join(
            left, right, on=node["on"], how=node.get("how", "inner"),
            unique_right=bool(node.get("unique_right", False)),
            broadcast_right=node.get("broadcast_right"),
        )
    if op == "union_all":
        ins = [operation_from_json(spark, n, tables) for n in node.get("inputs", [])]
        if not ins:
            raise ValueError("union_all needs at least one input")
        return _setops.union_all(ins)

    raise ValueError(f"unknown operation {op!r}")
