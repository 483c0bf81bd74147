"""DOT-graph plan visualization — benchmark/dot/dot_drawer.h parity.

The reference renders its cursor tree (with per-cursor benchmark stats)
as a Graphviz digraph.  Spark's plan trees carry the same information;
this walks the optimized/executed SparkPlan via py4j and emits a DOT
string — pipe to ``dot -Tsvg`` or paste into any Graphviz viewer.

Usage::

    from supersonic_spark.plans.dot import plan_to_dot
    print(plan_to_dot(df))                 # executed (physical) plan
    print(plan_to_dot(df, which="optimized"))  # optimized logical plan
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def _label(node, max_len: int) -> str:
    """Node label: operator name + a truncated one-line detail string."""
    name = node.nodeName()
    try:
        detail = node.simpleString(max_len)
    except Exception:
        detail = name
    detail = " ".join(str(detail).split())
    if detail.startswith(name):
        detail = detail[len(name):].strip()
    if len(detail) > max_len:
        detail = detail[: max_len - 1] + "…"
    return f"{name}\\n{_escape(detail)}" if detail else name


def plan_to_dot(df: DataFrame, which: str = "executed", max_label: int = 60) -> str:
    """Render a DataFrame's plan tree as a Graphviz DOT digraph.

    ``which``: "executed" (physical, post-AQE-prepare), "sparkPlan"
    (physical, pre-prepare), "optimized" or "analyzed" (logical).
    Pure driver-side tree walk — no job runs.
    """
    qe = df._jdf.queryExecution()
    root = {
        "executed": qe.executedPlan,
        "sparkPlan": qe.sparkPlan,
        "optimized": qe.optimizedPlan,
        "analyzed": qe.analyzed,
    }.get(which)
    if root is None:
        raise ValueError(f"which must be executed|sparkPlan|optimized|analyzed, got {which!r}")
    root = root()

    lines = [
        "digraph plan {",
        "  rankdir=BT;",  # leaves (scans) at the bottom, like the reference
        '  node [shape=box, fontname="monospace", fontsize=10];',
    ]
    counter = [0]

    def kids_of(node):
        """Children, looking through wrapper nodes that hide their input:
        AdaptiveSparkPlan keeps the live tree in inputPlan, QueryStage /
        ReusedExchange keep theirs in plan/child accessors."""
        kids = node.children()
        if kids.length() == 0:
            for accessor in ("inputPlan", "plan", "child"):
                try:
                    inner = getattr(node, accessor)()
                    if inner is not None:
                        return [inner]
                except Exception:
                    continue
        return [kids.apply(i) for i in range(kids.length())]

    def walk(node) -> int:
        nid = counter[0]
        counter[0] += 1
        lines.append(f'  n{nid} [label="{_label(node, max_label)}"];')
        for kid in kids_of(node):
            cid = walk(kid)
            lines.append(f"  n{cid} -> n{nid};")
        return nid

    walk(root)
    lines.append("}")
    return "\n".join(lines)
