"""Property-based (hypothesis) metamorphic checks over the operator layer.

The reference ships no property tests (SURVEY.md §5) — these go beyond it:
random small inputs, invariants that must hold for ANY input.  Examples are
kept low (every example is a Spark job).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st_
from pyspark.sql import functions as F

from supersonic_spark.functions import stateful
from supersonic_spark.operators import core, sort as sort_ops
from supersonic_spark.operators.sort import SortKey
from supersonic_spark.pipeline import dedup

_settings = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,  # stable example set — no fresh examples at CI time
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_strategy = st_.lists(
    st_.tuples(
        st_.integers(min_value=-100, max_value=100),
        st_.one_of(st_.none(), st_.floats(allow_nan=False, allow_infinity=False,
                                          min_value=-1e6, max_value=1e6)),
    ),
    min_size=1,
    max_size=30,
)


@given(rows=rows_strategy)
@_settings
def test_sort_is_permutation_and_ordered(spark, rows):
    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    df = core.scan_view(spark, data, "id long, k int, v double")
    out = sort_ops.extended_sort(df, [SortKey("k"), SortKey("id")]).collect()
    assert sorted(r["id"] for r in out) == list(range(len(data)))  # permutation
    keys = [(r["k"], r["id"]) for r in out]
    assert keys == sorted(keys)  # ordered


@given(rows=rows_strategy)
@_settings
def test_running_sum_matches_prefix_sums(spark, rows):
    data = [(i, v) for i, (_, v) in enumerate(rows)]
    df = core.scan_view(spark, data, "id long, v double")
    out = df.select(
        "id", stateful.running_sum("v", order=["id"], partition=stateful.GLOBAL).alias("rs")
    ).orderBy("id").collect()
    acc, expect = 0.0, []
    any_val = False
    for _, v in data:
        if v is not None:
            acc += v
            any_val = True
        expect.append(acc if any_val else None)
    for r, e in zip(out, expect):
        if e is None:
            assert r["rs"] is None
        else:
            assert abs(r["rs"] - e) < 1e-6 * max(1.0, abs(e))


@given(
    texts=st_.lists(
        st_.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=20
    )
)
@_settings
def test_exact_dedup_idempotent_and_minimal(spark, texts):
    data = [(i, t) for i, t in enumerate(texts)]
    df = core.scan_view(spark, data, "doc_id long, text string")
    once = dedup.exact_dedup(df, ["text"], keep_order="doc_id")
    twice = dedup.exact_dedup(once, ["text"], keep_order="doc_id")
    got_once = sorted(r["doc_id"] for r in once.collect())
    got_twice = sorted(r["doc_id"] for r in twice.collect())
    assert got_once == got_twice  # idempotent
    assert len(got_once) == len(set(texts))  # one survivor per distinct text


asof_strategy = st_.tuples(
    # left: (key, ts) pairs; right: (key, ts, value) triples
    st_.lists(
        st_.tuples(st_.integers(0, 3), st_.integers(0, 50)),
        min_size=1, max_size=20,
    ),
    st_.lists(
        st_.tuples(st_.integers(0, 3), st_.integers(0, 50),
                   st_.floats(allow_nan=False, allow_infinity=False,
                              min_value=-100, max_value=100)),
        min_size=0, max_size=20,
    ),
)


@given(data=asof_strategy)
@_settings
def test_asof_join_matches_bruteforce(spark, data):
    """asof_join(backward) == per-row brute force: the right row with the
    max ts <= left ts for the same key (unique right (key, ts) assumed)."""
    from supersonic_spark.operators import join as join_ops

    left_rows, right_rows = data
    # dedup right on (key, ts) — ties are unordered in any asof definition
    right_rows = list({(k, t): (k, t, v) for k, t, v in right_rows}.values())
    left = core.scan_view(
        spark, [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        "id long, k int, ts int",
    )
    right = core.scan_view(spark, right_rows, "k int, ts int, v double")
    got = {
        r["id"]: (r["ts_right"], r["v"])
        for r in join_ops.asof_join(
            left, right, ["k"], "ts", "ts", ["v"]
        ).collect()
    }
    for i, (k, t) in enumerate(left_rows):
        cands = [(rt, rv) for rk, rt, rv in right_rows if rk == k and rt <= t]
        expect = max(cands, key=lambda x: x[0]) if cands else (None, None)
        assert got[i] == expect, f"row {i} key {k} ts {t}"


@given(
    rows=st_.lists(
        st_.tuples(st_.integers(min_value=0, max_value=5),
                   st_.integers(min_value=-50, max_value=50)),
        min_size=1, max_size=25,
    ),
    buckets=st_.sampled_from([2, 3, 8]),
)
@_settings
def test_salted_join_equals_plain_join(spark, rows, buckets):
    """Salting is a pure plan-shape transform: for ANY input and bucket
    count the salted join's multiset of rows equals the plain join's."""
    from supersonic_spark.operators.aggregate import salted_join

    left = core.scan_view(
        spark, [(i, k, v) for i, (k, v) in enumerate(rows)], "id long, k int, v int"
    )
    right = core.scan_view(
        spark, [(k, f"r{k}") for k in range(6)], "k int, tag string"
    )
    got = sorted(
        (r["id"], r["tag"]) for r in salted_join(left, right, on=["k"],
                                                 salt_buckets=buckets).collect()
    )
    want = sorted((r["id"], r["tag"]) for r in left.join(right, "k").collect())
    assert got == want


@given(rows=rows_strategy)
@_settings
def test_window_navigation_lag_lead_inverse(spark, rows):
    """lead(x) at row i equals x at row i+1 under the same total order, and
    lag is its inverse; ntile buckets are monotone in the order."""
    from supersonic_spark.operators.analytics import window_navigation

    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    df = core.scan_view(spark, data, "id long, k int, v double")
    out = window_navigation(
        df, partition=F.lit(1), order="id",
        exprs={"nxt": F.lead("v"), "prv": F.lag("v"), "q": F.ntile(3)},
    ).orderBy("id").collect()
    vals = [r["v"] for r in out]
    for i, r in enumerate(out):
        assert r["nxt"] == (vals[i + 1] if i + 1 < len(vals) else None)
        assert r["prv"] == (vals[i - 1] if i > 0 else None)
    qs = [r["q"] for r in out]
    assert qs == sorted(qs)


# --- wire-format round trip: text format ↔ JSON grammar (no Spark) ---

_json_expr = st_.deferred(
    lambda: st_.one_of(
        st_.builds(lambda n: {"variable": n},
                   st_.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)),
        st_.builds(lambda v: {"constant": {"type": "INT64", "value": v}},
                   st_.integers(min_value=-(2**62), max_value=2**62)),
        st_.builds(lambda v: {"constant": {"type": "STRING", "value": v}},
                   st_.text(alphabet=st_.characters(codec="utf-8",
                                                    exclude_categories=("Cs", "Cc")),
                            max_size=12)),
        st_.builds(lambda v: {"constant": {"type": "BOOL", "value": v}}, st_.booleans()),
        st_.builds(
            lambda op, args: {"operation": {"operator": op, "arguments": args}},
            st_.sampled_from(["PLUS", "MULTIPLY", "AND", "EQUAL", "CONCATENATE"]),
            st_.lists(_json_expr, min_size=1, max_size=3),
        ),
    )
)


def _render_textproto(node: dict) -> str:
    """JSON grammar → protobuf text format (test-local encoder)."""
    if "variable" in node:
        return 'type: VARIABLE variable { name: "%s" }' % node["variable"]
    if "constant" in node:
        t, v = node["constant"]["type"], node["constant"]["value"]
        field = {"INT64": "int64_value", "STRING": "string_value",
                 "BOOL": "bool_value"}[t]
        if t == "STRING":
            esc = v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
            lit = '"%s"' % esc
        elif t == "BOOL":
            lit = "true" if v else "false"
        else:
            lit = str(v)
        return "type: CONSTANT constant { type: %s %s: %s }" % (t, field, lit)
    op = node["operation"]
    args = " ".join(
        "argument { %s }" % _render_textproto(a) for a in op["arguments"]
    )
    # reference enum spelling for the serde alias exercised most
    name = {"PLUS": "ADD"}.get(op["operator"], op["operator"])
    return "type: OPERATION operation { type: %s %s }" % (name, args)


@given(tree=_json_expr)
@settings(max_examples=60, deadline=None)
def test_textproto_roundtrips_to_json_grammar(tree):
    """Render any expression tree to text format, parse it back, and the
    mapped JSON must equal the original (modulo the ADD→PLUS enum alias,
    which the shared deserializer resolves to the same operator)."""
    from supersonic_spark.functions.textproto import (
        description_to_json,
        parse_text_format,
    )

    got = description_to_json(parse_text_format(_render_textproto(tree)))

    def canon(n):
        if "operation" in n:
            o = n["operation"]
            name = {"ADD": "PLUS"}.get(o["operator"], o["operator"])
            return {"operation": {"operator": name,
                                  "arguments": [canon(a) for a in o["arguments"]]}}
        return n

    assert canon(got) == canon(tree)


def _render_binproto(node: dict) -> bytes:
    """JSON grammar → binary proto wire bytes (test-local encoder)."""
    def varint(n):
        if n < 0:
            n += 1 << 64
        out = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            out.append(b | 0x80 if n else b)
            if not n:
                return bytes(out)

    def field(fno, wt, payload):
        return varint((fno << 3) | wt) + payload

    def msg(fno, body):
        return field(fno, 2, varint(len(body)) + body)

    if "variable" in node:
        name = node["variable"].encode()
        return field(1, 0, varint(1)) + msg(3, field(1, 2, varint(len(name)) + name))
    if "constant" in node:
        t, v = node["constant"]["type"], node["constant"]["value"]
        if t == "INT64":
            body = field(1, 0, varint(2)) + field(3, 0, varint(v))
        elif t == "BOOL":
            body = field(1, 0, varint(6)) + field(8, 0, varint(int(v)))
        else:  # STRING
            enc = v.encode()
            body = field(1, 0, varint(0)) + field(12, 2, varint(len(enc)) + enc)
        return field(1, 0, varint(0)) + msg(2, body)
    op = node["operation"]
    nums = {"PLUS": 0, "ADD": 0, "MULTIPLY": 1, "AND": 5, "EQUAL": 8,
            "CONCATENATE": 157}
    body = field(1, 0, varint(nums[op["operator"]]))
    for a in op["arguments"]:
        body += msg(2, _render_binproto(a))
    return field(1, 0, varint(2)) + msg(4, body)


@given(tree=_json_expr)
@settings(max_examples=60, deadline=None)
def test_binaryproto_roundtrips_to_json_grammar(tree):
    """Binary wire bytes for any generated expression tree parse back to
    the original JSON grammar (modulo the ADD→PLUS enum alias)."""
    from supersonic_spark.functions.textproto import (
        _DESC_WIRE,
        _parse_wire_message,
        description_to_json,
    )

    got = description_to_json(_parse_wire_message(_render_binproto(tree), _DESC_WIRE))

    def canon(n):
        if "operation" in n:
            o = n["operation"]
            name = {"ADD": "PLUS"}.get(o["operator"], o["operator"])
            return {"operation": {"operator": name,
                                  "arguments": [canon(a) for a in o["arguments"]]}}
        return n

    assert canon(got) == canon(tree)
