"""User-defined function surface (the extensibility story).

The reference has NO runtime UDF/UDAF mechanism — extensibility is
compile-time C++ (add an OperatorId + traits specialization; the
CustomFunctionCall proto hook is unimplemented, utils/proto/
expressions.proto:254-257).  This engine's equivalent surface is Python,
with the native-function-first rule (SURVEY.md §2.7): reach for a UDF only
when no builtin Column expression exists, and then ALWAYS the Arrow-batched
pandas form — row-at-a-time Python UDFs are 10-100× slower and are
deliberately not wrapped here.

- :func:`vectorized` — scalar pandas UDF from a Series→Series function.
- :func:`grouped_agg` — pandas UDAF (Series→scalar), usable in groupBy/agg
  and windows; Spark evaluates it per group after the normal partial-agg
  shuffle on the group keys.
- :func:`geomean` — a worked UDAF example (geometric mean), oracle-checked
  in the query catalog against exp(avg(ln(x))).
"""

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def vectorized(return_type):
    """Decorator: Arrow-batched scalar UDF.  ``fn`` receives/returns
    ``pandas.Series`` (one Arrow batch per call).  Use only when no builtin
    expression exists — builtins stay in whole-stage codegen, this doesn't.
    """
    from pyspark.sql.functions import pandas_udf

    def deco(fn):
        return pandas_udf(return_type)(fn)

    return deco


def grouped_agg(return_type):
    """Decorator: Arrow-batched aggregating UDF (pandas UDAF).  ``fn``
    receives a ``pandas.Series`` of one group's values and returns a
    scalar.  Works in ``groupBy(...).agg(...)`` and unbounded windows.

    Scale note: the group's values materialize in one executor's memory —
    fine for bounded groups; for unbounded/skewed keys pre-reduce with
    builtins first.

    The wrapped function MUST carry ``pd.Series -> scalar`` type hints —
    that is how pyspark classifies it as a grouped-agg (vs scalar) UDF."""
    from pyspark.sql.functions import pandas_udf

    def deco(fn):
        return pandas_udf(return_type)(fn)

    return deco


def ngram_udtf(n: int = 3):
    """Table-function surface (UDTF — rows in, TABLE out), completing the
    extensibility trio (scalar UDF / UDAF / UDTF) the reference lacks at
    runtime.  Emits each word ``n``-gram of ``text`` with its position:

        spark.udtf.register("ngrams", ngram_udtf(3))
        SELECT d.doc_id, t.pos, t.ngram FROM documents d,
               LATERAL ngrams(d.text) t

    Tokenization is whitespace-split of the trimmed text (same rule as
    pipeline.textstats.tokens); texts with < n words emit nothing.  Scale
    note: UDTFs evaluate row-at-a-time in Python — use for genuinely
    table-shaped logic; the JVM-side posexplode pipelines (e.g.
    textstats.chunk_documents) stay the hot path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, ngram string")
    class NGrams:
        def eval(self, text: str):
            words = text.split() if text else []
            for i in range(len(words) - n + 1):
                yield i, " ".join(words[i : i + n])

    return NGrams


def geomean(col) -> Column:
    """Geometric mean UDAF example: exp(mean(ln(x))) over positive values,
    NULL if the group has none.  The catalog query ``udaf_geomean`` pins it
    against the SQL identity exp(avg(ln(x)))."""
    import numpy as np

    @grouped_agg("double")
    def _geomean(v: pd.Series) -> float:
        x = pd.to_numeric(v, errors="coerce").dropna()
        x = x[x > 0]
        if len(x) == 0:
            return None
        return float(np.exp(np.mean(np.log(x.to_numpy(dtype="float64")))))

    c = F.col(col) if isinstance(col, str) else col
    return _geomean(c)
