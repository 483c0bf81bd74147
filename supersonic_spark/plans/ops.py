"""Operation-tree composition — the reference's Operation nesting
(operation.h:35; e.g. GroupAggregate(spec, Filter(pred, ScanView(v))),
primer.cc:281-286) as Python function composition.

A ``Pipeline`` is an ordered list of DataFrame→DataFrame stages; applying
it to a source builds the logical plan (bind ≈ Spark analysis, execute ≈
actions).  It exists for users porting Operation-tree code: DataFrames
compose natively, so this is sugar, not machinery.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

Stage = Callable[[DataFrame], DataFrame]


@dataclass
class Pipeline:
    stages: list[Stage] = field(default_factory=list)

    def then(self, stage: Stage) -> "Pipeline":
        return Pipeline(self.stages + [stage])

    def apply(self, df: DataFrame) -> DataFrame:
        """≈ Operation::CreateCursor over the child (operation.h:57-62):
        binding errors (missing columns, type mismatches) surface here as
        AnalysisException — analysis-time, like the reference's bind."""
        for s in self.stages:
            df = s(df)
        return df

    __call__ = apply
