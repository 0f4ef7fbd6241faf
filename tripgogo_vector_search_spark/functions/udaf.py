"""Arrow-batched custom aggregates (pandas GROUPED_AGG surface).

NO ``from __future__ import annotations`` here, deliberately: PySpark's
type-hint eval-type inference (`pyspark.sql.pandas.typehints`) resolves
the hints against this module's globals, so ``pd.Series`` must be a real
(non-stringified) annotation with ``pd`` importable at module scope.
This replaces the deprecated ``PandasUDFType.GROUPED_AGG`` enum form.
"""

import pandas as pd

from pyspark.sql import functions as F


def weighted_mean_cents():
    """GROUPED_AGG pandas UDF: weighted mean over integer cents × integer
    weights. Accumulation is exact integer arithmetic, so the result is
    independent of row order within the group; the single float division
    happens once at the end. Executes as an Arrow-batched aggregate node
    (ArrowAggregatePython), never row-at-a-time Python. The (Series,
    Series) -> float hints make PySpark infer SQL_GROUPED_AGG_PANDAS_UDF
    — the supported successor of PandasUDFType.GROUPED_AGG."""

    @F.pandas_udf("double")
    def wavg(cents: pd.Series, w: pd.Series) -> float:
        num = int((cents * w).sum())
        den = int(w.sum())
        return num / den / 100.0

    return wavg
