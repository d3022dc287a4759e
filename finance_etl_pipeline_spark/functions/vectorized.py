"""Scalar Pandas UDF template — the Arrow-batched escape hatch for
logic that genuinely cannot be a built-in expression.

Rule of thumb this module demonstrates (SURVEY.md §4 / SCALE.md):
anything expressible with `pyspark.sql.functions` should BE an
expression (JVM codegen, no serialization).  When Python is
unavoidable — a compiled scoring model, a tokenizer, a third-party
lib — a *scalar pandas_udf* receives whole Arrow batches as
pandas Series and vectorizes inside, which is 10-100× faster than a
row-at-a-time `udf()`.  The function below is deliberately also
expressible as an expression so the test can prove the two paths
agree bit-for-bit; swap the body for a real model call and the
plumbing stays identical."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# logistic risk score: sigma(w0 + w1*log1p(value))
_W0, _W1 = -2.0, 0.8


# returnType as a DataType object (not a DDL string): the string form
# is parsed through the active SparkContext at decoration time, which
# breaks importing this module before a session exists
@pandas_udf(DoubleType())
def risk_score_udf(value: pd.Series) -> pd.Series:
    """Vectorized inside the batch: numpy over the whole Series, one
    Arrow roundtrip per ~10k rows instead of one Python call per row."""
    z = _W0 + _W1 * np.log1p(value.to_numpy())
    return pd.Series(1.0 / (1.0 + np.exp(-z)))


def risk_score_expr(value: Column) -> Column:
    """The same math as a JVM-side expression — the form to PREFER
    whenever the logic is expressible; kept in lockstep with the UDF
    by tests/test_diff_and_udf.py."""
    z = F.lit(_W0) + F.lit(_W1) * F.log1p(value)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
