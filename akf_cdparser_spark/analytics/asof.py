"""As-of join — a custom operator Spark lacks natively (see the OLAP
pattern list: bucketize+filter, or applyInPandas with merge_asof).

Implementation: cogrouped ``applyInPandas`` with ``pd.merge_asof`` per key
group — the shuffle is one hash partition per key column (same as any
equi-join); within a group the merge is a linear two-pointer pass over
time-sorted Arrow batches. At 100 TB the key-group model is exactly how a
cluster executes it: co-partition both sides on the key, merge locally.

Exactness: DuckDB has a native ASOF JOIN, so this operator is oracle-checked
value-for-value (plans/queries.py q19)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              right_value_cols: list[str], suffix: str = "_right") -> DataFrame:
    """For each left row, attach the right row with the greatest ``on`` value
    <= the left's ``on``, within the same ``by`` group (backward as-of)."""
    out_fields = list(left.schema.fields)
    right_schema = {f.name: f.dataType for f in right.schema.fields}
    for c in [on] + right_value_cols:
        out_fields.append(T.StructField(c + suffix, right_schema[c], True))
    out_schema = T.StructType(out_fields)
    left_cols = [f.name for f in left.schema.fields]

    out_cols = left_cols + [c + suffix for c in [on] + right_value_cols]

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        keep = [on] + right_value_cols
        if l_pdf.empty:  # cogroup hands a column-less frame for absent sides
            return pd.DataFrame(columns=out_cols)
        l_sorted = l_pdf.sort_values(on, kind="mergesort")
        if r_pdf.empty or on not in r_pdf.columns:
            out = l_sorted.copy()
            for c in keep:
                out[c + suffix] = None
        else:
            r_sorted = (r_pdf[keep].sort_values(on, kind="mergesort")
                        .rename(columns={c: c + suffix for c in keep}))
            out = pd.merge_asof(l_sorted, r_sorted,
                                left_on=on, right_on=on + suffix,
                                direction="backward")
        return out[out_cols]

    return (left.groupBy(by).cogroup(right.groupBy(by))
            .applyInPandas(lambda lk, rk: merge(lk, rk), out_schema)
            .select(*left_cols, *[c + suffix for c in [on] + right_value_cols]))
