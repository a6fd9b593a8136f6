"""Relational helpers used by the query surface (SURVEY.md §2.5 A1/A5).

The groupby pattern here is always *partial-then-final*: per-batch combine
inside ``map_batches`` (pyarrow ``Table.group_by``) shrinks each batch to one
row per key before the all-to-all ``Dataset.groupby`` — at 100 TB the shuffle
moves partials, not rows.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data.aggregate import Sum


def partial_groupby_sum(
    ds,
    keys: list[str],
    sum_cols: list[str],
    count_alias: str | None = None,
):
    """groupby(keys) with per-batch pre-aggregation.

    Returns a Dataset with columns ``keys + sum_cols (+ count_alias)`` where
    sums keep their input names.
    """

    def partial(batch: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_cols]
        if count_alias:
            aggs.append((keys[0], "count"))
        out = batch.group_by(keys).aggregate(aggs)
        renames = {f"{c}_sum": c for c in sum_cols}
        if count_alias:
            renames[f"{keys[0]}_count"] = count_alias
        return out.rename_columns([renames.get(n, n) for n in out.schema.names])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    if count_alias:
        aggs.append(Sum(count_alias, alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)
