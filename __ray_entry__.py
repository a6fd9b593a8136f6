"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pages→parse→pairs pipeline on a deterministic
synthetic corpus sized like sf0.001. ``queries()`` exposes each implemented
operator over the driver's parquet tables; ``oracle_sql()`` carries the
DuckDB-equivalent SQL (column names match exactly).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def _ship_package_by_value() -> None:
    """Ray workers don't inherit the driver's sys.path; register the whole
    package for cloudpickle by-value so actor classes deserialize anywhere
    (no runtime_env, no install step)."""
    import importlib
    import pkgutil

    import ray.cloudpickle as cp

    import akf_cdparser_ray

    cp.register_pickle_by_value(akf_cdparser_ray)
    for info in pkgutil.walk_packages(akf_cdparser_ray.__path__, "akf_cdparser_ray."):
        try:
            cp.register_pickle_by_value(importlib.import_module(info.name))
        except ImportError:
            pass


_ship_package_by_value()


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale: synthetic Aktienführer pages →
    actor-pool parse → image+caption pairs Dataset."""
    from akf_cdparser_ray.pipelines import flagship

    return flagship.pairs_pipeline(n_pages=120, batch_size=16, concurrency=(1, 4))


# ---------------------------------------------------------------------------
# queries — each callable takes sf_dir, returns Dataset / DataFrame / Table
# ---------------------------------------------------------------------------


def _read(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped rollup with partial pre-aggregation (SURVEY §2.5)."""
    import pyarrow.compute as pc

    from akf_cdparser_ray.stages.relational import partial_groupby_sum

    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate",
        ],
    )
    cutoff = "1998-09-02"

    def prep(batch):
        import pyarrow as pa

        mask = pc.less_equal(batch["l_shipdate"], pa.scalar(cutoff).cast(batch["l_shipdate"].type))
        batch = batch.filter(mask)
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
        )
        return batch.append_column("disc_price", disc_price).select(
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "disc_price"]
        )

    ds = ds.map_batches(prep, batch_format="pyarrow")
    out = partial_groupby_sum(
        ds,
        ["l_returnflag", "l_linestatus"],
        ["l_quantity", "l_extendedprice", "disc_price"],
        count_alias="count_order",
    )
    import pandas as pd

    df = out.to_pandas()
    df = df.rename(
        columns={
            "l_quantity": "sum_qty",
            "l_extendedprice": "sum_base_price",
            "disc_price": "sum_disc_price",
        }
    )
    # round like the oracle does: float sums are order-dependent at ~1e-6
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        df[c] = df[c].round(2)
    return df[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "count_order"]
    ]


def q_exact_dedup(sf_dir: str):
    """Exact dedup: hash-partition by content, keep first doc per text
    (SURVEY §2.7 D2 analogue over the documents table)."""
    from ray.data.aggregate import Min

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.groupby("text").aggregate(Min("doc_id", alias_name="doc_id"))
    return out.select_columns(["doc_id"])


def q_event_counters(sf_dir: str):
    """Per-type crawl-style counters with partial pre-agg (SURVEY §2.5 A5)."""
    from akf_cdparser_ray.stages.relational import partial_groupby_sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    out = partial_groupby_sum(ds, ["event_type"], ["value"], count_alias="n")

    import pandas as pd

    df = out.to_pandas().rename(columns={"value": "total_value"})
    return df[["event_type", "total_value", "n"]]


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "pricing_summary": q_pricing_summary,
        "exact_dedup": q_exact_dedup,
        "event_counters": q_event_counters,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2)      AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*)                       AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "exact_dedup": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "event_counters": """
            SELECT event_type, sum(value) AS total_value, count(*) AS n
            FROM events GROUP BY event_type
        """,
    }
