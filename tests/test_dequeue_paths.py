"""The pandas and distributed dequeue paths must be byte-equivalent."""

import numpy as np
import pandas as pd
import pytest

from akf_cdparser_ray.pipelines.crawl import FRONTIER_COLS, CrawlConfig, CrawlJob
from akf_cdparser_ray.stages.links import url_hash64


def _frontier(n: int) -> pd.DataFrame:
    rows = []
    for i in range(n):
        url = f"http://h{i % 9}.example/{i}.html"
        rows.append(
            {
                "url_canon": url,
                "url_hash": np.uint64(url_hash64(url)),
                "host": f"h{i % 9}.example",
                "priority": 100 - (i % 13),
                "depth": i % 4,
                "discovered_at": 0,
            }
        )
    return pd.DataFrame(rows, columns=FRONTIER_COLS)


@pytest.mark.usefixtures("ray_session")
def test_dequeue_paths_equivalent(tmp_path):
    cfg = CrawlConfig(seeds=[], corpus_size=1, out_dir=str(tmp_path / "x"), num_shards=4)

    job_a = CrawlJob.__new__(CrawlJob)
    job_a.cfg = cfg
    job_a.frontier = _frontier(300)
    out_a = job_a._dequeue_pandas(5)

    job_b = CrawlJob.__new__(CrawlJob)
    job_b.cfg = cfg
    job_b.frontier = _frontier(300)
    out_b = job_b._dequeue_dataset(5)

    key = ["url_canon", "priority", "depth"]
    a = out_a[key].reset_index(drop=True)
    b = out_b[key].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    rem_a = job_a.frontier.sort_values("url_canon").reset_index(drop=True)[key]
    rem_b = job_b.frontier.sort_values("url_canon").reset_index(drop=True)[key]
    pd.testing.assert_frame_equal(rem_a, rem_b)
