"""akf_cdparser_ray — a Ray-Data-native crawl/parse engine.

A brand-new engine (NOT a port) with the query- and data-processing
capabilities of UB-Mannheim/akf-cdparser, re-expressed Ray-Data-first:

* ``parsing/``   — the per-document HTML→profile extractor (the reference's
  ``lib/parser*.js`` semantics, reimplemented from scratch in Python).
* ``functions/`` — scalar string/regex kernels (reference ``lib/regexLib.js``,
  ``lib/utils.js`` semantics).
* ``sources/``   — deterministic synthetic corpus + image/caption pair tables,
  parquet/lance IO.
* ``stages/``    — Ray Data ``map_batches`` stages (stateless tasks and actor
  pools) for parse, fetch, link extraction, dedup, text analysis, ANN.
* ``state/``     — sharded URL-seen filters (bloom/cuckoo), politeness token
  buckets, robots cache, checkpoint manifests.
* ``pipelines/`` — the flagship parse pipeline and the wave-based crawl loop.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — sessions are
owned by the caller (driver, ``bench.py``, or the pytest fixture).
"""

__version__ = "0.1.0"
