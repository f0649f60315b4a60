"""oscar_ray — a Ray-Data-native full-text inverted-index builder and
BM25 top-k query engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference engine ``osm-oscar/oscar`` (offline-built full-text search:
tokenize documents -> build compressed posting lists keyed by token ->
answer set-algebra queries by posting-list intersection/union/difference
with top-k output; see SURVEY.md) as idiomatic Ray Data pipelines:

- ``spec/``       pinned deterministic specs (tokenizer, BM25, html extract)
- ``sources/``    parquet fragment readers with deterministic docid assignment
- ``stages/``     map_batches stages (tokenize, dedup, text analysis, ANN)
- ``index/``      resumable two-stage index build + postings reader
- ``query/``      query parser, set-op kernels, BM25 scorer, engine
- ``pipelines/``  demo/driver pipelines over the test tables

Nothing in this package calls ``ray.init()``/``ray.shutdown()``; sessions
are owned by bench.py / test fixtures / the driver.
"""

__version__ = "0.1.0"
