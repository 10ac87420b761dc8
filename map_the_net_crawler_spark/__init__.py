"""map_the_net_crawler_spark — a PySpark-native domain-mapping crawler engine.

A from-scratch reimplementation of the query/data-processing semantics of
Rabenherz112/map-the-net-crawler (reference at /root/reference, cited as
file:line in docstrings) on idiomatic Spark:

- the MySQL ``discovery_queue`` becomes a partitioned frontier table with
  snapshot-commit semantics (storage.TableIO),
- the per-row fetch/parse loop becomes an equi-join against a
  Common-Crawl-style ``pages`` snapshot plus one Arrow-vectorized extract UDF,
- all filters / caps / dedup / classification are Column expressions and
  windows (whole-stage codegen), no per-row Python in the hot path.
"""

__version__ = "0.1.0"
