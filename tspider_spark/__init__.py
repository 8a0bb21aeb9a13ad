"""tspider_spark — a PySpark-native crawl/scheduling engine.

A from-scratch reimplementation of the query/dataflow semantics of the
TSpider reference crawler (see SURVEY.md) as an idiomatic Spark
DataFrame pipeline: a distributed URL frontier over tables of
interleaved text+media documents, vectorized extraction, partitioned
bloom/cuckoo URL-seen sets, per-host politeness budgets, and exact,
resumable BFS crawl ordering.
"""

__version__ = "0.1.0"
