"""Structured Streaming skin over the engine's operators.

The reference has no streaming operators (SURVEY.md §2.7): its incremental
story is batch re-runs over a persisted REMANENT state table. This package
provides the Spark-native streaming equivalents — the same column
expressions as the batch operators, lifted onto ``readStream`` sources with
watermarks, plus a ``foreachBatch`` incremental reconciliation that
reproduces the reference's remanent-state loop as a streaming pipeline.
"""
