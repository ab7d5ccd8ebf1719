"""Structured Streaming extension (SURVEY §2.8).

The reference is pure bounded batch; incrementality is status-flag
reprocessing. This package adds the Spark-native streaming ingest path:
the same logical plans run over ``readStream`` with watermarks, and
``foreachBatch`` drives the batch stage operators incrementally.
"""
