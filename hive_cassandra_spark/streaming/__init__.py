"""Structured Streaming superset over the events table (SURVEY.md §2.B
"Streaming": the reference is batch-MapReduce only; this is the Spark
upgrade path)."""
