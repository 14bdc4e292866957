"""Structured Streaming surface (optional path — the engine is batch-first).

The reference is batch-only (SURVEY.md §2.6: no watermarks/session
windows in blarify), but the same extraction plan runs unchanged as a
stream: `readStream` over arriving page files -> the identical Arrow UDF
stages -> windowed triple aggregation with a watermark. Streaming
checkpoints give the same incremental exactly-once semantics the batch
path gets from its manifest (materialize.py) — one pipeline, two drivers.
"""
