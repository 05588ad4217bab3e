"""Streaming query surface (Structured Streaming; SURVEY.md §2B s_*).

Filled in by the streaming phase — each s_* entry drives a real
StreamingQuery over the sf_dir data (file-source micro-batches standing in
for Kafka topics) to completion and returns the materialized result, so the
driver's batch comparison applies to streaming semantics too.
"""

from __future__ import annotations
