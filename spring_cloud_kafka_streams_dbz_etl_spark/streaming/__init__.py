"""Structured Streaming pipelines + control plane.

- pipeline.py  CDC enrichment stream, foreachBatch DLQ dual-sink split,
  restartable DLQ reprocessing (reference §2A #9-#15)
- registry.py  StreamRegistry: named-query lifecycle, status, offset
  inspection and reset (reference §2A #16-#20 REST surface as Python API)
- export.py    manual export bypassing CDC (reference §2A #21)
"""

from .registry import StreamRegistry

__all__ = ["StreamRegistry"]
