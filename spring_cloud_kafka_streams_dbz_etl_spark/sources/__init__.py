"""Sources: CDC envelope synthesis/parsing + Kafka source builders."""

from .cdc import parse_event_envelopes, synthesize_event_envelopes

__all__ = ["parse_event_envelopes", "synthesize_event_envelopes"]
