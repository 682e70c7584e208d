"""Structured Streaming half of the engine (SURVEY.md §2.4 W1-W8,
§2.1 S1/S11/S12): watermarked tumbling-window aggregation, append-mode file
sinks, foreachBatch serving upserts, availableNow incremental triggers."""
