"""Auxiliary subsystems (SURVEY.md §5): tracing, metrics, checkpointing."""
