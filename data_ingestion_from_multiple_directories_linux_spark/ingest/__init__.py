"""Ingestion engine: the reference pipeline's semantics (SURVEY.md §2.11,
§3) as one distributed Spark job per micro-batch."""

from .engine import IngestionEngine, IngestReport  # noqa: F401
