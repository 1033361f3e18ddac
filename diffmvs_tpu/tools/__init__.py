"""Tooling: torch checkpoint import, COLMAP ingestion."""
