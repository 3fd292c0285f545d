"""Batch and streaming sources: table registry over the parquet fixtures."""

from .tables import TABLES, load_table, register_tables

__all__ = ["TABLES", "load_table", "register_tables"]
