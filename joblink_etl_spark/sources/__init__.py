from .tables import TABLES, parallelize, table

__all__ = ["TABLES", "table", "parallelize"]
