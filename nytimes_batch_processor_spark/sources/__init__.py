from .readers import load_table, load_tables, read_csv
from .staging import fetch_to_staging

__all__ = ["fetch_to_staging", "load_table", "load_tables", "read_csv"]
