from .readers import load_table, load_tables, read_csv

__all__ = ["load_table", "load_tables", "read_csv"]
