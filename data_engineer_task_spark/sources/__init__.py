from .catalog import load_table, register_testdata
from .csv import read_csv
from .parquet import read_parquet, write_parquet

__all__ = ["load_table", "register_testdata", "read_csv", "read_parquet", "write_parquet"]
