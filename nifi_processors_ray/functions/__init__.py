from .hashing import hash64_columns, sha256_column, stable_hash64
from .tables import gather_table

__all__ = ["hash64_columns", "sha256_column", "stable_hash64",
           "gather_table"]
