from .hashing import hash64_columns, sha256_column, stable_hash64

__all__ = ["hash64_columns", "sha256_column", "stable_hash64"]
