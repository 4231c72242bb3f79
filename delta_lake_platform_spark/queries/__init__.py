from .registry import QUERIES, ORACLE_SQL, register

__all__ = ["QUERIES", "ORACLE_SQL", "register"]
