from .queries import ORACLE, QUERIES, flagship

__all__ = ["QUERIES", "ORACLE", "flagship"]
