from .ksql import KsqlEngine

__all__ = ["KsqlEngine"]
