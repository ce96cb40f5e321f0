from .queries import QUERIES
from .oracle import ORACLE
from . import extensions  # noqa: F401 — registers ops_* queries/oracles

__all__ = ["QUERIES", "ORACLE"]
