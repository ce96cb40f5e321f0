from .queries import QUERIES
from .oracle import ORACLE
from . import extensions  # noqa: F401 — registers ops_* queries/oracles
from . import extended  # noqa: F401 — registers q26+ queries/oracles

__all__ = ["QUERIES", "ORACLE"]
