from .queries import QUERIES
from .oracle import ORACLE, ORACLE_SF
from . import extensions  # noqa: F401 — registers ops_* queries/oracles
from . import extended  # noqa: F401 — registers q26+ queries/oracles
from . import tpch  # noqa: F401 — registers the canonical TPC-H 22
from . import values_oracle  # noqa: F401 — literal-VALUES oracles for seeded entries

__all__ = ["QUERIES", "ORACLE", "ORACLE_SF"]
