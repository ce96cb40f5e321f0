"""Row-granular grouping (B6) and rate shaping (B18 static / B19 memory-bound).

Reference semantics:

* ``rowsPerGroup`` / ``groupingIntervalSeconds`` (docs/crd.md:35-43) —
  incoming rows are chunked into groups of at most ``rowsPerGroup``; a
  partial group is emitted when the grouping interval elapses. In the pull
  model here, every poll tick emits whatever is pending, so the interval
  maps to the runner's drain cadence while a backlog exists and the row cap
  maps to per-merge-commit admission.
* ``advisedRate: "N per T second" + advisedBurst`` with ``shaperImpl:
  static`` (crd-microsoft-synapse.yaml:320-360) — a token bucket: tokens
  refill at N/T rows per second up to ``burst`` capacity; a group is
  admitted only when the bucket holds tokens for all its rows.
* ``shaperImpl: memoryBound`` (crd-microsoft-synapse.yaml:361-393) — the
  adaptive shaper: estimate a chunk's memory cost from row count and
  per-type size estimates (``fallbackStringTypeSizeEstimate``,
  ``objectTypeSizeEstimate``), squash cost-relative-to-free-memory through
  a sigmoid (``chunkCostScale``), and refuse chunks whose squashed cost
  exceeds ``chunkCostMax``. The framework internals are not vendored in
  the reference, so the exact formula is **[inferred]** from the CRD knob
  names (SURVEY §2.B B19); the contract implemented here — admit while
  memory is ample, throttle proportionally as free memory shrinks, never
  starve (a minimum admission floor) — is the observable behavior those
  knobs describe. On a real cluster Spark's own memory manager remains
  the backstop; this shaper only prices *driver-side admission*.

Everything here is driver-side admission control over folder metadata; the
data-plane reads stay distributed.
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

_RATE_RE = re.compile(
    r"^\s*(\d+)\s+per\s+(?:(\d+)\s+)?(second|minute|hour)s?\s*$", re.IGNORECASE
)
_UNIT_S = {"second": 1.0, "minute": 60.0, "hour": 3600.0}


def parse_advised_rate(spec: str) -> float:
    """``"1000 per 15 second"`` (CRD default shape) → rows per second."""
    m = _RATE_RE.match(spec)
    if not m:
        raise ValueError(
            f"advisedRate {spec!r} not in 'N per [M] second|minute|hour' form"
        )
    n, m_count, unit = int(m.group(1)), int(m.group(2) or 1), m.group(3).lower()
    period = m_count * _UNIT_S[unit]
    if n <= 0 or period <= 0:
        raise ValueError(f"advisedRate {spec!r} must be positive")
    return n / period


@dataclass
class TokenBucket:
    """Static throughput shaper (B18): refill at ``rate_per_s`` up to
    ``capacity`` (advisedBurst). ``clock`` is injectable for tests."""

    rate_per_s: float
    capacity: float
    clock: Callable[[], float] = time.monotonic
    tokens: float = field(init=False)
    _last: float = field(init=False)

    def __post_init__(self) -> None:
        # start full: a fresh stream may immediately take one burst
        self.tokens = float(self.capacity)
        self._last = self.clock()

    def _refill(self) -> None:
        now = self.clock()
        self.tokens = min(self.capacity, self.tokens + (now - self._last) * self.rate_per_s)
        self._last = now

    def try_take(self, n: float) -> bool:
        """Admit ``n`` rows now, or refuse (caller defers to a later tick)."""
        self._refill()
        if self.tokens >= n:
            self.tokens -= n
            return True
        return False

    def wait_time(self, n: float) -> float:
        """Seconds until ``n`` tokens will be available (0 if now)."""
        self._refill()
        need = min(n, self.capacity)  # a group larger than burst drains a full bucket
        if self.tokens >= need:
            return 0.0
        return (need - self.tokens) / self.rate_per_s

    def take_up_to_capacity(self, n: float) -> bool:
        """Admit a group of ``n`` rows, allowing one oversized group (n >
        capacity) through on a FULL bucket — otherwise a single group bigger
        than the burst would starve forever. The bucket goes negative-free:
        it drains to zero and the caller pays the wait on the next group."""
        self._refill()
        need = min(n, self.capacity)
        if self.tokens >= need:
            self.tokens = max(0.0, self.tokens - n)
            return True
        return False


#: per-type in-memory size estimates (bytes) for chunk-cost pricing;
#: strings and nested/object types come from the CRD-configurable knobs
_FIXED_TYPE_BYTES = {
    "boolean": 1,
    "byte": 1,
    "short": 2,
    "int": 4,
    "integer": 4,
    "float": 4,
    "long": 8,
    "bigint": 8,
    "double": 8,
    "date": 4,
    "timestamp": 8,
    "timestamp_ntz": 8,
}


def estimate_row_bytes(
    dtypes: Sequence[tuple[str, str]],
    fallback_string_size: int = 64,
    object_size: int = 256,
) -> int:
    """Estimated in-memory bytes per row from a DataFrame's ``dtypes``:
    fixed sizes for primitives, ``fallbackStringTypeSizeEstimate`` for
    strings, ``objectTypeSizeEstimate`` for nested/binary/decimal types."""
    total = 0
    for _, dt in dtypes:
        base = dt.split("(")[0].lower()
        if base in _FIXED_TYPE_BYTES:
            total += _FIXED_TYPE_BYTES[base]
        elif base in ("string", "varchar", "char"):
            total += fallback_string_size
        else:  # array/map/struct/binary/decimal → object estimate
            total += object_size
    return max(total, 1)


@dataclass
class MemoryBoundShaper:
    """Adaptive throughput shaper (B19, ``shaperImpl: memoryBound``).

    Admission rule: a group of ``n`` rows is priced at
    ``cost = row_count_weight·n + size_weight·n·row_bytes`` (bytes-ish),
    normalized by the free memory the probe reports scaled by
    ``table_size_scale_factor``, then squashed through a sigmoid:

        squashed = 1 / (1 + exp(-chunk_cost_scale · (cost/free − 1)))

    ``squashed`` < 0.5 means the chunk costs less than the scaled free
    memory → admit; it approaches 1 as the chunk dwarfs free memory. The
    chunk is admitted while ``squashed <= chunk_cost_max`` (CRD default
    0.5 admits exactly the chunks that fit). ``min_admit_rows`` is the
    anti-starvation floor: a backlog drains at least that many rows per
    tick no matter how tight memory looks (the reference equivalently
    never wedges a stream on a transient memory estimate).

    ``memory_probe`` returns free bytes; the default reads the driver
    JVM's ``Runtime`` through the active SparkSession (local-mode stand-in
    for executor memory telemetry) and is injectable for tests and for
    cluster-side metrics sources.
    """

    row_bytes: int
    chunk_cost_scale: float = 4.0
    chunk_cost_max: float = 0.5
    row_count_weight: float = 0.0
    size_weight: float = 1.0
    table_size_scale_factor: float = 0.5
    min_admit_rows: int = 1000
    memory_probe: Callable[[], float] | None = None

    def _free_bytes(self) -> float:
        if self.memory_probe is not None:
            return float(self.memory_probe())
        return float(_jvm_free_bytes())

    def squashed_cost(self, n_rows: int) -> float:
        import math

        cost = self.row_count_weight * n_rows + self.size_weight * n_rows * self.row_bytes
        free = max(self._free_bytes() * self.table_size_scale_factor, 1.0)
        x = self.chunk_cost_scale * (cost / free - 1.0)
        # guard exp overflow for pathological ratios
        if x >= 50:
            return 1.0
        if x <= -50:
            return 0.0
        return 1.0 / (1.0 + math.exp(-x))

    def take_up_to_capacity(self, n_rows: int) -> bool:
        """Same admission contract as TokenBucket: True → merge the group
        now; False → defer the rest of the backlog to the next tick."""
        if n_rows <= self.min_admit_rows:
            return True
        return self.squashed_cost(n_rows) <= self.chunk_cost_max


def _jvm_free_bytes() -> float:
    """Driver-JVM free heap via the active session (0 when no JVM)."""
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        rt = spark._jvm.java.lang.Runtime.getRuntime()  # type: ignore[union-attr]
        return float(rt.maxMemory() - (rt.totalMemory() - rt.freeMemory()))
    except Exception:
        return float(1 << 40)  # no JVM (unit tests): effectively unbounded


def chunk_by_rows(
    items: Sequence[object], rows: Sequence[int], rows_per_group: int
) -> list[list[object]]:
    """Greedy consecutive chunking: each group's row total stays ≤
    ``rows_per_group`` (B6), except that a single item larger than the cap
    forms its own group (an item — a batch folder — is atomic here; its
    rows still merge as one idempotent commit). ``rows_per_group <= 0`` →
    one group with everything."""
    if rows_per_group <= 0:
        return [list(items)] if items else []
    groups: list[list[object]] = []
    cur: list[object] = []
    cur_rows = 0
    for item, r in zip(items, rows):
        if cur and cur_rows + r > rows_per_group:
            groups.append(cur)
            cur, cur_rows = [], 0
        cur.append(item)
        cur_rows += r
    if cur:
        groups.append(cur)
    return groups
