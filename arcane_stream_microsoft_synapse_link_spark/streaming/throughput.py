"""Row-granular grouping (B6) and static rate shaping (B18).

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
  admitted only when the bucket holds tokens for all its rows. The
  MemoryBound shaper is a declared non-goal (SURVEY §2.B — Spark's memory
  manager + AQE replace byte-estimate admission).

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
