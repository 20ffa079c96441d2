"""O12 — per-superstep metrics (BASELINE.json primary metric).

edges-processed/sec per superstep + iterations-to-convergence, recorded as
plain dicts so bench.py / BENCH/BASELINE.md can serialize them directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SuperstepMetric:
    superstep: int
    wall_ms: float
    edges: int
    delta: float

    @property
    def edges_per_sec(self) -> float:
        return self.edges / (self.wall_ms / 1000.0) if self.wall_ms > 0 else 0.0

    def to_dict(self) -> dict:
        return {
            "superstep": self.superstep,
            "wall_ms": round(self.wall_ms, 2),
            "edges": self.edges,
            "delta": self.delta,
            "edges_per_sec": round(self.edges_per_sec, 1),
        }


@dataclass
class JobMetrics:
    job: str
    supersteps: list[SuperstepMetric] = field(default_factory=list)

    def add(self, m: SuperstepMetric) -> None:
        self.supersteps.append(m)

    def steady_state_edges_per_sec(self, skip_warmup: int = 1) -> float:
        """Mean edges/sec discarding warm-up supersteps (JVM/Arrow spin-up)."""
        ms = self.supersteps[skip_warmup:] or self.supersteps
        return sum(m.edges_per_sec for m in ms) / len(ms) if ms else 0.0

    def to_dict(self) -> dict:
        return {
            "job": self.job,
            "iterations": len(self.supersteps),
            "edges_per_sec_mean": round(self.steady_state_edges_per_sec(), 1),
            "supersteps": [m.to_dict() for m in self.supersteps],
        }
