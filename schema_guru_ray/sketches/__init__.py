"""Mergeable sketch states (HyperLogLog distinct, KLL quantiles) and
distribution-drift scores (PSI / KS) computed from them.

All sketches are commutative monoids — same contract as the schema states —
so they flow through the identical per-batch partial + tiny final merge
topology (SURVEY.md §2.5 A11).
"""

from schema_guru_ray.sketches.hll import HLL
from schema_guru_ray.sketches.kll import KLL
from schema_guru_ray.sketches.drift import ks_statistic, psi

__all__ = ["HLL", "KLL", "psi", "ks_statistic"]
