"""Analytical headline queries (bench workload) — TPC-H-shaped plans
exercising scan/filter/join/agg/window at scale.
"""

from __future__ import annotations
