"""Generalized §2 operator inventory over the TPC-H-ish tables.

(Queries registered incrementally — see SURVEY.md §2 for the inventory.)
"""

from __future__ import annotations
