"""Aggregated query registry — importing the modules populates the dicts."""

from __future__ import annotations

import sparkextract.queries.dedup2  # noqa: F401
import sparkextract.queries.extraction  # noqa: F401
import sparkextract.queries.relational  # noqa: F401
import sparkextract.queries.round3  # noqa: F401
import sparkextract.queries.text  # noqa: F401
import sparkextract.queries.text2  # noqa: F401
import sparkextract.queries.vector  # noqa: F401
import sparkextract.queries.wave3  # noqa: F401
import sparkextract.queries.wave4  # noqa: F401
import sparkextract.queries.wave5  # noqa: F401
from sparkextract.queries.base import ORACLE_SQL, SPARK_QUERIES

__all__ = ["SPARK_QUERIES", "ORACLE_SQL"]
