"""Aggregated query registry — importing the modules populates the dicts.

Two surfaces:

- ``SPARK_QUERIES`` / ``ORACLE_SQL``: every fine-grained query (the full
  operator inventory; what tests and ``check_queries.py --full`` use).
- ``driver_queries()``: the consolidated driver-contract view — panels
  (see ``queries.panels``) plus the unpaneled queries, sized to fit the
  round driver's bounded correctness run list so every operator family
  gets a scoreboard row each round.
"""

from __future__ import annotations

import sparkextract.queries.dedup2  # noqa: F401
import sparkextract.queries.extraction  # noqa: F401
import sparkextract.queries.relational  # noqa: F401
import sparkextract.queries.round3  # noqa: F401
import sparkextract.queries.round4  # noqa: F401
import sparkextract.queries.round5  # noqa: F401
import sparkextract.queries.round5b  # noqa: F401
import sparkextract.queries.round5c  # noqa: F401
import sparkextract.queries.round5d  # noqa: F401
import sparkextract.queries.round5e  # noqa: F401
import sparkextract.queries.round5f  # noqa: F401
import sparkextract.queries.round5g  # noqa: F401
import sparkextract.queries.round5h  # noqa: F401
import sparkextract.queries.round5i  # noqa: F401
import sparkextract.queries.round5j  # noqa: F401
import sparkextract.queries.round5k  # noqa: F401
import sparkextract.queries.round5l  # noqa: F401
import sparkextract.queries.round5m  # noqa: F401
import sparkextract.queries.round5n  # noqa: F401
import sparkextract.queries.round5o  # noqa: F401
import sparkextract.queries.round5p  # noqa: F401
import sparkextract.queries.round5q  # noqa: F401
import sparkextract.queries.round5r  # noqa: F401
import sparkextract.queries.round5s  # noqa: F401
import sparkextract.queries.round5t  # noqa: F401
import sparkextract.queries.round5u  # noqa: F401
import sparkextract.queries.round5v  # noqa: F401
import sparkextract.queries.round5w  # noqa: F401
import sparkextract.queries.round5x  # noqa: F401
import sparkextract.queries.round5y  # noqa: F401
import sparkextract.queries.round5aa  # noqa: F401
import sparkextract.queries.round5ab  # noqa: F401
import sparkextract.queries.round5ac  # noqa: F401
import sparkextract.queries.round5ad  # noqa: F401
import sparkextract.queries.round5ae  # noqa: F401
import sparkextract.queries.round5af  # noqa: F401
import sparkextract.queries.round5ag  # noqa: F401
import sparkextract.queries.round5ah  # noqa: F401
import sparkextract.queries.round5ai  # noqa: F401
import sparkextract.queries.round5aj  # noqa: F401
import sparkextract.queries.round5z  # noqa: F401
import sparkextract.queries.text  # noqa: F401
import sparkextract.queries.text2  # noqa: F401
import sparkextract.queries.vector  # noqa: F401
import sparkextract.queries.wave3  # noqa: F401
import sparkextract.queries.wave4  # noqa: F401
import sparkextract.queries.wave5  # noqa: F401
from sparkextract.queries.base import ORACLE_SQL, SPARK_QUERIES


def driver_queries() -> tuple[dict, dict]:
    from sparkextract.queries.panels import driver_view

    return driver_view()


__all__ = ["SPARK_QUERIES", "ORACLE_SQL", "driver_queries"]
