"""Query suite: fixture-bound (spark, sf_dir) callables + DuckDB oracle SQL.

Each module exposes ``QUERIES: dict[str, callable]`` and
``ORACLES: dict[str, str]``; ``__spark_entry__.py`` assembles them.
Keys are stable operator ids tied to SURVEY.md §2 rows.
"""

from __future__ import annotations


def assemble():
    from . import core, e2e, llm

    queries: dict = {}
    oracles: dict = {}
    for mod in (core, llm, e2e):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
