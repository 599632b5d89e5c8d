"""Query suite: fixture-bound (spark, sf_dir) callables + DuckDB oracle SQL.

Each module exposes ``QUERIES: dict[str, callable]`` and
``ORACLES: dict[str, str]``; ``__spark_entry__.py`` assembles them.
Keys are stable operator ids tied to SURVEY.md §2 rows.
"""

from __future__ import annotations


# The driver's correctness gate checks the FIRST 50 registered keys in
# order. Round 4 registered 55 and silently lost the last 5 (the e2e
# pipelines among them). Two defenses, both enforced by pytest
# (tests/test_config_and_job.py::test_registry_fits_driver_window):
#   1. total registered keys <= MAX_CHECKED, so nothing can fall off;
#   2. e2e registers BEFORE llm, so the end-to-end pipeline
#      reconstructions (the reference's actual product) sit well inside
#      the window even if the count ever creeps up.
MAX_CHECKED = 50


def assemble():
    from . import core, e2e, llm

    queries: dict = {}
    oracles: dict = {}
    for mod in (core, e2e, llm):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
