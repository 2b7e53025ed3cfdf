"""Query registry — the engine's public query surface.

``QUERIES`` maps every implemented operator key from SURVEY.md §2 to a
callable ``(spark, sf_dir) -> DataFrame``; ``ORACLES`` maps the same keys to
equivalent DuckDB SQL. ``__spark_entry__.py`` re-exports both for the
driver's correctness gate.
"""

from .queries import ORACLES, QUERIES, flagship, load_table  # noqa: F401
