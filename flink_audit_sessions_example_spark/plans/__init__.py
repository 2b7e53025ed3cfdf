"""Query registry — the engine's public query surface.

``QUERIES`` maps every implemented operator key from SURVEY.md §2 to a
callable ``(spark, sf_dir) -> DataFrame``; ``ORACLES`` maps the same keys to
equivalent DuckDB SQL. ``__spark_entry__.py`` re-exports both for the
driver's correctness gate.
"""

from ..sources.tables import load_table  # noqa: F401
from .queries import ORACLES as _CORE_ORACLES
from .queries import QUERIES as _CORE_QUERIES
from .queries import flagship  # noqa: F401
from .extended import EXTENDED_ORACLES, EXTENDED_QUERIES

QUERIES = {**_CORE_QUERIES, **EXTENDED_QUERIES}
ORACLES = {**_CORE_ORACLES, **EXTENDED_ORACLES}
