"""Correctness-gate registry: every implemented operator exposed as a
(spark_query, oracle_sql) pair for the driver's DuckDB side-by-side check.

Import this package to populate REGISTRY (submodules register on import).
"""

from .registry import REGISTRY, GateEntry, gate_query, load  # noqa: F401

# Registration happens at import time, one module per operator family.
from . import fulltext  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import coverage_ops  # noqa: E402,F401
from . import experiments  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
