"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# The driver captures this process's output; rationale and repro live in
# the shared helper (opentelemetry_collector_contrib_ray/logquiet.py).
from opentelemetry_collector_contrib_ray.logquiet import (  # noqa: E402
    quiet_ray_data_logging)

quiet_ray_data_logging()


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: parse -> enrich -> route,
    returns the routed dataset (driver checks rows>=0, stable schema)."""
    from opentelemetry_collector_contrib_ray.pipelines.flagship import build_parsed

    return build_parsed("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from opentelemetry_collector_contrib_ray.pipelines.queries import ray_queries

    return ray_queries()


def oracle_sql() -> dict[str, str]:
    from opentelemetry_collector_contrib_ray.pipelines.queries import oracle_queries

    return oracle_queries()
