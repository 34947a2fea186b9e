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

import logging
import os
from collections.abc import Callable
from typing import Any

# The driver captures this process's output; Ray Data logs 4 INFO lines
# (plus a full execution plan) per dataset, which across a 54-query sweep
# is ~60 KiB of noise — enough to fill an undrained 64 KiB pipe and wedge
# the run. `import ray.data` FIRST: its import-time configure_logging()
# dictConfig would clobber a level set before it. Nothing reconfigures
# driver-side afterwards, so this sticks.
if not os.environ.get("OTELRAY_VERBOSE"):
    import ray.data  # noqa: F401  (triggers configure_logging)

    for _name in ("ray.data", "ray.air"):
        logging.getLogger(_name).setLevel(logging.WARNING)
    # groupby().map_groups() emits zero-column RefBundles from its Sort
    # stage whenever input blocks outnumber distinct key ranges (repro:
    # from_arrow(3 keys).repartition(16).groupby.map_groups) — a cosmetic
    # Ray-internal schema-mismatch warning per empty bundle. Silence just
    # that logger; real warnings elsewhere in ray.data stay visible.
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).setLevel(logging.ERROR)


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
