"""Shared ray.data log quieting for embedding surfaces.

The driver captures the entrypoint/bench process's output; Ray Data logs
~1 KiB of INFO per dataset (4 lines + the full execution plan), which
across a 60-query sweep is enough to fill an undrained 64 KiB pipe and
wedge the run, and the streaming executor warns once per zero-column
bundle its own Sort stage emits on empty key ranges (repro:
from_arrow(3 keys).repartition(16).groupby.map_groups). One helper so
the entrypoint and bench cannot drift apart; overridable with
OTELRAY_VERBOSE.
"""

from __future__ import annotations

import logging
import os


def quiet_ray_data_logging() -> None:
    if os.environ.get("OTELRAY_VERBOSE"):
        return
    # import FIRST: ray.data's import-time configure_logging() dictConfig
    # would clobber a level set before it; nothing reconfigures
    # driver-side afterwards, so these stick
    import ray.data  # noqa: F401

    for name in ("ray.data", "ray.air"):
        logging.getLogger(name).setLevel(logging.WARNING)
    # one-off advisory warnings that would otherwise be the only stderr a
    # captured sweep emits: operator-name truncation (cosmetic), the
    # object-store-fraction advisory (we don't control the driver's
    # ray.init), and the zero-column-bundle executor warning
    for name in ("ray.data._internal.execution.streaming_executor_state",
                 "ray.data._internal.progress_bar",
                 "ray.data._internal.execution.resource_manager"):
        logging.getLogger(name).setLevel(logging.ERROR)
