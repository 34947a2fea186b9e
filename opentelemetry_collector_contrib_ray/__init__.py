"""raylog engine: Ray-Data-native log/telemetry processing with the
capabilities of the OpenTelemetry Collector Contrib log pipeline.

Public surface (see README.md coverage matrix):

- expr: vectorized condition expressions (``col``, ``lit``)
- stages.parse / transform / route / aggregate / enrich / recombine /
  sessionize / metrics / dedup / similarity / textstats / multimodal /
  connectors: the operator library (map_batches callables + actor classes)
- functions.ottl / grok / maps: the OTTL function registry, grok compiler,
  and map-column editors
- pipelines.flagship: the reference parse->enrich->route->sink pipeline
- pipelines.config: dict/YAML-shaped pipeline builder + condition grammar
- pipelines.queries: the oracle-gated query catalogue
- sources.transcripts / textlogs: deterministic transcript and raw-line
  sources
- state.manifest / skew: partition lineage + resume, hot-key handling
"""

from .expr import col, lit
from .pipelines.config import build_from_config, parse_condition
from .pipelines.flagship import build_parsed, run_flagship
from .stages.route import Route, RouteTable

__version__ = "0.1.0"

__all__ = [
    "col", "lit", "Route", "RouteTable",
    "build_from_config", "parse_condition",
    "build_parsed", "run_flagship",
    "__version__",
]
