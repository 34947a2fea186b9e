"""raylog engine: Ray-Data-native log/telemetry processing with the
capabilities of the OpenTelemetry Collector Contrib log pipeline.

Public surface (see README.md coverage matrix):

- expr: vectorized condition expressions (``col``, ``lit``)
- stages.parse / transform / route / aggregate / enrich / recombine /
  sessionize / metrics / dedup / similarity / textstats / multimodal /
  connectors: the operator library (map_batches callables + actor classes)
- functions.ottl / grok / maps / ottl_parser: the OTTL function registry
  (91+ names), grok compiler, map-column editors, and the OTTL statement
  mini-parser
- pipelines.statements: the transformprocessor statement-group executor
  ({context, conditions, statements, error_mode})
- stages.shuffle: adaptive partitioning + reduce-side joins
- pipelines.flagship: the reference parse->enrich->route->sink pipeline
- pipelines.config: dict/YAML-shaped pipeline builder + condition grammar
- pipelines.queries: the oracle-gated query catalogue
- sources.transcripts / textlogs / journald: deterministic transcript,
  raw-line, and journald-JSON sources
- state.manifest / skew: partition lineage + resume, hot-key handling
"""

from .expr import col, lit
from .pipelines.config import build_from_config, parse_condition
from .pipelines.flagship import build_parsed, run_flagship
from .pipelines.statements import StatementGroupExecutor, transform_processor
from .stages.route import Route, RouteTable
from .stages.shuffle import adaptive_n_parts, partitioned_attach

__version__ = "0.1.0"

__all__ = [
    "col", "lit", "Route", "RouteTable",
    "build_from_config", "parse_condition",
    "build_parsed", "run_flagship",
    "StatementGroupExecutor", "transform_processor",
    "adaptive_n_parts", "partitioned_attach",
    "__version__",
]
