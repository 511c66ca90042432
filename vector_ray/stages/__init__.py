"""Pipeline stages — one module per reference transform family.

Execution taxonomy (lib/vector-core/src/transform/mod.rs:14-18):
FunctionTransform → stateless ``map_batches``; TaskTransform →
groupby/shuffle or actor-pool stage.
"""

from vector_ray.stages.base import Step, BatchStep, ChainStep
from vector_ray.stages.remap import Remap
from vector_ray.stages.filters import Filter, Sample
from vector_ray.stages.fields import (
    AddFields,
    RemoveFields,
    RenameFields,
    Coercer,
    Concat,
    AnsiStripper,
)
from vector_ray.stages.parsers import (
    RegexParser,
    GrokParser,
    JsonParser,
    KeyValueParser,
    LogfmtParser,
    Tokenizer,
    SplitParser,
)
from vector_ray.stages.route import Route
from vector_ray.stages.enrich import EnrichmentTable, Enrich
from vector_ray.stages.dedupe import Dedupe
from vector_ray.stages.reduce import Reduce
from vector_ray.stages.aggregate import LogToMetric, Aggregate, grouped_aggregate
from vector_ray.stages.cardinality import TagCardinalityLimit
from vector_ray.stages.metric_to_log import MetricToLog
from vector_ray.stages.merge_partial import Merge
from vector_ray.stages.explode import Unnest, ExplodeJsonList
from vector_ray.stages.geoip import GeoipLookup

__all__ = [
    "Step", "BatchStep", "ChainStep", "Remap", "Filter", "Sample",
    "AddFields", "RemoveFields", "RenameFields", "Coercer", "Concat",
    "AnsiStripper", "RegexParser", "GrokParser", "JsonParser",
    "KeyValueParser", "LogfmtParser", "Tokenizer", "SplitParser",
    "Route", "EnrichmentTable", "Enrich", "Dedupe", "Reduce",
    "LogToMetric", "Aggregate", "grouped_aggregate",
    "TagCardinalityLimit", "MetricToLog", "Merge", "Unnest",
    "ExplodeJsonList", "GeoipLookup",
]
