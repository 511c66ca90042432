"""Sources — batch rebuilds of src/sources/*: file-family sources →
``ray.data.read_*``; the synthetic generator source
(src/sources/generator.rs) → a deterministic counter-based generator
(``vector_ray.sources.synth``) that yields identical data at ANY
parallelism level."""

from vector_ray.sources.synth import (
    synth_table,
    synth_dataset,
    synth_parquet,
    source_lookup_table,
    generator_lines,
)

__all__ = [
    "synth_table",
    "synth_dataset",
    "synth_parquet",
    "source_lookup_table",
    "generator_lines",
]
