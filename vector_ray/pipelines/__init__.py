from vector_ray.pipelines.flagship import (
    parse_enrich_route,
    flagship_aggregate,
    run_flagship,
    LANES,
)

__all__ = ["parse_enrich_route", "flagship_aggregate", "run_flagship", "LANES"]
