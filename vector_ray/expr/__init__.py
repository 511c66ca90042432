"""Expression layer: vectorized Arrow kernels (``F``) and composable
predicates (``Cond`` / ``C``) — the rebuild of VRL's stdlib +
``check_fields`` conditions (reference: ``lib/vrl/stdlib/src/``,
``src/conditions/check_fields.rs:442-458``) as pyarrow.compute ops.
"""

from vector_ray.expr.conditions import C, Cond
from vector_ray.expr import kernels as F

__all__ = ["C", "Cond", "F"]
