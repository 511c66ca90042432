"""Field-shaping transforms: add_fields (src/transforms/add_fields.rs),
remove_fields, rename_fields, coercer, concat, ansi_stripper — all
stateless vectorized batch steps."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.expr import F
from vector_ray.stages.base import BatchStep


class AddFields(BatchStep):
    """Insert literal or `{{field}}`-templated values
    (src/transforms/add_fields.rs:18-22 + src/template.rs:28-32)."""

    def __init__(self, fields: Dict[str, object], *, overwrite: bool = True):
        self.fields = fields
        self.overwrite = overwrite

    def transform(self, tbl: pa.Table) -> pa.Table:
        for name, value in self.fields.items():
            if name in tbl.column_names and not self.overwrite:
                continue
            if isinstance(value, str) and "{{" in value:
                col = F.render(tbl, value)
            else:
                col = F.const(len(tbl), value)
            tbl = F.set_(tbl, name, col)
        return tbl


class RemoveFields(BatchStep):
    """src/transforms/remove_fields.rs:11-14 — drop columns (missing ok)."""

    def __init__(self, fields: Sequence[str]):
        self.fields = list(fields)

    def transform(self, tbl: pa.Table) -> pa.Table:
        return F.del_(tbl, *self.fields)


class RenameFields(BatchStep):
    """src/transforms/rename_fields.rs:13-16 — move old→new."""

    def __init__(self, mapping: Dict[str, str]):
        self.mapping = mapping

    def transform(self, tbl: pa.Table) -> pa.Table:
        return F.rename(tbl, self.mapping)


class Coercer(BatchStep):
    """src/transforms/coercer.rs:15-19 — cast listed fields via the
    Conversion table; drop_unspecified projects to listed fields only."""

    def __init__(self, types: Dict[str, str], *, drop_unspecified: bool = False):
        self.types = types
        self.drop_unspecified = drop_unspecified

    def transform(self, tbl: pa.Table) -> pa.Table:
        for name, kind in self.types.items():
            if name in tbl.column_names:
                tbl = F.set_(tbl, name, F.coerce(tbl[name], kind))
        if self.drop_unspecified:
            keep = [n for n in tbl.column_names if n in self.types]
            tbl = tbl.select(keep)
        return tbl


class Concat(BatchStep):
    """src/transforms/concat.rs:15-19 — join (substrings of) fields into
    `target` with `joiner`. Items are "field" or "field[start..end]"."""

    def __init__(self, target: str, items: Sequence[str], *, joiner: str = " "):
        self.target = target
        self.items: List[Tuple[str, Optional[int], Optional[int]]] = []
        for it in items:
            if "[" in it:
                fld, rng = it[:-1].split("[")
                start_s, end_s = rng.split("..")
                self.items.append(
                    (fld, int(start_s) if start_s else 0, int(end_s) if end_s else None)
                )
            else:
                self.items.append((it, None, None))
        self.joiner = joiner

    def transform(self, tbl: pa.Table) -> pa.Table:
        cols = []
        for fld, start, end in self.items:
            col = pc.cast(tbl[fld], pa.string())
            if start is not None:
                col = F.slice_(col, start, end)
            cols.append(col)
        return F.set_(tbl, self.target, pc.binary_join_element_wise(*cols, self.joiner))


class AnsiStripper(BatchStep):
    """src/transforms/ansi_stripper.rs:12-14."""

    def __init__(self, field: str):
        self.field = field

    def transform(self, tbl: pa.Table) -> pa.Table:
        return F.set_(tbl, self.field, F.strip_ansi_escape_codes(tbl[self.field]))
