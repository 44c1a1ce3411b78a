"""Schema registry — the reference's ``/schema`` CRUD surface.

The reference stores the JSON Schema itself as a document under the
Redis key ``"schema"`` with insert-iff-absent (409 on duplicate) and
delete semantics (src/utils/apiLogicForCRUD.ts:417-429, routes
src/index.ts:64-72), and every write validates against the currently
registered schema. Engine form: a ``schemas`` table
(schema_id, json_schema, struct_ddl, version) with guarded-insert
semantics, plus a compile cache so the JSON-Schema → StructType work
happens once per (schema_id, version), not per batch.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import types as T

from adv_big_data_indexing_spark.plans.json_schema_compiler import compile_struct


class SchemaConflictError(Exception):
    """Insert-iff-absent violated — the reference's 409 path."""


class SchemaNotFoundError(Exception):
    """No registered schema — the reference's 404 path."""


@dataclass
class SchemaRegistry:
    """In-process registry; persistence is a trivial parquet write of
    :meth:`to_rows` (schema documents are metadata, not data — they do
    not need distributed storage semantics)."""

    _schemas: dict[str, tuple[int, dict]] = field(default_factory=dict)
    _compiled: dict[tuple[str, int], T.StructType] = field(default_factory=dict)

    def register(self, schema_id: str, schema: dict, replace: bool = False) -> int:
        """POST /schema: insert-iff-absent unless ``replace``."""
        if schema_id in self._schemas and not replace:
            raise SchemaConflictError(f"schema {schema_id!r} already registered (409)")
        version = self._schemas[schema_id][0] + 1 if schema_id in self._schemas else 1
        self._schemas[schema_id] = (version, schema)
        return version

    def get(self, schema_id: str) -> dict:
        try:
            return self._schemas[schema_id][1]
        except KeyError:
            raise SchemaNotFoundError(f"no schema {schema_id!r} (404)") from None

    def struct(self, schema_id: str) -> T.StructType:
        """Compiled StructType, cached per (id, version)."""
        try:
            version, schema = self._schemas[schema_id]
        except KeyError:
            raise SchemaNotFoundError(f"no schema {schema_id!r} (404)") from None
        key = (schema_id, version)
        if key not in self._compiled:
            self._compiled[key] = compile_struct(schema)
        return self._compiled[key]

    def delete(self, schema_id: str) -> None:
        """DELETE /schema."""
        if schema_id not in self._schemas:
            raise SchemaNotFoundError(f"no schema {schema_id!r} (404)")
        del self._schemas[schema_id]

    def to_rows(self) -> list[tuple[str, int, str, str]]:
        """(schema_id, version, json_schema, struct_ddl) — the persistable
        ``schemas`` table mirror."""
        return [
            (sid, ver, json.dumps(schema, sort_keys=True), compile_struct(schema).json())
            for sid, (ver, schema) in sorted(self._schemas.items())
        ]
