"""JSON-Schema (draft-04) → Spark StructType + validation expressions.

The one genuinely custom "frontend" component of the engine (SURVEY.md
§4.3): the reference validates every write against a registered JSON
Schema (jsonschema Validator, src/utils/apiLogicForCRUD.ts:112-120) with
``$ref: #/definitions/*`` indirection and ``additionalProperties: false``
(schema.txt:1-57). Here the schema compiles once into

- a ``StructType`` for ``from_json`` (typed, columnar parse), and
- a set of per-row boolean constraint Columns (required fields, string
  pattern, closed-world key check, calendar-valid dates) that evaluate
  JVM-side over millions of rows — the 400-on-invalid path becomes a
  valid/invalid DataFrame split, like PERMISSIVE mode's _corrupt_record.

Supported draft-04 subset (everything the reference's schema uses):
type object/array/string/number/integer/boolean, properties, items,
required, pattern, $ref into #/definitions, additionalProperties.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DATE_PATTERN = r"^(0[1-9]|[12][0-9]|3[01])-(0[1-9]|1[012])-(\d{4})$"


def _resolve(node: dict[str, Any], root: dict[str, Any]) -> dict[str, Any]:
    while "$ref" in node:
        ref = node["$ref"]
        if not ref.startswith("#/"):
            raise ValueError(f"only intra-document $ref supported, got {ref}")
        cur: Any = root
        for part in ref[2:].split("/"):
            cur = cur[part]
        node = cur
    return node


def compile_struct(schema: dict[str, Any], root: dict[str, Any] | None = None) -> T.DataType:
    """Compile a (sub)schema into a Spark DataType."""
    root = root if root is not None else schema
    node = _resolve(schema, root)
    typ = node.get("type")
    if typ == "object" or ("properties" in node and typ is None):
        fields = [
            T.StructField(name, compile_struct(sub, root), nullable=True)
            for name, sub in node.get("properties", {}).items()
        ]
        return T.StructType(fields)
    if typ == "array":
        items = node.get("items", {})
        return T.ArrayType(compile_struct(items, root), containsNull=True)
    if typ == "string":
        return T.StringType()
    if typ == "number":
        return T.DoubleType()
    if typ == "integer":
        return T.LongType()
    if typ == "boolean":
        return T.BooleanType()
    raise ValueError(f"unsupported schema node: {node!r}")


def _constraints(
    schema: dict[str, Any],
    root: dict[str, Any],
    col: Column,
    raw_path: str,
    present: Column,
) -> list[tuple[str, Column]]:
    """(name, ok-expr) pairs for one node. ``present`` guards nested checks
    (absent optional objects are vacuously valid, like jsonschema)."""
    node = _resolve(schema, root)
    out: list[tuple[str, Column]] = []
    typ = node.get("type")
    if typ == "object" or ("properties" in node and typ is None):
        for req in node.get("required", []):
            out.append(
                (
                    f"{raw_path}.{req}:required",
                    F.when(present, col.getField(req).isNotNull()).otherwise(F.lit(True)),
                )
            )
        if node.get("additionalProperties") is False:
            allowed = sorted(node.get("properties", {}).keys())
            # closed-world: keys of the raw JSON object ⊆ declared properties
            keys = F.json_object_keys(F.get_json_object(F.col("raw"), raw_path))
            ok = F.size(F.array_except(keys, F.array(*[F.lit(k) for k in allowed]))) == 0
            out.append(
                (f"{raw_path}:no_additional_properties", F.when(present, ok).otherwise(F.lit(True)))
            )
        for name, sub in node.get("properties", {}).items():
            child = col.getField(name)
            out.extend(
                _constraints(sub, root, child, f"{raw_path}.{name}", present & child.isNotNull())
            )
    elif typ == "array":
        items = _resolve(node.get("items", {}), root)
        # element-level required/pattern via forall over the array
        def _required_in_elements(r: str) -> Column:
            return F.forall(col, lambda x: x.getField(r).isNotNull())

        for req in items.get("required", []):
            out.append(
                (
                    f"{raw_path}[].{req}:required",
                    F.when(present, _required_in_elements(req)).otherwise(F.lit(True)),
                )
            )
    elif typ == "string" and "pattern" in node:
        pat = node["pattern"]
        out.append(
            (
                f"{raw_path}:pattern",
                F.when(present, col.rlike(pat)).otherwise(F.lit(True)),
            )
        )
        if pat == DATE_PATTERN:
            # the reference pairs the format regex with a real-calendar check
            # (dateValidator.ts:1-14): 31-02-2024 matches the regex but is
            # not a date. try_to_date does calendar validation.
            out.append(
                (
                    f"{raw_path}:calendar_valid",
                    F.when(
                        present, F.try_to_date(col, "dd-MM-yyyy").isNotNull()
                    ).otherwise(F.lit(True)),
                )
            )
    return out


def validate(raw_df: DataFrame, schema: dict[str, Any]) -> DataFrame:
    """Parse + validate raw JSON documents against the compiled schema.

    Input: a DataFrame with a string column ``raw``. Output adds:
    ``doc`` (typed struct), ``violations`` (array<string> of failed
    constraint names), ``is_valid``. Callers split on ``is_valid`` —
    the set-oriented form of the reference's 400 response.
    """
    struct = compile_struct(schema)
    parsed = raw_df.withColumn("doc", F.from_json(F.col("raw"), struct))
    # from_json yields an all-null struct (not NULL) on malformed input,
    # so detect parse failure from the raw text instead.
    parse_ok = F.get_json_object(F.col("raw"), "$").isNotNull()
    checks = [("$:parse", parse_ok)]
    checks += _constraints(schema, schema, F.col("doc"), "$", parse_ok)
    viols = F.array_compact(
        F.array(*[F.when(~ok, F.lit(name)) for name, ok in checks])
    )
    return parsed.withColumn("violations", viols).withColumn(
        "is_valid", F.size("violations") == 0
    )
