"""Model contracts: declared-vs-inferred schema checks + constraints.

Reference semantics (`/root/reference/dbt/adapters/maxcompute/impl.py:69-75`
CONSTRAINT_SUPPORT): ``not_null`` is ENFORCED by the warehouse; check /
unique / primary_key / foreign_key are NOT_SUPPORTED (dbt downgrades them
to a warning). An enforced contract first asserts the declared columns are
equivalent to the model's inferred columns
(`dbt/include/maxcompute/macros/relations/table/create.sql:22-26`
``get_assert_columns_equivalent``), then builds with the constraints
applied; a constraint violation aborts the build and leaves any existing
relation untouched (reference regression
`tests/functional/adapter/test_constraints.py` rollback tests).

Spark-first shape: the equivalence check is a driver-side schema diff
(zero jobs); not_null enforcement is ONE map-side-combinable aggregate
over only the constrained columns — at 100 TB that's a columnar scan of
the checked columns, no shuffle of the payload. When the table data was
just staged to parquet, the check runs against the staged files so the
model query is never recomputed.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_maxcompute_spark.functions.scalar import _normalize_type

CONSTRAINT_SUPPORT = {
    "not_null": "enforced",
    "check": "not_supported",
    "unique": "not_supported",
    "primary_key": "not_supported",
    "foreign_key": "not_supported",
}


class ContractError(ValueError):
    """Compile-time contract failure (column/type mismatch)."""


class ConstraintViolation(ValueError):
    """Build-time constraint failure (e.g. NULL in a not_null column)."""


@dataclass
class ColumnSpec:
    name: str
    data_type: str
    constraints: list[str] = field(default_factory=list)


@dataclass
class ModelContract:
    columns: list[ColumnSpec]
    enforced: bool = True

    @classmethod
    def parse(cls, raw: "ModelContract | dict[str, Any]") -> "ModelContract":
        if isinstance(raw, ModelContract):
            return raw
        cols = [
            ColumnSpec(
                name=c["name"],
                data_type=c["data_type"],
                constraints=[
                    k["type"] if isinstance(k, dict) else str(k)
                    for k in c.get("constraints", [])
                ],
            )
            for c in raw.get("columns", [])
        ]
        return cls(columns=cols, enforced=bool(raw.get("enforced", True)))

    def to_dict(self) -> dict[str, Any]:
        return {
            "enforced": self.enforced,
            "columns": [
                {"name": c.name, "data_type": c.data_type, "constraints": list(c.constraints)}
                for c in self.columns
            ],
        }

    def not_null_columns(self) -> list[str]:
        return [c.name for c in self.columns if "not_null" in c.constraints]


def assert_columns_equivalent(contract: ModelContract, df: DataFrame) -> None:
    """Declared columns must match the model's inferred columns by name
    and type (dbt's ``assert_columns_equivalent``; order-insensitive,
    both missing and unexpected columns are errors)."""
    declared = {c.name: _normalize_type(c.data_type) for c in contract.columns}
    inferred = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = []
    for name in declared.keys() - inferred.keys():
        problems.append(f"declared column {name!r} missing from model output")
    for name in inferred.keys() - declared.keys():
        problems.append(f"model column {name!r} not declared in contract")
    for name in declared.keys() & inferred.keys():
        want, got = declared[name], inferred[name]
        if want != got:
            problems.append(f"column {name!r}: declared {want!r} != inferred {got!r}")
    if problems:
        raise ContractError(
            "contract mismatch (reference get_assert_columns_equivalent): "
            + "; ".join(sorted(problems))
        )


def warn_unsupported_constraints(contract: ModelContract) -> list[str]:
    """NOT_SUPPORTED constraint types warn and are ignored (dbt's
    ConstraintSupport downgrade); unknown types are hard errors."""
    warned = []
    for col in contract.columns:
        for k in col.constraints:
            support = CONSTRAINT_SUPPORT.get(k)
            if support is None:
                raise ContractError(f"unknown constraint type {k!r} on column {col.name!r}")
            if support == "not_supported":
                msg = f"constraint {k!r} on column {col.name!r} is not supported and is ignored"
                warnings.warn(msg, stacklevel=3)
                warned.append(msg)
    return warned


def validate_not_null(df: DataFrame, cols: list[str]) -> None:
    """ONE aggregate over only the constrained columns; raises with
    per-column null counts on violation."""
    if not cols:
        return
    counts = df.select(
        *[F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(c) for c in cols]
    ).collect()[0]
    bad = {c: counts[c] for c in cols if counts[c]}
    if bad:
        raise ConstraintViolation(
            f"not_null constraint violated: null counts {bad} "
            "(build aborted; existing relation left untouched)"
        )
