"""The directives DSL type system (SURVEY §1.2).

Reference: ``Type`` enum ``Any | Bool | Number | String | Array(T) |
Map(T)`` (``lib-lopez/src/type.rs:11-19``; maps are always
string-keyed, ``type.rs:93-103``).  Static type inference + checking
happens at directive-load time (``directives.rs:297-369``): every
aggregator expression must type-check before a crawl starts, so the
analysis output schema is a fixed Spark StructType per wave.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    MapType,
    StringType,
)


class TypeError_(Exception):
    """Directive type-check failure (fail-fast, before execution)."""


@dataclass(frozen=True)
class Ty:
    kind: str  # any | bool | number | string | array | map
    inner: "Ty | None" = None

    def __str__(self) -> str:
        if self.kind == "array":
            return f"array[{self.inner}]"
        if self.kind == "map":
            return f"map[string, {self.inner}]"
        return self.kind


ANY = Ty("any")
BOOL = Ty("bool")
NUMBER = Ty("number")  # always f64 (value_ext.rs:8-13)
STRING = Ty("string")


def array_of(t: Ty) -> Ty:
    return Ty("array", t)


def map_of(t: Ty) -> Ty:
    return Ty("map", t)


def to_spark(t: Ty) -> DataType:
    """§1.2 mapping table."""
    if t.kind == "bool":
        return BooleanType()
    if t.kind == "number":
        return DoubleType()
    if t.kind in ("string", "any"):
        return StringType()
    if t.kind == "array":
        return ArrayType(to_spark(t.inner))
    if t.kind == "map":
        return MapType(StringType(), to_spark(t.inner))
    raise TypeError_(f"unmapped type {t}")
