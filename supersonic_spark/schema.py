"""Schema layer: supersonic's data model mapped onto Spark.

Reference:
- ``TupleSchema`` / ``Attribute``: base/infrastructure/tuple_schema.h:77-126
- ``DataType`` enum: proto/supersonic.proto:15-36
- ``Nullability``: proto/supersonic.proto:85-88
- ``EnumDefinition`` (number<->name maps): tuple_schema.h:42-75

Spark mapping (SURVEY.md §1): ``TupleSchema`` == ordered ``StructType``;
nullability is a first-class field property on both sides; ENUM has no native
Spark type, so it is carried as an IntegerType column plus a shared
``EnumDefinition`` dictionary that can encode/decode at the edges.

Unsigned types (UINT32/UINT64, types.h:96-118) have no Spark equivalent;
they widen to LongType with the documented caveat that the full UINT64 range
is not representable (SURVEY.md §7.4 item 3 pins LongType over Decimal(20,0)).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class Nullability(enum.Enum):
    """proto/supersonic.proto:85-88."""

    NULLABLE = "NULLABLE"
    NOT_NULLABLE = "NOT_NULLABLE"


class DataType(enum.Enum):
    """proto/supersonic.proto:15-36 (DATA_TYPE metatype intentionally omitted:
    Python-level type objects fill that role, SURVEY.md §1.2)."""

    INT32 = "INT32"
    INT64 = "INT64"
    UINT32 = "UINT32"
    UINT64 = "UINT64"
    FLOAT = "FLOAT"
    DOUBLE = "DOUBLE"
    BOOL = "BOOL"
    STRING = "STRING"
    BINARY = "BINARY"
    DATE = "DATE"
    DATETIME = "DATETIME"
    ENUM = "ENUM"


#: supersonic DataType -> Spark type (SURVEY.md §1.2 table).
_TO_SPARK: dict[DataType, T.DataType] = {
    DataType.INT32: T.IntegerType(),
    DataType.INT64: T.LongType(),
    DataType.UINT32: T.LongType(),  # widened; no unsigned in Spark
    DataType.UINT64: T.LongType(),  # documented range caveat
    DataType.FLOAT: T.FloatType(),
    DataType.DOUBLE: T.DoubleType(),
    DataType.BOOL: T.BooleanType(),
    DataType.STRING: T.StringType(),
    DataType.BINARY: T.BinaryType(),
    DataType.DATE: T.DateType(),
    # DATETIME is int64 MICROseconds since epoch (supersonic.proto:24);
    # Spark TimestampType is exactly µs precision.
    DataType.DATETIME: T.TimestampType(),
    DataType.ENUM: T.IntegerType(),  # id + EnumDefinition side dictionary
}

_FROM_SPARK: dict[type, DataType] = {
    T.IntegerType: DataType.INT32,
    T.LongType: DataType.INT64,
    T.FloatType: DataType.FLOAT,
    T.DoubleType: DataType.DOUBLE,
    T.BooleanType: DataType.BOOL,
    T.StringType: DataType.STRING,
    T.BinaryType: DataType.BINARY,
    T.DateType: DataType.DATE,
    T.TimestampType: DataType.DATETIME,
}


@dataclass(frozen=True)
class EnumDefinition:
    """Shared number<->name mapping for ENUM attributes
    (tuple_schema.h:42-75; lookups :49-51)."""

    number_to_name: dict[int, str] = field(default_factory=dict)

    def name(self, number: int) -> str | None:
        return self.number_to_name.get(number)

    def number(self, name: str) -> int | None:
        for k, v in self.number_to_name.items():
            if v == name:
                return k
        return None

    def decode_column(self, col) -> "F.Column":
        """id column -> name column via a literal map lookup (the dictionary
        ships inside the plan — the expression-level analog of a broadcast
        dict; unknown ids decode to NULL)."""
        c = F.col(col) if isinstance(col, str) else col
        if not self.number_to_name:
            return F.lit(None).cast(T.StringType())
        pairs = [x for num, nm in self.number_to_name.items()
                 for x in (F.lit(num), F.lit(nm))]
        return F.element_at(F.create_map(*pairs), c.cast(T.IntegerType()))

    def encode_column(self, col) -> "F.Column":
        """name column -> id column (unknown names encode to NULL)."""
        c = F.col(col) if isinstance(col, str) else col
        if not self.number_to_name:
            return F.lit(None).cast(T.IntegerType())
        pairs = [x for num, nm in self.number_to_name.items()
                 for x in (F.lit(nm), F.lit(num))]
        return F.element_at(F.create_map(*pairs), c).cast(T.IntegerType())

    @classmethod
    def from_values(cls, values: "list[str]") -> "EnumDefinition":
        """Build a definition from a name list; ids are assigned 0..n-1 in
        sorted order (deterministic across runs/clusters)."""
        return cls({i: v for i, v in enumerate(sorted(set(values)))})

    def to_json(self) -> str:
        import json

        return json.dumps({str(k): v for k, v in self.number_to_name.items()},
                          sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "EnumDefinition":
        import json

        return cls({int(k): v for k, v in json.loads(s).items()})


@dataclass(frozen=True)
class Attribute:
    """(name, type, nullability[, enum]) — tuple_schema.h:77-124."""

    name: str
    type: DataType
    nullability: Nullability = Nullability.NULLABLE
    enum_definition: EnumDefinition | None = None

    def is_nullable(self) -> bool:
        return self.nullability is Nullability.NULLABLE

    def to_struct_field(self) -> T.StructField:
        return T.StructField(self.name, _TO_SPARK[self.type], self.is_nullable())


@dataclass(frozen=True)
class TupleSchema:
    """Ordered attribute list — tuple_schema.h:126."""

    attributes: tuple[Attribute, ...]

    def __init__(self, attributes) -> None:
        object.__setattr__(self, "attributes", tuple(attributes))

    # --- reference API surface (tuple_schema.h) ---
    def attribute_count(self) -> int:
        return len(self.attributes)

    def attribute(self, position: int) -> Attribute:
        return self.attributes[position]

    def lookup_attribute_position(self, name: str) -> int:
        for i, a in enumerate(self.attributes):
            if a.name == name:
                return i
        return -1

    # --- Spark bridge ---
    def to_struct_type(self) -> T.StructType:
        return T.StructType([a.to_struct_field() for a in self.attributes])

    @classmethod
    def from_struct_type(cls, st: T.StructType) -> "TupleSchema":
        attrs = []
        for f_ in st.fields:
            dt = _FROM_SPARK.get(type(f_.dataType))
            if dt is None:
                raise TypeError(
                    f"no supersonic DataType for Spark type {f_.dataType}; "
                    "the reference data model is flat-relational "
                    "(SURVEY.md §1.1)"
                )
            attrs.append(
                Attribute(
                    f_.name,
                    dt,
                    Nullability.NULLABLE if f_.nullable else Nullability.NOT_NULLABLE,
                )
            )
        return cls(attrs)

    @classmethod
    def of_dataframe(cls, df: DataFrame) -> "TupleSchema":
        return cls.from_struct_type(df.schema)

    def are_equal(self, other: "TupleSchema", check_nullability: bool = True) -> bool:
        """TupleSchema::AreEqual (tuple_schema.h) — name+type, optionally
        nullability."""
        if self.attribute_count() != other.attribute_count():
            return False
        for a, b in zip(self.attributes, other.attributes):
            if a.name != b.name or a.type != b.type:
                return False
            if check_nullability and a.nullability != b.nullability:
                return False
        return True
