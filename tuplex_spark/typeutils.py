"""Type inference & widening.

Replicates the reference's type lattice (utils/include/TypeSystem.h:253
``superType``: bool -> int -> float; Option[T] for nullable) on Spark types.
Used by ``parallelize`` schema inference and by the sample-driven output
typing of fallback UDFs (the Spark-idiomatic stand-in for the reference's
tracing type inference, core/src/TraceVisitor.cc).
"""

from __future__ import annotations

from pyspark.sql import types as T

def _numeric_rank(t: T.DataType) -> int | None:
    """Position in the reference's numeric lattice bool < int < float
    (TypeSystem.h:253 superType).  Class-based — simpleString() names
    ('bigint', not 'long') made a string-keyed table silently miss, so
    int-vs-float mixes fell through to the universal-string fallback."""
    if isinstance(t, T.BooleanType):
        return 0
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return 1
    if isinstance(t, (T.FloatType, T.DoubleType)):
        return 2
    return None


def infer_type(value) -> T.DataType | None:
    """Spark type of one Python value; None for Python ``None``."""
    if value is None:
        return None
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, str):
        return T.StringType()
    if isinstance(value, (bytes, bytearray)):
        return T.BinaryType()
    if isinstance(value, tuple):
        if not value:
            # unit type: Spark has no empty struct — callers treat None
            # for a non-None value as "unrepresentable" and promote the
            # row set to PYOBJECT (reference: TypeSystem EMPTYTUPLE)
            return None
        fields = []
        for i, v in enumerate(value):
            t = infer_type(v)
            if t is None and v is not None:
                return None  # nested unrepresentable value
            fields.append(T.StructField(f"_{i}", t or T.NullType(),
                                        v is None))
        return T.StructType(fields)
    if isinstance(value, list):
        elem: T.DataType | None = None
        nullable = False
        for v in value:
            t = infer_type(v)
            if t is None:
                if v is not None:
                    return None  # nested unrepresentable value
                nullable = True
            else:
                elem = t if elem is None else super_type(elem, t)
        # a NullType element must be declared nullable — Arrow rejects
        # non-nullable null fields (empty lists hit this)
        return T.ArrayType(elem or T.NullType(),
                           containsNull=nullable or elem is None)
    if isinstance(value, dict):
        kt: T.DataType | None = None
        vt: T.DataType | None = None
        nullable = False
        for k, v in value.items():
            ktype = infer_type(k)
            kt = ktype if kt is None else super_type(kt, ktype)
            t = infer_type(v)
            if t is None:
                nullable = True
            else:
                vt = t if vt is None else super_type(vt, t)
        return T.MapType(kt or T.StringType(), vt or T.NullType(),
                         valueContainsNull=nullable)
    import datetime
    if isinstance(value, datetime.datetime):
        return T.TimestampType()
    if isinstance(value, datetime.date):
        return T.DateType()
    # PYOBJECT escape hatch: caller decides (binary-pickle or RDD path)
    return None


def super_type(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least common supertype, numeric lattice bool < long < double."""
    if a == b:
        return a
    ra, rb = _numeric_rank(a), _numeric_rank(b)
    if ra is not None and rb is not None:
        return a if ra >= rb else b
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(super_type(a.elementType, b.elementType),
                           a.containsNull or b.containsNull)
    if isinstance(a, T.StructType) and isinstance(b, T.StructType) \
            and len(a.fields) == len(b.fields):
        return T.StructType([
            T.StructField(fa.name, super_type(fa.dataType, fb.dataType),
                          fa.nullable or fb.nullable)
            for fa, fb in zip(a.fields, b.fields)
        ])
    if isinstance(a, T.MapType) and isinstance(b, T.MapType):
        return T.MapType(super_type(a.keyType, b.keyType),
                         super_type(a.valueType, b.valueType),
                         a.valueContainsNull or b.valueContainsNull)
    # incompatible -> string as the universal printable type
    return T.StringType()


def infer_schema_from_rows(rows, columns: list[str] | None = None) -> T.StructType:
    """Schema for a list of Python rows (scalars or tuples), widening
    column-wise; None contributes nullability (Option[T] semantics)."""
    width = None
    for r in rows:
        w = len(r) if isinstance(r, tuple) else 1
        if width is None:
            width = w
        elif width != w:
            raise ValueError(f"non-uniform row width: {width} vs {w}")
    width = width or 1
    types: list[T.DataType | None] = [None] * width
    nullable = [False] * width
    for r in rows:
        vals = r if isinstance(r, tuple) else (r,)
        for i, v in enumerate(vals):
            t = infer_type(v)
            if t is None:
                nullable[i] = True
            else:
                types[i] = t if types[i] is None else super_type(types[i], t)
    names = columns or [f"column{i}" for i in range(width)]
    return T.StructType([
        T.StructField(names[i], types[i] or T.NullType(),
                      nullable[i] or types[i] is None)
        for i in range(width)
    ])
