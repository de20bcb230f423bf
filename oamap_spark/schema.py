"""oamap's schema language — the six PLURTP node types — Spark-first.

oamap models every dataset as a tree of six generator node types
(SURVEY.md §1.2: ``oamap/schema.py`` — Primitive, List, Union, Record,
Tuple, Pointer [H]). This module gives the engine the same first-class
schema DSL, with a bidirectional mapping onto Spark's type system:

====================  =====================================================
oamap node            Spark re-expression
====================  =====================================================
``Primitive(dtype)``  the matching atomic ``DataType`` (numpy-style names;
                      unsigned ints widen to the next signed size — Spark
                      has no unsigned types, and widening preserves values)
``List(content)``     ``ArrayType`` (oamap starts/stops → Spark offsets:
                      the identical columnar encoding)
``Record(fields)``    ``StructType``; the record *type name* (oamap's
                      ``recordname``) rides in StructField metadata
                      (``oamap.recordname``) when the record is a field
``Tuple(types)``      ``StructType`` with positional fields ``_0.._n``
                      (the structural marker; round-trip detected)
``Union(psbl)``       tagged struct ``(tag int, v_0..v_n nullable slots)``
                      — the ``operators/links.union_encode`` shape; exactly
                      one live slot per row (oamap tags+offsets [H])
``Pointer(target)``   bigint surrogate key (positions array → join key;
                      deref via ``operators/links.resolve_pointer``); the
                      target schema rides in ``oamap.pointer`` metadata
                      when the pointer is a record field. ``target`` may
                      be a STRING naming an enclosing Record — the
                      recursive named-schema form (linked lists, trees);
                      traversal = iterative join
                      (``links.iterate_pointer``/``pointer_depth_root``)
====================  =====================================================

``from_spark(to_spark(node))`` is the identity for every tree in which
Pointer and named-Record nodes occur as record fields (where Spark has a
metadata slot to carry them); elsewhere they degrade — documented, and
pinned by tests — to ``Primitive("int64")`` / anonymous ``Record``.
Two further documented degradations (both pinned by tests): unsigned
ints widen on the round trip (uint8/16/32 → the next-wider signed
Spark type → read back as int16/32/64; only uint64 survives, via
decimal(20,0)), and a Union possibility's nullable flag is dropped
(variant slots are physically written nullable — only one slot is
populated per row — and read back nullable=False).

``infer(objs)`` reproduces oamap ``fromdata``'s schema inference
(SURVEY.md §3 entry 2): dicts → Record, lists → List, tuples → Tuple,
numeric conflicts widen (bool < int64 < float64), non-widenable
conflicts synthesize Union, ``None`` marks nullability rather than
creating a variant.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

__all__ = [
    "Node",
    "Primitive",
    "List",
    "Union",
    "Record",
    "Tuple",
    "Pointer",
    "to_spark",
    "from_spark",
    "infer",
]


# ---------------------------------------------------------------------------
# Node types
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Node:
    """Base of the six PLURTP schema nodes."""

    def with_nullable(self, nullable: bool = True) -> "Node":
        from dataclasses import replace

        return replace(self, nullable=nullable)


@dataclass(frozen=True, repr=False)
class Primitive(Node):
    dtype: str = "float64"
    nullable: bool = False

    def __repr__(self) -> str:  # oamap prints Primitive(dtype)
        n = ", nullable=True" if self.nullable else ""
        return f"Primitive({self.dtype!r}{n})"


@dataclass(frozen=True, repr=False)
class List(Node):
    content: Node = field(default_factory=Primitive)
    nullable: bool = False

    def __repr__(self) -> str:
        n = ", nullable=True" if self.nullable else ""
        return f"List({self.content!r}{n})"


@dataclass(frozen=True, repr=False)
class Record(Node):
    # accepts a dict at construction; stored as an ordered tuple so the
    # node is hashable (schema equality is structural + order-sensitive,
    # matching Spark struct field order)
    fields: Any = field(default_factory=tuple)
    name: str | None = None
    nullable: bool = False

    def __post_init__(self):
        f = self.fields
        if isinstance(f, dict):
            f = tuple(f.items())
        object.__setattr__(self, "fields", tuple((str(k), v) for k, v in f))

    def field_dict(self) -> dict[str, Node]:
        return dict(self.fields)

    def __repr__(self) -> str:
        inner = ", ".join(f"{k!r}: {v!r}" for k, v in self.fields)
        nm = f", name={self.name!r}" if self.name else ""
        n = ", nullable=True" if self.nullable else ""
        return f"Record({{{inner}}}{nm}{n})"


@dataclass(frozen=True, repr=False)
class Tuple(Node):
    types: Any = field(default_factory=tuple)
    nullable: bool = False

    def __post_init__(self):
        object.__setattr__(self, "types", tuple(self.types))

    def __repr__(self) -> str:
        n = ", nullable=True" if self.nullable else ""
        return f"Tuple({list(self.types)!r}{n})"


@dataclass(frozen=True, repr=False)
class Union(Node):
    possibilities: Any = field(default_factory=tuple)
    nullable: bool = False

    def __post_init__(self):
        object.__setattr__(self, "possibilities", tuple(self.possibilities))

    def __repr__(self) -> str:
        n = ", nullable=True" if self.nullable else ""
        return f"Union({list(self.possibilities)!r}{n})"


@dataclass(frozen=True, repr=False)
class Pointer(Node):
    """``target`` may be a Node (pointer into a separately-described
    structure) or a STRING naming an enclosing Record — the recursive
    named-schema case (oamap: Pointer to a named ancestor; linked
    lists, trees). The by-name form keeps the schema tree acyclic and
    JSON-serializable; it materializes as the same bigint surrogate
    key, and traversal is an iterative join
    (operators/links.iterate_pointer / pointer_depth_root)."""

    target: Node | str = field(default_factory=Primitive)
    nullable: bool = False

    def __repr__(self) -> str:
        n = ", nullable=True" if self.nullable else ""
        return f"Pointer({self.target!r}{n})"


# ---------------------------------------------------------------------------
# Primitive dtype ↔ Spark atomic type
# ---------------------------------------------------------------------------

_PRIM_TO_SPARK: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    # Spark has no unsigned ints: widen to the next signed size that
    # holds every value (uint64 → DecimalType(20,0), exact).
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
}

_SPARK_TO_PRIM: dict[str, str] = {
    "boolean": "bool",
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "bigint": "int64",
    "decimal(20,0)": "uint64",
    "float": "float32",
    "double": "float64",
    "string": "string",
    "binary": "bytes",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
}


def _union_slot(i: int) -> str:
    return f"v_{i}"


def _meta(node: Node) -> dict:
    """StructField metadata carrying what Spark's anonymous product
    types can't express structurally."""
    m: dict = {}
    if isinstance(node, Record) and node.name:
        m["oamap.recordname"] = node.name
    if isinstance(node, Pointer):
        m["oamap.pointer"] = json.dumps(
            {"named": node.target}
            if isinstance(node.target, str)
            else _to_spec(node.target)
        )
    return m


# spec = a JSON-able nested description, used only inside metadata
def _to_spec(node: Node) -> dict:
    if isinstance(node, Primitive):
        return {"p": node.dtype, "n": node.nullable}
    if isinstance(node, List):
        return {"l": _to_spec(node.content), "n": node.nullable}
    if isinstance(node, Record):
        return {
            "r": [[k, _to_spec(v)] for k, v in node.fields],
            "name": node.name,
            "n": node.nullable,
        }
    if isinstance(node, Tuple):
        return {"t": [_to_spec(v) for v in node.types], "n": node.nullable}
    if isinstance(node, Union):
        return {"u": [_to_spec(v) for v in node.possibilities], "n": node.nullable}
    if isinstance(node, Pointer):
        if isinstance(node.target, str):  # by-name ref to a named ancestor
            return {"ptrn": node.target, "n": node.nullable}
        return {"ptr": _to_spec(node.target), "n": node.nullable}
    raise TypeError(f"not a schema node: {node!r}")


def _from_spec(spec: dict) -> Node:
    n = bool(spec.get("n"))
    if "p" in spec:
        return Primitive(spec["p"], nullable=n)
    if "l" in spec:
        return List(_from_spec(spec["l"]), nullable=n)
    if "r" in spec:
        return Record(
            tuple((k, _from_spec(v)) for k, v in spec["r"]),
            name=spec.get("name"),
            nullable=n,
        )
    if "t" in spec:
        return Tuple(tuple(_from_spec(v) for v in spec["t"]), nullable=n)
    if "u" in spec:
        return Union(tuple(_from_spec(v) for v in spec["u"]), nullable=n)
    if "ptrn" in spec:
        return Pointer(spec["ptrn"], nullable=n)
    if "ptr" in spec:
        return Pointer(_from_spec(spec["ptr"]), nullable=n)
    raise ValueError(f"bad schema spec: {spec!r}")


# ---------------------------------------------------------------------------
# to_spark / from_spark
# ---------------------------------------------------------------------------

def to_spark(node: Node) -> T.DataType:
    """PLURTP tree → Spark DataType. A top-level Record becomes the
    StructType you hand to ``createDataFrame`` / ``fromdata``."""
    if isinstance(node, Primitive):
        try:
            return _PRIM_TO_SPARK[node.dtype]
        except KeyError:
            raise ValueError(
                f"unknown primitive dtype {node.dtype!r}; expected one of "
                f"{sorted(_PRIM_TO_SPARK)}"
            ) from None
    if isinstance(node, List):
        return T.ArrayType(to_spark(node.content), containsNull=node.content.nullable)
    if isinstance(node, Record):
        return T.StructType(
            [
                T.StructField(k, to_spark(v), nullable=v.nullable, metadata=_meta(v))
                for k, v in node.fields
            ]
        )
    if isinstance(node, Tuple):
        return T.StructType(
            [
                T.StructField(f"_{i}", to_spark(v), nullable=v.nullable, metadata=_meta(v))
                for i, v in enumerate(node.types)
            ]
        )
    if isinstance(node, Union):
        # exactly one live slot per row; tag selects it (links.union_encode)
        fields = [T.StructField("tag", T.IntegerType(), nullable=False)]
        fields += [
            T.StructField(_union_slot(i), to_spark(v), nullable=True, metadata=_meta(v))
            for i, v in enumerate(node.possibilities)
        ]
        return T.StructType(fields)
    if isinstance(node, Pointer):
        # positions array → bigint surrogate key; target schema survives
        # only via field metadata (attached by the enclosing Record/Tuple)
        return T.LongType()
    raise TypeError(f"not a schema node: {node!r}")


def _is_tuple_struct(st: T.StructType) -> bool:
    return len(st.fields) > 0 and all(
        f.name == f"_{i}" for i, f in enumerate(st.fields)
    )


def _is_union_struct(st: T.StructType) -> bool:
    if len(st.fields) < 2 or st.fields[0].name != "tag":
        return False
    if not isinstance(st.fields[0].dataType, (T.IntegerType, T.LongType, T.ByteType, T.ShortType)):
        return False
    return all(f.name == _union_slot(i) for i, f in enumerate(st.fields[1:]))


def from_spark(dt: T.DataType, *, nullable: bool = False, metadata: dict | None = None) -> Node:
    """Spark DataType → PLURTP tree (inverse of :func:`to_spark`).

    Detection order for structs: union shape (``tag`` + ``v_i`` slots),
    tuple shape (``_0.._n``), else Record. A bigint field whose
    metadata carries ``oamap.pointer`` comes back as that Pointer; a
    struct field with ``oamap.recordname`` regains its record name.
    """
    metadata = metadata or {}
    if "oamap.pointer" in metadata and isinstance(dt, T.LongType):
        spec = json.loads(metadata["oamap.pointer"])
        target = spec["named"] if "named" in spec else _from_spec(spec)
        return Pointer(target, nullable=nullable)
    if isinstance(dt, T.StructType):
        if _is_union_struct(dt):
            return Union(
                tuple(
                    from_spark(f.dataType, nullable=False, metadata=f.metadata)
                    for f in dt.fields[1:]
                ),
                nullable=nullable,
            )
        if _is_tuple_struct(dt):
            return Tuple(
                tuple(
                    from_spark(f.dataType, nullable=f.nullable, metadata=f.metadata)
                    for f in dt.fields
                ),
                nullable=nullable,
            )
        return Record(
            tuple(
                (f.name, from_spark(f.dataType, nullable=f.nullable, metadata=f.metadata))
                for f in dt.fields
            ),
            name=metadata.get("oamap.recordname"),
            nullable=nullable,
        )
    if isinstance(dt, T.ArrayType):
        return List(
            from_spark(dt.elementType, nullable=dt.containsNull), nullable=nullable
        )
    name = dt.simpleString()
    if name in _SPARK_TO_PRIM:
        return Primitive(_SPARK_TO_PRIM[name], nullable=nullable)
    raise ValueError(f"no PLURTP mapping for Spark type {name!r}")


# ---------------------------------------------------------------------------
# Inference (oamap fromdata's schema pass, SURVEY §3 entry 2)
# ---------------------------------------------------------------------------

_WIDEN_ORDER = ("bool", "int64", "float64")

# A position observed only as None: merges into whatever type later rows
# reveal (marking it nullable) instead of fabricating a Union; resolves
# to nullable float64 if no row ever shows a value (oamap's convention —
# an all-masked primitive defaults to floating point).
_UNKNOWN = Primitive("unknown", nullable=True)


def _resolve_unknown(node: Node) -> Node:
    if isinstance(node, Primitive):
        return Primitive("float64", nullable=True) if node.dtype == "unknown" else node
    if isinstance(node, List):
        return List(_resolve_unknown(node.content), nullable=node.nullable)
    if isinstance(node, Record):
        return Record(
            tuple((k, _resolve_unknown(v)) for k, v in node.fields),
            name=node.name,
            nullable=node.nullable,
        )
    if isinstance(node, Tuple):
        return Tuple(tuple(_resolve_unknown(v) for v in node.types), nullable=node.nullable)
    if isinstance(node, Union):
        return Union(
            tuple(_resolve_unknown(v) for v in node.possibilities), nullable=node.nullable
        )
    if isinstance(node, Pointer):
        if isinstance(node.target, str):
            return node
        return Pointer(_resolve_unknown(node.target), nullable=node.nullable)
    return node


def _infer_one(obj: Any) -> Node | None:
    """Schema of a single value; None for Python None (nullability)."""
    if obj is None:
        return None
    if isinstance(obj, bool):  # before int — bool is an int subclass
        return Primitive("bool")
    if isinstance(obj, int):
        return Primitive("int64")
    if isinstance(obj, float):
        return Primitive("float64")
    if isinstance(obj, str):
        return Primitive("string")
    if isinstance(obj, (bytes, bytearray)):
        return Primitive("bytes")
    if isinstance(obj, tuple):
        return Tuple(tuple(_infer_one_nullable(v) for v in obj))
    if isinstance(obj, dict):
        return Record(tuple((k, _infer_one_nullable(v)) for k, v in obj.items()))
    if isinstance(obj, (list,)):
        merged: Node | None = None
        saw_null = False
        for v in obj:
            s = _infer_one(v)
            if s is None:
                saw_null = True
                continue
            merged = s if merged is None else _merge(merged, s)
        content = merged if merged is not None else _UNKNOWN
        if saw_null:
            content = content.with_nullable()
        return List(content)
    raise TypeError(f"cannot infer a schema node for {type(obj).__name__}")


def _infer_one_nullable(obj: Any) -> Node:
    s = _infer_one(obj)
    return s if s is not None else _UNKNOWN


def _merge(a: Node, b: Node) -> Node:
    """Merge two observed schemas: equal → itself; numeric → widen;
    records → union of fields (missing field = nullable); otherwise a
    Union node (oamap's inference-synthesized sum type)."""
    nullable = a.nullable or b.nullable
    if isinstance(a, Primitive) and a.dtype == "unknown":
        return b.with_nullable()
    if isinstance(b, Primitive) and b.dtype == "unknown":
        return a.with_nullable()
    if type(a) is type(b):
        if isinstance(a, Primitive) and isinstance(b, Primitive):
            if a.dtype == b.dtype:
                return Primitive(a.dtype, nullable=nullable)
            if a.dtype in _WIDEN_ORDER and b.dtype in _WIDEN_ORDER:
                dt = max(a.dtype, b.dtype, key=_WIDEN_ORDER.index)
                return Primitive(dt, nullable=nullable)
        elif isinstance(a, List) and isinstance(b, List):
            return List(_merge(a.content, b.content), nullable=nullable)
        elif isinstance(a, Record) and isinstance(b, Record):
            da, db = a.field_dict(), b.field_dict()
            keys = list(da) + [k for k in db if k not in da]
            out = []
            for k in keys:
                if k in da and k in db:
                    out.append((k, _merge(da[k], db[k])))
                else:
                    out.append((k, (da.get(k) or db[k]).with_nullable()))
            return Record(tuple(out), name=a.name or b.name, nullable=nullable)
        elif isinstance(a, Tuple) and isinstance(b, Tuple) and len(a.types) == len(b.types):
            return Tuple(
                tuple(_merge(x, y) for x, y in zip(a.types, b.types)), nullable=nullable
            )
        if a == b:
            return a.with_nullable() if nullable and not a.nullable else a
    # non-widenable conflict → Union (flatten nested unions, dedup)
    poss: list[Node] = []
    for side in (a, b):
        cands = side.possibilities if isinstance(side, Union) else (side,)
        for c in cands:
            c = c.with_nullable(False) if c.nullable else c
            if c not in poss:
                poss.append(c)
    return Union(tuple(poss), nullable=nullable)


def infer(objs: Any) -> Node:
    """Infer the PLURTP schema of one object or a sequence of rows
    (a sequence infers the *row* schema merged across rows, the way
    ``fromdata`` sees a dataset)."""
    if isinstance(objs, (list, tuple)) and objs and all(
        isinstance(o, dict) for o in objs
    ):
        merged: Node | None = None
        for o in objs:
            s = _infer_one(o)
            merged = s if merged is None else _merge(merged, s)
        assert merged is not None
        return _resolve_unknown(merged)
    one = _infer_one(objs)
    return _resolve_unknown(one) if one is not None else Primitive("float64", nullable=True)
