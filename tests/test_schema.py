"""PLURTP schema language (oamap/schema.py's six node types [H] —
SURVEY §1.2) ↔ Spark types: lowering, round-trips, inference."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from oamap_spark.schema import (
    List,
    Node,
    Pointer,
    Primitive,
    Record,
    Tuple,
    Union,
    from_spark,
    infer,
    to_spark,
)


# ---------------------------------------------------------------------------
# to_spark lowering
# ---------------------------------------------------------------------------

def test_primitive_lowering():
    assert to_spark(Primitive("int64")) == T.LongType()
    assert to_spark(Primitive("float32")) == T.FloatType()
    assert to_spark(Primitive("string")) == T.StringType()
    assert to_spark(Primitive("bytes")) == T.BinaryType()
    # unsigned widens to the next signed size that holds all values
    assert to_spark(Primitive("uint8")) == T.ShortType()
    assert to_spark(Primitive("uint32")) == T.LongType()
    assert to_spark(Primitive("uint64")) == T.DecimalType(20, 0)


def test_unknown_dtype_raises():
    with pytest.raises(ValueError, match="unknown primitive dtype"):
        to_spark(Primitive("complex128"))


def test_list_lowering_carries_content_nullability():
    assert to_spark(List(Primitive("int64"))) == T.ArrayType(T.LongType(), False)
    assert to_spark(List(Primitive("int64", nullable=True))) == T.ArrayType(
        T.LongType(), True
    )


def test_record_lowering():
    st_ = to_spark(Record({"x": Primitive("int64"), "y": List(Primitive("float64"))}))
    assert isinstance(st_, T.StructType)
    assert [f.name for f in st_.fields] == ["x", "y"]
    assert st_["x"].dataType == T.LongType()
    assert st_["y"].dataType == T.ArrayType(T.DoubleType(), False)


def test_tuple_lowering_positional_fields():
    st_ = to_spark(Tuple([Primitive("int64"), Primitive("string")]))
    assert [f.name for f in st_.fields] == ["_0", "_1"]


def test_union_lowering_matches_union_encode_shape():
    st_ = to_spark(Union([Primitive("int64"), Primitive("string")]))
    assert [f.name for f in st_.fields] == ["tag", "v_0", "v_1"]
    assert st_["tag"].dataType == T.IntegerType()
    assert not st_["tag"].nullable
    assert st_["v_0"].nullable and st_["v_1"].nullable


def test_pointer_lowering_is_surrogate_key():
    assert to_spark(Pointer(Primitive("string"))) == T.LongType()


# ---------------------------------------------------------------------------
# round-trips
# ---------------------------------------------------------------------------

ROUNDTRIP_CASES = [
    Record({"x": Primitive("int64")}),
    Record({"xs": List(Primitive("float64", nullable=True))}),
    Record({"t": Tuple([Primitive("int64"), Primitive("string")])}),
    Record({"u": Union([Primitive("int64"), List(Primitive("string"))])}),
    Record({"p": Pointer(Record({"name": Primitive("string")}))}),
    Record(
        {"ev": Record({"id": Primitive("int64")}, name="Event")},
        name="Row",
    ),
    Record({"deep": List(List(Record({"q": Tuple([Primitive("bool")])})))}),
]


@pytest.mark.parametrize("node", ROUNDTRIP_CASES, ids=lambda n: repr(n)[:50])
def test_roundtrip_exact(node):
    # recordname on the TOP-level record has no StructField to ride on
    # (documented); compare against the name-stripped expectation there
    back = from_spark(to_spark(node))
    expect = node.with_nullable(False)
    if isinstance(expect, Record) and expect.name is not None:
        from dataclasses import replace

        expect = replace(expect, name=None)
    assert back == expect


def test_pointer_outside_record_degrades_to_int64():
    # no metadata slot to carry the target → documented degradation
    back = from_spark(to_spark(List(Pointer(Primitive("string")))))
    assert back == List(Primitive("int64"))


_prims = st.sampled_from(
    ["bool", "int8", "int16", "int32", "int64", "float32", "float64", "string", "bytes"]
)


def _node_strategy(depth: int) -> st.SearchStrategy[Node]:
    prim = st.builds(Primitive, _prims, nullable=st.booleans())
    if depth <= 0:
        return prim
    sub = _node_strategy(depth - 1)
    names = st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=4), min_size=1,
        max_size=3, unique=True,
    )
    rec = st.builds(
        lambda ks, vs: Record(tuple(zip(ks, vs))),
        names,
        st.lists(sub, min_size=3, max_size=3),
    )
    tup = st.builds(lambda vs: Tuple(tuple(vs)), st.lists(sub, min_size=1, max_size=3))
    uni = st.builds(
        lambda vs: Union(tuple(dict.fromkeys(v.with_nullable(False) for v in vs))),
        st.lists(sub, min_size=2, max_size=3),
    )
    lst = st.builds(List, sub, nullable=st.booleans())
    return st.one_of(prim, lst, rec, tup, uni)


@settings(max_examples=60, deadline=None)
@given(node=_node_strategy(2))
def test_roundtrip_property(node):
    row = Record({"c": node.with_nullable(False) if node.nullable else node})
    assert from_spark(to_spark(row)) == row


# ---------------------------------------------------------------------------
# inference (oamap fromdata's schema pass)
# ---------------------------------------------------------------------------

def test_infer_primitives_and_bool_is_not_int():
    assert infer(3) == Primitive("int64")
    assert infer(True) == Primitive("bool")
    assert infer(1.5) == Primitive("float64")
    assert infer("s") == Primitive("string")
    assert infer(b"b") == Primitive("bytes")


def test_infer_record_list_tuple():
    got = infer({"x": 1, "ys": [1.0, 2.0], "t": (1, "a")})
    assert got == Record(
        {
            "x": Primitive("int64"),
            "ys": List(Primitive("float64")),
            "t": Tuple([Primitive("int64"), Primitive("string")]),
        }
    )


def test_infer_numeric_conflict_widens_not_union():
    assert infer([{"x": 1}, {"x": 2.5}]) == Record({"x": Primitive("float64")})
    assert infer([{"x": True}, {"x": 3}]) == Record({"x": Primitive("int64")})


def test_infer_non_widenable_conflict_synthesizes_union():
    got = infer([{"x": 1}, {"x": "s"}])
    assert got == Record({"x": Union([Primitive("int64"), Primitive("string")])})


def test_infer_structural_conflict_synthesizes_union():
    got = infer([{"x": 1}, {"x": [1, 2]}])
    assert got == Record({"x": Union([Primitive("int64"), List(Primitive("int64"))])})


def test_infer_none_marks_nullable_not_variant():
    got = infer([{"x": None}, {"x": "s"}])
    assert got == Record({"x": Primitive("string", nullable=True)})


def test_infer_missing_field_is_nullable():
    got = infer([{"x": 1, "y": "a"}, {"x": 2}])
    assert got == Record(
        {"x": Primitive("int64"), "y": Primitive("string", nullable=True)}
    )


def test_infer_all_null_defaults_float64():
    got = infer([{"x": None}, {"x": None}])
    assert got == Record({"x": Primitive("float64", nullable=True)})


def test_infer_list_merges_elements_across_rows():
    got = infer([{"xs": [1]}, {"xs": [2.0, None]}])
    assert got == Record({"xs": List(Primitive("float64", nullable=True))})


# ---------------------------------------------------------------------------
# integration: fromdata with a PLURTP schema
# ---------------------------------------------------------------------------

def test_fromdata_accepts_plurtp_schema(spark):
    from oamap_spark.sources.fill import fromdata, to_objects

    node = Record({"x": Primitive("int64"), "ys": List(Primitive("float64"))})
    df = fromdata(spark, [{"x": 1, "ys": [1.0, 2.0]}, {"x": 2, "ys": []}], schema=node)
    assert df.schema == to_spark(node)
    assert from_spark(df.schema) == node
    assert sorted(to_objects(df), key=lambda r: r["x"]) == [
        {"x": 1, "ys": [1.0, 2.0]},
        {"x": 2, "ys": []},
    ]


def test_fromdata_rejects_non_record_top_level(spark):
    from oamap_spark.sources.fill import fromdata

    with pytest.raises(TypeError, match="Record"):
        fromdata(spark, [{"x": 1}], schema=Primitive("int64"))


def test_infer_matches_fill_union_shape(spark):
    """schema.infer's Union node lowers to exactly the struct shape
    fill.fromdata auto-encodes for the same conflicting data."""
    from oamap_spark.sources.fill import fromdata

    objs = [{"x": 1}, {"x": "s"}]
    node = infer(objs)
    lowered = to_spark(node)
    df = fromdata(spark, objs)  # auto union-encode path
    x = df.schema["x"].dataType
    assert isinstance(x, T.StructType)
    assert x.fieldNames()[0] == "tag"
    assert lowered["x"].dataType.fieldNames()[0] == "tag"
    assert len(x.fields) == len(lowered["x"].dataType.fields)
