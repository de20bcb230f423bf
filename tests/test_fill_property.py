"""Property-based round-trip for fromdata/to_objects (hypothesis):
random nested object trees survive ingest exactly, modulo documented
inference widening — the generalized form of oamap's `proxy ==
original` deep-compare test pattern (SURVEY §5)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oamap_spark.sources import fill

# Scalars: ints stay exact; floats restricted to finite values that
# survive a JSON round trip; strings printable-ASCII (JSON-safe).
_scalars = st.one_of(
    st.integers(min_value=-(2**53) + 1, max_value=2**53 - 1),
    st.floats(
        allow_nan=False, allow_infinity=False, width=64, min_value=-1e12, max_value=1e12
    ),
    st.text(st.characters(min_codepoint=32, max_codepoint=126), max_size=8),
    st.none(),
)

# Nested values: scalars, lists thereof, records thereof — depth ≤ 3.
_values = st.recursive(
    _scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(
            st.sampled_from(["a", "b", "c", "d"]), children, min_size=1, max_size=3
        ),
    ),
    max_leaves=8,
)

_objects = st.lists(
    st.dictionaries(st.sampled_from(["k", "x", "y", "z"]), _values, min_size=1, max_size=4),
    min_size=1,
    max_size=5,
)


def _unwrap_union(b):
    """If b is a tagged-union struct {tag, v_*}, return its single live
    variant value (generator keys never collide with tag/v_*)."""
    if isinstance(b, dict) and "tag" in b and any(k.startswith("v_") for k in b):
        live = [v for k, v in b.items() if k.startswith("v_") and v is not None]
        if len(live) == 1:
            return live[0]
    return b


def canon(v) -> str:
    """Canonical string of a value tree: unions unwrapped, numerics
    normalized to 12 significant digits, None-valued / empty-record
    entries pruned (mirroring JSON inference's dropping of all-null
    keys and the impossibility of empty structs)."""
    v = _unwrap_union(v)
    if isinstance(v, dict):
        parts = []
        for k in sorted(v):
            c = canon(v[k])
            if c != "∅":
                parts.append(f"{k}:{c}")
        return "{" + ",".join(parts) + "}" if parts else "∅"
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b{int(v)}"
    if isinstance(v, (int, float)):
        return f"n{float(v):.12g}"
    return "s" + str(v)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(objs=_objects)
def test_fromdata_roundtrip_property(spark, objs):
    """Any random nested object forest must survive fromdata →
    to_objects with structure and values intact, modulo the documented
    inference semantics (numeric widening, tagged-union encoding of
    conflicting positions, all-null key dropping)."""
    df = fill.fromdata(spark, objs)
    back = fill.to_objects(df)
    assert len(back) == len(objs)
    assert sorted(canon(o) for o in objs) == sorted(canon(o) for o in back)
