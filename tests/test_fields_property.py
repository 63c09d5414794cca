"""Property-based tests (hypothesis) for the field coercion layer — the
PHP-faithful falsy/default/NULL semantics hold for ALL inputs, not just
the examples (SURVEY.md §1.2)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, strategies as st

from hive_2_spark.model.fields import (
    BooleanField,
    FloatField,
    IntegerField,
    StringField,
    TimestampField,
    _php_falsy,
)

_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=20),
)


@given(_scalars)
def test_string_field_total(v):
    """Coercion never raises and lands in {None} | str."""
    out = StringField().value(v)
    assert out is None or isinstance(out, str)
    # non-nullable: falsy inputs land on the default
    if _php_falsy(v):
        assert out == ""


@given(_scalars)
def test_nullable_string_falsy_is_null(v):
    out = StringField(null=True).value(v)
    if _php_falsy(v):
        assert out is None
    else:
        assert isinstance(out, str)


@given(st.one_of(st.none(), st.integers(-(2**40), 2**40), st.text("0123456789", max_size=8)))
def test_integer_field_total(v):
    out = IntegerField().value(v)
    assert out is None or isinstance(out, int)
    if _php_falsy(v):
        assert out == 0


@given(_scalars)
def test_boolean_field_always_bool(v):
    assert isinstance(BooleanField().value(v), bool)


@given(st.floats(allow_nan=False, allow_infinity=False))
def test_float_field_roundtrip(v):
    out = FloatField().value(v)
    if _php_falsy(v):
        assert out == 0.0
    else:
        assert out == float(v)


@given(st.integers(min_value=1, max_value=2**31))
def test_timestamp_epoch_roundtrip(epoch):
    out = TimestampField().value(epoch)
    assert isinstance(out, dt.datetime)
    assert out == dt.datetime.fromtimestamp(epoch, tz=dt.timezone.utc).replace(
        tzinfo=None
    )


@given(st.datetimes(min_value=dt.datetime(1970, 1, 2), max_value=dt.datetime(2100, 1, 1)))
def test_timestamp_datetime_identity(d):
    assert TimestampField().value(d) == d
