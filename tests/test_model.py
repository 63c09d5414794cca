"""Layer-A typed model semantics — pins the reference's edge behaviors
(SURVEY.md §5): falsy->NULL-vs-default, set-back-to-original clears dirty,
clean update no-op, unknown key skipped by values(), unknown field access
raises, auto-now stamping, lazy load, CRUD walkthrough.
"""

from __future__ import annotations

import datetime as dt

import pytest

from hive_2_spark.model import (
    AutoField,
    BooleanField,
    EmailField,
    FloatField,
    IntegerField,
    Model,
    ModelMeta,
    StringField,
    TimestampField,
    register_model,
)
from hive_2_spark.model.meta import clear_registry
from hive_2_spark.model.store import ParquetStore


@pytest.fixture()
def user_meta(tmp_path):
    clear_registry()
    m = ModelMeta(
        table="users",
        db=str(tmp_path / "users.parquet"),
        fields={
            "id": AutoField(),
            "email": EmailField(unique=True),
            "password": StringField(),
            "created": TimestampField(auto_now_create=True),
            "updated": TimestampField(auto_now_update=True),
            "last_login": TimestampField(null=True),
        },
        sorting={"id": "asc"},
        aliases={
            "domain": lambda m: (m.email or "").split("@")[-1],
        },
    )
    register_model("user", m)
    return m


@pytest.fixture()
def store(spark, user_meta):
    s = ParquetStore(spark, user_meta, user_meta.db)
    s.init_table()
    return s


# ---------------------------------------------------------- field coercion
def test_falsy_to_default_when_not_null():
    f = StringField()  # default ''
    assert f.value("") == ""
    assert f.value(0) == ""
    assert f.value("0") == ""
    assert f.value("x") == "x"


def test_falsy_to_null_when_nullable():
    f = StringField(null=True)
    assert f.value("") is None
    assert f.value(0) is None
    f2 = IntegerField(null=True)
    assert f2.value("") is None
    assert f2.value("7") == 7


def test_integer_default():
    f = IntegerField()
    assert f.value(None) == 0
    assert f.value("41") == 41


def test_boolean_casts_straight():
    f = BooleanField()
    assert f.value("") is False
    assert f.value("yes") is True
    assert f.verbose(True) == "Yes"
    assert f.verbose(False) == "No"


def test_enum_field_membership():
    from hive_2_spark.model import EnumField

    f = EnumField(choices=("draft", "live"), default="draft")
    assert f.value("live") == "live"
    assert f.value("") == "draft"  # falsy -> default
    with pytest.raises(ValueError):
        f.value("bogus")


def test_float_verbose_decimals():
    f = FloatField(decimals=2)
    assert f.verbose(1234.5) == "1,234.50"


def test_timestamp_parse_epoch_and_string():
    f = TimestampField()
    assert f.value(0) is None  # falsy epoch -> NULL (nullable by default)
    assert f.value(86400) == dt.datetime(1970, 1, 2)
    assert f.value("2020-05-01") == dt.datetime(2020, 5, 1)
    assert f.value("2020-05-01 10:30:00") == dt.datetime(2020, 5, 1, 10, 30)
    with pytest.raises(ValueError):
        f.value("not a date")


# ------------------------------------------------------- model state rules
def test_values_skips_unknown_keys(spark, user_meta):
    m = Model("user", spark, {"email": "a@b.com", "nope": 1})
    assert m.email == "a@b.com"
    assert m.changed() == {"email": "a@b.com"}


def test_unknown_field_access_raises(spark, user_meta):
    m = Model("user", spark)
    with pytest.raises(AttributeError):
        _ = m.bogus
    with pytest.raises(AttributeError):
        m.bogus = 1


def test_set_back_to_original_clears_dirty(spark, user_meta, store):
    store.insert([{"email": "a@b.com", "password": "secret"}])
    m = Model("user", spark, {"email": "a@b.com"})
    m.read()
    assert m.loaded()
    assert m.changed() == {}
    m.password = "changed"
    assert m.changed("password") == "changed"
    m.password = "secret"  # back to original
    assert m.changed() == {}


def test_setting_unique_field_prepares(spark, user_meta):
    m = Model("user", spark)
    assert not m.prepared()
    m.email = "x@y.z"
    assert m.prepared()


def test_alias_computed(spark, user_meta):
    m = Model("user", spark, {"email": "who@example.org"})
    assert m.domain == "example.org"


# ----------------------------------------------------------- CRUD lifecycle
def test_create_assigns_id_and_stamps(spark, user_meta, store):
    m = Model("user", spark, {"email": "new@x.io", "password": "pw12345"})
    m.create()
    assert m.loaded()
    assert m.id == 1
    assert isinstance(m.created, dt.datetime)
    # persisted
    rows = store.df().collect()
    assert len(rows) == 1 and rows[0]["email"] == "new@x.io"


def test_lazy_load_on_field_access(spark, user_meta, store):
    store.insert([{"email": "lazy@x.io", "password": "pw"}])
    m = Model("user", spark, {"email": "lazy@x.io"})
    assert not m.loaded()
    assert m.password == "pw"  # triggers read()
    assert m.loaded()


def test_update_dirty_only_and_clean_noop(spark, user_meta, store):
    store.insert([{"email": "u@x.io", "password": "old"}])
    m = Model("user", spark, {"email": "u@x.io"})
    m.read()
    m.update()  # clean -> no-op, no error
    m.password = "newpw"
    m.update()
    assert m.changed() == {}
    again = Model("user", spark, {"email": "u@x.io"}).read()
    assert again.password == "newpw"
    assert isinstance(again.updated, dt.datetime)


def test_save_branches(spark, user_meta, store):
    m = Model("user", spark, {"email": "s@x.io", "password": "pw"})
    m.save()  # create branch
    assert m.loaded() and m.id == 1
    m.password = "pw2"
    m.save()  # update branch
    assert Model("user", spark, {"email": "s@x.io"}).read().password == "pw2"


def test_delete_keeps_data_accessible(spark, user_meta, store):
    store.insert([{"email": "d@x.io", "password": "pw"}])
    m = Model("user", spark, {"email": "d@x.io"})
    m.read()
    m.delete()
    assert m.deleted()
    assert m.email == "d@x.io"  # still readable (model.php:831-853)
    assert store.df().count() == 0


def test_total_and_select_list(spark, user_meta, store):
    store.insert(
        [
            {"email": "a@x.io", "password": "p1"},
            {"email": "b@x.io", "password": "p2"},
            {"email": "c@y.io", "password": "p3"},
        ]
    )
    m = Model("user", spark)
    assert m.total() == 3
    sl = m.select_list("id", "email")
    assert sl == {1: "a@x.io", 2: "b@x.io", 3: "c@y.io"}


def test_unset_restores_default(spark, user_meta):
    m = Model("user", spark, {"password": "zzz"})
    del m.password
    assert m.password == ""  # StringField default
    assert m.changed() == {}


def test_as_json_roundtrip(spark, user_meta):
    import json

    m = Model("user", spark, {"email": "j@x.io"})
    d = json.loads(str(m))
    assert d["email"] == "j@x.io"
