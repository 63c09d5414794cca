"""Engine facade: the one-object surface a reference user adopts."""

from __future__ import annotations

from hive_2_spark.engine import Engine
from tests.conftest import SF_DIR


def test_engine_table_and_sql(spark):
    eng = Engine(spark, SF_DIR)
    assert eng.table("nation").count() == 25
    got = eng.sql("SELECT COUNT(*) AS n FROM region").collect()[0]["n"]
    assert got == 5


def test_engine_query_registry(spark):
    eng = Engine(spark, SF_DIR)
    assert "pricing_summary" in eng.query_keys()
    assert eng.query("pricing_summary").count() > 0


def test_engine_explain(spark):
    eng = Engine(spark, SF_DIR)
    plan = eng.explain("pricing_summary")
    assert "HashAggregate" in plan and "PushedFilters" in plan


def test_engine_unknown_key_raises(spark):
    eng = Engine(spark, SF_DIR)
    import pytest

    with pytest.raises(KeyError):
        eng.query("no_such_operator")
    with pytest.raises(KeyError):
        eng.table("no_such_table")


def test_engine_model_roundtrip(spark, tmp_path):
    from hive_2_spark.model import AutoField, ModelMeta, StringField
    from hive_2_spark.model.meta import clear_registry

    clear_registry()
    eng = Engine(spark, SF_DIR)
    eng.register(
        "note",
        ModelMeta(
            table="note",
            db=str(tmp_path / "note.parquet"),
            fields={"id": AutoField(), "body": StringField()},
        ),
    )
    eng.store("note").init_table()
    m = eng.model("note", {"body": "hello"})
    m.save()
    assert m.id == 1
    assert eng.store("note").df().count() == 1
