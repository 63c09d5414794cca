"""Layer-A models registered directly over the driver's real parquet
tables (read-only): the 'model any record or aggregate query' goal
(reference README.md:8) against data the model layer did not write."""

from __future__ import annotations

import pytest

from hive_2_spark.model import IntegerField, Model, ModelMeta, StringField
from hive_2_spark.model.fields import FloatField
from hive_2_spark.model.meta import clear_registry, register_model
from tests.conftest import SF_DIR


@pytest.fixture()
def customer_model(spark):
    clear_registry()
    register_model(
        "customer",
        ModelMeta(
            table="customer",
            db=f"{SF_DIR}/customer.parquet",
            fields={
                "c_custkey": IntegerField(primary=True),
                "c_name": StringField(),
                "c_nationkey": IntegerField(),
                "c_acctbal": FloatField(),
                "c_mktsegment": StringField(),
            },
            sorting={"c_custkey": "asc"},
        ),
    )


def test_lazy_read_by_primary_key(spark, customer_model):
    m = Model("customer", spark, {"c_custkey": 7})
    assert not m.loaded()
    name = m.c_name  # triggers the read
    assert m.loaded() and name and name.startswith("Customer")


def test_total_and_select_list_on_real_table(spark, customer_model):
    m = Model("customer", spark)
    assert m.total() == 150
    m2 = Model("customer", spark, {"c_mktsegment": "BUILDING"})
    assert 0 < m2.total() < 150
    sl = Model("customer", spark).select_list("c_custkey", "c_name")
    assert len(sl) == 150 and sl[7].startswith("Customer")


def test_iterate_models_sorted(spark, customer_model):
    it = Model("customer", spark).read(limit=5)
    keys = [m.c_custkey for m in it]
    assert keys == sorted(keys) and len(keys) == 5
