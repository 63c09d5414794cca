"""Partition-scoped merge-rewrite: mutations rewrite ONLY the partitions
containing victims; untouched partitions' files stay physically identical
(path + mtime). The 100 TB mutation behavior, verified at file level."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hive_2_spark.model import AutoField, FloatField, ModelMeta, StringField, register_model
from hive_2_spark.model.meta import clear_registry
from hive_2_spark.model.store import ParquetStore


def _files(root: str, sub: str) -> dict[str, float]:
    d = os.path.join(root, sub)
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }


@pytest.fixture()
def pstore(spark, tmp_path):
    clear_registry()
    meta = ModelMeta(
        table="fact",
        db=str(tmp_path / "fact.parquet"),
        fields={
            "id": AutoField(),
            "status": StringField(),
            "amount": FloatField(),
        },
    )
    register_model("fact", meta)
    st = ParquetStore(spark, meta, meta.db, partition_by="status")
    st.init_table()
    st.insert(
        [
            {"status": "open", "amount": 1.0},
            {"status": "open", "amount": 2.0},
            {"status": "closed", "amount": 3.0},
            {"status": "closed", "amount": 4.0},
        ]
    )
    return st


def test_partitioned_roundtrip(pstore):
    rows = {r["id"]: (r["status"], r["amount"]) for r in pstore.df().collect()}
    assert rows == {
        1: ("open", 1.0),
        2: ("open", 2.0),
        3: ("closed", 3.0),
        4: ("closed", 4.0),
    }


def test_update_touches_only_victim_partition(pstore):
    before = _files(pstore.path, "status=open")
    n = pstore.update(F.col("status") == "closed", {"amount": 99.0})
    assert n == 2
    after = _files(pstore.path, "status=open")
    assert before == after  # open partition physically untouched
    rows = {r["id"]: r["amount"] for r in pstore.df().collect()}
    assert rows == {1: 1.0, 2: 2.0, 3: 99.0, 4: 99.0}


def test_delete_touches_only_victim_partition(pstore):
    before = _files(pstore.path, "status=closed")
    n = pstore.delete((F.col("status") == "open") & (F.col("amount") < 1.5))
    assert n == 1
    assert _files(pstore.path, "status=closed") == before
    assert pstore.df().count() == 3


def test_partition_column_update_falls_back_to_full_rewrite(pstore):
    """Changing the partition key migrates rows between directories —
    handled by the full-rewrite fallback, and the data stays correct."""
    n = pstore.update(F.col("amount") >= 3.0, {"status": "archived"})
    assert n == 2
    rows = {r["id"]: r["status"] for r in pstore.df().collect()}
    assert rows == {1: "open", 2: "open", 3: "archived", 4: "archived"}
    assert os.path.isdir(os.path.join(pstore.path, "status=archived"))
