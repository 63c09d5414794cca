"""End-to-end reproduction of the reference README's usage walkthrough
(/root/reference/README.md:60-153): the four documented phases —
"Fabricate" (create), "Collate" (read), "Ameliorate" (update),
"Eradicate" (delete) — run against the Spark-backed model layer with the
exact user schema from README.md:17-57 (see FIXTURES.md §B).
"""

from __future__ import annotations

import datetime as dt

import pytest

from hive_2_spark.engine import Engine
from hive_2_spark.model import (
    AutoField,
    EmailField,
    ModelMeta,
    StringField,
    TimestampField,
)
from hive_2_spark.model.meta import clear_registry
from tests.conftest import SF_DIR


@pytest.fixture()
def eng(spark, tmp_path):
    clear_registry()
    e = Engine(spark, SF_DIR)
    e.register(
        "user",
        ModelMeta(
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
        ),
    )
    e.store("user").init_table()
    return e


def test_walkthrough(eng):
    # --- Fabricate (README.md:62-76): create a record ------------------
    user = eng.model("user", {"email": "woody@example.com", "password": "demo!pass"})
    user.create()
    assert user.loaded()
    assert user.id == 1
    assert isinstance(user.created, dt.datetime)  # auto_now_create stamped
    assert user.last_login is None

    # --- Collate (README.md:78-112): read by unique field, lazily -------
    probe = eng.model("user", {"email": "woody@example.com"})
    assert not probe.loaded()
    assert probe.password == "demo!pass"  # first access triggers read()
    assert probe.loaded()

    # reading many: default sorting by id asc (README.md:40)
    eng.model("user", {"email": "second@example.com", "password": "x"}).create()
    ids = [m.id for m in eng.model("user").read(limit=False)]
    assert ids == [1, 2]

    # --- Ameliorate (README.md:114-135): dirty-only update --------------
    probe.password = "better!pass"
    assert probe.changed() == {"password": "better!pass"}
    probe.update()
    assert probe.changed() == {}
    again = eng.model("user", {"email": "woody@example.com"}).read()
    assert again.password == "better!pass"
    assert isinstance(again.updated, dt.datetime)  # auto_now_update stamped

    # --- Eradicate (README.md:137-153): delete, data stays readable -----
    again.delete()
    assert again.deleted()
    assert again.email == "woody@example.com"
    assert eng.model("user").total() == 1  # only the second user remains
