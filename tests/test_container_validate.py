"""Container removal tracking (op 30) + model-level validation (op 28)
+ on_change hooks (op 29)."""

from __future__ import annotations

import pytest

from hive_2_spark.model import (
    AutoField,
    FloatField,
    IntegerField,
    Model,
    ModelMeta,
    StringField,
    register_model,
)
from hive_2_spark.model.container import Container
from hive_2_spark.model.meta import clear_registry
from hive_2_spark.model.store import ParquetStore


@pytest.fixture()
def post_store(spark, tmp_path):
    clear_registry()
    meta = ModelMeta(
        table="post",
        db=str(tmp_path / "post.parquet"),
        fields={
            "id": AutoField(),
            "author_id": IntegerField(),
            "title": StringField(
                on_change=lambda m, v: v.strip() if isinstance(v, str) else v
            ),
            "score": FloatField(),
        },
        rules={
            "title": [
                (lambda v: v is not None and len(v) > 0, "title:empty"),
                (lambda v: v is None or len(v) <= 10, "title:too_long"),
            ],
            "score": [
                (lambda v: v is None or 0.0 <= v <= 5.0, "score:range"),
                (
                    lambda v: v is not None and v > 0,
                    "score:required_on_publish",
                    ("publish",),
                ),
            ],
        },
    )
    register_model("post", meta)
    st = ParquetStore(spark, meta, meta.db)
    st.init_table()
    st.insert(
        [
            {"author_id": 1, "title": "t1", "score": 1.0},
            {"author_id": 1, "title": "t2", "score": 2.0},
            {"author_id": 2, "title": "t3", "score": 3.0},
        ]
    )
    return st


def test_on_change_hook_fires(spark, post_store):
    m = Model("post", spark, {"title": "  padded  "})
    assert m.title == "padded"  # hook trimmed before storage


def test_validate_default_context(spark, post_store):
    m = Model("post", spark, {"title": "", "score": 9.0})
    errs = m.validate()
    assert errs == {"title": ["title:empty"], "score": ["score:range"]}
    ok = Model("post", spark, {"title": "fine", "score": 4.0})
    assert ok.validate() == {}
    ok.check()  # no raise


def test_validate_named_context(spark, post_store):
    m = Model("post", spark, {"title": "fine", "score": 0.0})
    assert m.validate() == {}  # publish-only rule not in default context
    assert m.validate("publish") == {"score": ["score:required_on_publish"]}
    with pytest.raises(ValueError, match="validation failed"):
        m.check("publish")


def test_container_removal_tracking(spark, post_store):
    models = Model("post", spark).read(limit=False)
    c = Container.from_models("id", models)
    assert len(c) == 3 and 2 in c
    del c[2]
    assert c.removed_keys() == [2]
    assert len(c) == 2
    n = c.flush_removals(post_store)
    assert n == 1
    assert c.removed_keys() == []
    assert post_store.df().count() == 2


def test_container_change_flush(spark, post_store):
    c = Container.from_models("id", Model("post", spark).read(limit=False))
    c[1].score = 4.5
    assert list(c.changed().keys()) == [1]
    assert c.flush_changes() == 1
    fresh = Model("post", spark, {"id": 1}).read()
    assert fresh.score == 4.5
