"""Layer A: typed model/dataset layer faithful to the reference semantics.

The reference (strategist922/hive-2) is an Active-Record layer: declared
per-table schemas with typed fields, change tracking, lazy loading,
relations, validation, and CRUD, all compiled to SQL for an external
engine (classes/hive/model.php). Here the "external engine" is Spark:
models compile to DataFrame plans; writes compile to join-based parquet
merge-rewrites.
"""

from hive_2_spark.model.fields import (
    AutoField,
    BooleanField,
    EmailField,
    EnumField,
    Field,
    FloatField,
    IntegerField,
    PasswordField,
    StringField,
    TextField,
    TimestampField,
)
from hive_2_spark.model.meta import ModelMeta, meta, register_model
from hive_2_spark.model.model import Model

__all__ = [
    "AutoField",
    "BooleanField",
    "EmailField",
    "EnumField",
    "Field",
    "FloatField",
    "IntegerField",
    "Model",
    "ModelMeta",
    "PasswordField",
    "StringField",
    "TextField",
    "TimestampField",
    "meta",
    "register_model",
]
