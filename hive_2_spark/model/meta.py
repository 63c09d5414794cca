"""Model metadata registry (SURVEY.md §1.1, §3.4).

Reference parity (citations into /root/reference/):
- Meta attrs (db/table/fields/aliases/sorting/relations/filters/rules/
  callbacks): classes/hive/meta.php:11-61.
- lazy one-time init + singleton cache: classes/hive/model.php:16, 48-80.
- finish(): back-fill each field's table/column from its logical name:
  classes/hive/meta.php:70-86.
- uniqueness probe helper: classes/hive/meta.php:97-117.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Callable

from pyspark.sql import types as T

from hive_2_spark.model.fields import AutoField, Field

if TYPE_CHECKING:
    from hive_2_spark.model.relation import Relation


class ModelMeta:
    def __init__(
        self,
        *,
        table: str,
        db: str | None = None,
        fields: dict[str, Field] | None = None,
        aliases: dict[str, Callable[..., Any]] | None = None,
        sorting: dict[str, str] | None = None,
        relations: dict[str, "Relation"] | None = None,
        rules: dict[str, list] | None = None,
        filters: dict[str, list[Callable[[Any], Any]]] | None = None,
    ) -> None:
        self.table = table
        self.db = db  # storage location (parquet dir); None = views/catalog
        self.fields: dict[str, Field] = fields or {}
        self.aliases = aliases or {}
        self.sorting = sorting or {}
        self.relations = relations or {}
        self.rules = rules or {}
        self.filters = filters or {}
        self._finished = False

    # -- lifecycle --------------------------------------------------------
    def finish(self) -> "ModelMeta":
        """Back-fill field name/table/column (meta.php:70-86)."""
        if self._finished:
            return self
        for name, f in self.fields.items():
            f.name = name
            f.table = self.table
            if f.column is None:
                f.column = name
        self._finished = True
        return self

    # -- derived ----------------------------------------------------------
    @property
    def primary(self) -> str:
        for name, f in self.fields.items():
            if f.primary:
                return name
        raise LookupError(f"model {self.table} has no primary field")

    @property
    def auto_field(self) -> str | None:
        for name, f in self.fields.items():
            if isinstance(f, AutoField):
                return name
        return None

    def unique_fields(self) -> list[str]:
        return [n for n, f in self.fields.items() if f.unique]

    def struct_type(self) -> T.StructType:
        self.finish()
        return T.StructType([f.struct_field() for f in self.fields.values()])

    def select_columns(self) -> list[tuple[str, str]]:
        """(physical, logical) pairs — the never-* projection
        (model.php:1148-1151, aliasing meta.php:150-177)."""
        self.finish()
        return [(f.column or n, n) for n, f in self.fields.items()]


# ---------------------------------------------------------------- registry
_REGISTRY: dict[str, ModelMeta] = {}


def register_model(name: str, meta_obj: ModelMeta) -> ModelMeta:
    _REGISTRY[name] = meta_obj.finish()
    return meta_obj


def meta(name: str) -> ModelMeta:
    """Singleton lookup (model.php:69-79)."""
    try:
        return _REGISTRY[name]
    except KeyError:
        raise LookupError(f"model {name!r} is not registered") from None


def clear_registry() -> None:
    _REGISTRY.clear()
