"""Declarative relations = join specs (SURVEY.md §2A ops 12-15).

Reference parity (citations into /root/reference/classes/hive/):
- base spec (model/using/conditions/parent): relation.php:16-36.
- BelongsTo / HasOne: key-equality lookup join, lazy single row
  (relation/belongsto.php:13-36, relation/hasone.php:13-36).
- HasMany: child SELECT + JOIN parent + parent's WHERE, keyed result
  (relation/hasmany.php:15-57).
- ManyToMany: two-hop join through a pivot (relation/manytomany.php:56-96);
  pivot-side key fetch (:20-54).

Each ``read`` returns a lazy DataFrame; the reference's keyed-collation
(`as_array($key)`) maps to the caller collecting the DataFrame keyed by
the join column.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from hive_2_spark.model.model import Model


class Relation:
    def __init__(
        self,
        model: str,
        using: dict[str, str],
        conditions: dict[str, object] | None = None,
    ) -> None:
        self.model = model  # remote model name
        self.using = using  # local field -> remote field
        self.conditions = conditions or {}

    def _remote_df(self, parent: "Model") -> DataFrame:
        from hive_2_spark.model.meta import meta as get_meta
        from hive_2_spark.model.store import ParquetStore

        remote_meta = get_meta(self.model)
        store = ParquetStore(parent._spark, remote_meta, remote_meta.db)
        df = store.df()
        for col, value in self.conditions.items():
            df = df.filter(F.col(col) == F.lit(value))
        return df

    def _key_cond(self, parent: "Model", df: DataFrame) -> Column:
        conds = [
            F.col(remote) == F.lit(getattr(parent, local))
            for local, remote in self.using.items()
        ]
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out


class BelongsTo(Relation):
    """child.remote = parent.local, single row (belongsto.php:21-24)."""

    def read(self, parent: "Model") -> "Model":
        from hive_2_spark.model.model import Model

        df = self._remote_df(parent)
        rows = df.filter(self._key_cond(parent, df)).limit(1).collect()
        m = Model(self.model, parent._spark)
        if rows:
            m._hydrate(rows[0].asDict())
        return m


class HasOne(BelongsTo):
    """Same join shape, ownership reversed (hasone.php:13-36)."""


class HasMany(Relation):
    """All children matching the parent key (+ fixed conditions)."""

    def read(self, parent: "Model") -> DataFrame:
        df = self._remote_df(parent)
        return df.filter(self._key_cond(parent, df))


class ManyToMany(Relation):
    """Two-hop: pivot filtered on the parent key, joined to the remote.

    ``pivot`` is (table-model name, parent-side fk, remote-side fk).
    """

    def __init__(
        self,
        model: str,
        pivot_model: str,
        parent_key: str,
        pivot_parent_fk: str,
        pivot_remote_fk: str,
        remote_key: str,
        conditions: dict[str, object] | None = None,
    ) -> None:
        super().__init__(model, {}, conditions)
        self.pivot_model = pivot_model
        self.parent_key = parent_key
        self.pivot_parent_fk = pivot_parent_fk
        self.pivot_remote_fk = pivot_remote_fk
        self.remote_key = remote_key

    def pivot_keys(self, parent: "Model") -> DataFrame:
        """SELECT fk AS id FROM pivot WHERE pk = ? (manytomany.php:20-54)."""
        from hive_2_spark.model.meta import meta as get_meta
        from hive_2_spark.model.store import ParquetStore

        pivot_meta = get_meta(self.pivot_model)
        pivot = ParquetStore(parent._spark, pivot_meta, pivot_meta.db).df()
        return (
            pivot.filter(
                F.col(self.pivot_parent_fk) == F.lit(getattr(parent, self.parent_key))
            )
            .select(F.col(self.pivot_remote_fk).alias("id"))
            .distinct()
        )

    def read(self, parent: "Model") -> DataFrame:
        """child JOIN pivot ON child.k = pivot.ck WHERE pivot.pk = parent
        (manytomany.php:73-83)."""
        remote = self._remote_df(parent)
        keys = self.pivot_keys(parent)
        return remote.join(
            F.broadcast(keys), remote[self.remote_key] == keys["id"], "inner"
        ).drop("id")
