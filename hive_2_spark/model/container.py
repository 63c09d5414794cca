"""Container: ordered keyed collection of child models with removal
tracking (SURVEY.md §2A op 30).

Reference parity (citations into /root/reference/classes/hive/container.php):
- keyed, ordered collection of models from a to-many relation (:11, :54)
- unsetting an element records it in ``__removed`` (:150-158)
- change detection across the collection (:115-129)

The removal set drives the delete path (§2A op 18): ``flush_removals``
compiles removed keys into ONE anti-join delete against the store —
set-at-a-time, not per-row round trips.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import functions as F

from hive_2_spark.model.model import Model
from hive_2_spark.model.store import ParquetStore


class Container:
    def __init__(self, key_field: str) -> None:
        self.key_field = key_field
        self._items: dict[Any, Model] = {}
        self._removed: dict[Any, Model] = {}

    @classmethod
    def from_models(cls, key_field: str, models: Iterator[Model]) -> "Container":
        c = cls(key_field)
        for m in models:
            c._items[getattr(m, key_field)] = m
        return c

    # ---------------------------------------------------- dict protocol
    def __getitem__(self, key: Any) -> Model:
        return self._items[key]

    def __contains__(self, key: Any) -> bool:
        return key in self._items

    def __len__(self) -> int:
        return len(self._items)

    def __iter__(self) -> Iterator[Model]:
        return iter(self._items.values())

    def keys(self):
        return self._items.keys()

    def __delitem__(self, key: Any) -> None:
        """Removal is RECORDED, not executed (container.php:150-158)."""
        self._removed[key] = self._items.pop(key)

    # -------------------------------------------------------- state view
    def removed_keys(self) -> list[Any]:
        return list(self._removed.keys())

    def changed(self) -> dict[Any, dict[str, Any]]:
        """Keys of members with dirty fields (container.php:115-129)."""
        return {
            k: m.changed() for k, m in self._items.items() if m.changed()
        }

    # ------------------------------------------------------------- flush
    def flush_removals(self, store: ParquetStore) -> int:
        """Compile the removal set into one anti-join delete (op 18)."""
        if not self._removed:
            return 0
        keys = list(self._removed.keys())
        n = store.delete(F.col(self.key_field).isin(keys))
        self._removed.clear()
        return n

    def flush_changes(self) -> int:
        """Persist every dirty member (dirty-only updates, op 17)."""
        n = 0
        for m in self._items.values():
            if m.loaded() and m.changed():
                m.update()
                n += 1
        return n
