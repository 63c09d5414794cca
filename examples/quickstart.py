#!/usr/bin/env python
"""Quickstart: the Engine facade end-to-end in one script.

    python examples/quickstart.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hive_2_spark.engine import Engine
from hive_2_spark.model import AutoField, EmailField, ModelMeta, StringField
from hive_2_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark, sf_dir)

    print("== DataFrame API: pricing summary ==")
    eng.query("pricing_summary").show(truncate=False)

    print("== SQL API: top nations by customer count ==")
    eng.sql(
        """
        SELECT n_name, COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_customers DESC, n_name LIMIT 5
        """
    ).show()

    print("== Layer A: Active-Record model over parquet ==")
    import tempfile

    eng.register(
        "user",
        ModelMeta(
            table="users",
            db=tempfile.mkdtemp(prefix="quickstart_users_"),
            fields={
                "id": AutoField(),
                "email": EmailField(unique=True),
                "name": StringField(),
            },
        ),
    )
    eng.store("user").init_table()
    u = eng.model("user", {"email": "ada@example.com", "name": "Ada"})
    u.save()
    print("created user id:", u.id, "->", u.as_json())
    again = eng.model("user", {"email": "ada@example.com"})
    print("lazy-loaded name:", again.name)

    print("== LLM ops: exact dedup survivors ==")
    eng.query("dedup_exact").orderBy("keep_id").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
