"""PageRank semantics pinned on a hand-computable graph (the oracle
proves cross-engine agreement; this proves the math)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hive_2_spark.core.graph import graph_pagerank


@pytest.fixture(scope="module")
def tiny_graph_dir(tmp_path_factory):
    """c1 buys from s10; c2 buys from s10 and s11. The path graph
    c1–s10–c2–s11 is symmetric under reversal: c2<->s10 (degree 2) and
    c1<->s11 (degree 1) must get identical ranks."""
    d = str(tmp_path_factory.mktemp("sf_graph"))
    orders = pa.table(
        {
            "o_orderkey": pa.array([100, 200, 201], pa.int64()),
            "o_custkey": pa.array([1, 2, 2], pa.int64()),
            "o_orderstatus": ["F", "F", "O"],
            "o_totalprice": pa.array([10.0, 20.0, 30.0]),
            "o_orderdate": pa.array([None, None, None], pa.timestamp("us")),
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([100, 200, 201], pa.int64()),
            "l_partkey": pa.array([1, 1, 1], pa.int64()),
            "l_suppkey": pa.array([10, 10, 11], pa.int64()),
            "l_linenumber": pa.array([1, 1, 1], pa.int32()),
            "l_quantity": pa.array([1.0, 1.0, 1.0]),
            "l_extendedprice": pa.array([1.0, 1.0, 1.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0]),
            "l_tax": pa.array([0.0, 0.0, 0.0]),
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": pa.array([None, None, None], pa.timestamp("us")),
        }
    )
    pq.write_table(orders, os.path.join(d, "orders.parquet"))
    pq.write_table(lineitem, os.path.join(d, "lineitem.parquet"))
    return d


def test_pagerank_structure_and_mass(spark, tiny_graph_dir):
    rows = {r["node"]: r["rank"] for r in graph_pagerank(spark, tiny_graph_dir).collect()}
    assert set(rows) == {"c1", "c2", "s10", "s11"}
    # degree-2 nodes (c2, s10) outrank degree-1 nodes (c1, s11); each
    # symmetric pair has identical rank
    assert rows["c2"] == rows["s10"] > rows["c1"] == rows["s11"]
    # undirected degree-normalized PageRank conserves total mass == n
    assert sum(rows.values()) == pytest.approx(4.0, abs=1e-6)
