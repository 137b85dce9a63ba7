"""Tree flatten + fixed-point ancestor closure."""

from __future__ import annotations

from tinyerp_etl_spark.operators.hierarchy import ancestor_closure, flatten_tree_payload

TREE = [
    {
        "id": "1",
        "descricao": "Eletronicos",
        "nodes": [
            {"id": "2", "descricao": "Celulares", "nodes": []},
            {
                "id": "3",
                "descricao": "Audio",
                "nodes": [{"id": "4", "descricao": "Fones", "nodes": None}],
            },
        ],
    },
    {"id": "5", "descricao": "Livros"},
]


def test_flatten_tree_payload():
    rows = flatten_tree_payload(TREE)
    assert rows == [
        (1, "Eletronicos", None),
        (2, "Celulares", 1),
        (3, "Audio", 1),
        (4, "Fones", 3),
        (5, "Livros", None),
    ]


def test_ancestor_closure(spark):
    edges = spark.createDataFrame(
        flatten_tree_payload(TREE), "id int, descricao string, parent_id int"
    )
    out = ancestor_closure(edges, "id", "parent_id")
    got = sorted(tuple(r) for r in out.collect())
    assert got == [
        (1, 1, 0),
        (2, 1, 1),
        (3, 1, 1),
        (4, 1, 2),
        (5, 5, 0),
    ]


def test_ancestor_closure_depth_50_chain(spark):
    # a 50-deep chain must complete without a deep-lineage blowup
    # (frontier is localCheckpoint'd every few levels)
    from pyspark.sql import functions as F

    from tinyerp_etl_spark.operators.hierarchy import ancestor_closure

    rows = [(0, None)] + [(i, i - 1) for i in range(1, 51)]
    edges = spark.createDataFrame(rows, "id long, parent_id long")
    got = {
        r["node_id"]: (r["root_id"], r["depth"])
        for r in ancestor_closure(edges, max_iterations=64).collect()
    }
    assert len(got) == 51
    assert all(got[i] == (0, i) for i in range(51))
