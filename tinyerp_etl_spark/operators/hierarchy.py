"""Hierarchy operators: recursive-tree flatten + fixed-point closure.

The reference ingests a recursive category tree
(/produtos.categorias.arvore.php, ref tiny_api_v2_cliente.py:33,
"com hierarquia" README.md:7) and stores it as an adjacency list
(``categorias.id_categoria_pai`` self-FK, ref :83). Two operators:

- ``flatten_tree_payload``: nested JSON tree → adjacency rows. Runs
  driver-side on purpose: the tree arrives as one API payload (a dim,
  KBs not TBs) and recursion depth is data-dependent.
- ``ancestor_closure`` / ``resolve_roots``: adjacency list →
  (node, root, depth) by iterative self-joins to a fixed point —
  Spark's answer to a recursive CTE (unsupported ≤3.5). Each
  iteration is a broadcast-able join on a dim-sized table; the loop
  count is the tree depth, not the row count, so it scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tinyerp_etl_spark.functions.materialize import materialize


def flatten_tree_payload(
    nodes: list[dict],
    id_field: str = "id",
    desc_field: str = "descricao",
    children_field: str = "nodes",
    parent_id: int | None = None,
) -> list[tuple]:
    """Nested category tree → [(id, descricao, id_pai), ...].

    Contract of the elided ``get_categorias_v2`` loader (ref call
    :379, list handling :252-254, target DDL :83).
    """
    rows: list[tuple] = []
    for node in nodes or []:
        nid = int(node[id_field])
        rows.append((nid, node.get(desc_field), parent_id))
        rows.extend(
            flatten_tree_payload(
                node.get(children_field) or [],
                id_field,
                desc_field,
                children_field,
                parent_id=nid,
            )
        )
    return rows


def ancestor_closure(
    edges: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    max_iterations: int = 32,
) -> DataFrame:
    """(node, root_id, depth) for every node of an adjacency list.

    Iterative self-join to a fixed point: depth-0 roots are rows with
    NULL parent; each pass links nodes one level deeper. Terminates
    when an iteration adds no rows (or at ``max_iterations`` as a
    cycle guard).
    """
    nodes = edges.select(
        F.col(id_col).alias("node_id"), F.col(parent_col).alias("parent_id")
    )
    frontier = (
        nodes.filter(F.col("parent_id").isNull())
        .select(
            F.col("node_id"),
            F.col("node_id").alias("root_id"),
            F.lit(0).alias("depth"),
        )
    )
    result = frontier
    for i in range(max_iterations):
        nxt = (
            nodes.alias("c")
            .join(frontier.alias("p"), F.col("c.parent_id") == F.col("p.node_id"))
            .select(
                F.col("c.node_id").alias("node_id"),
                F.col("p.root_id").alias("root_id"),
                (F.col("p.depth") + 1).alias("depth"),
            )
        )
        if nxt.isEmpty():
            break
        frontier = nxt
        if (i + 1) % 5 == 0:
            # truncate lineage every few levels: the frontier deepens
            # by one join per level and the per-level isEmpty() walks
            # the whole chain — O(depth²) on deep trees without this
            frontier = materialize(frontier)
        result = result.unionByName(frontier)
    return result
