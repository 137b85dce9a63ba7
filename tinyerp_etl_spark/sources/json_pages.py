"""Paginated-envelope JSON source — the reference's REST source, Spark-first.

The reference pulls pages of ``{"retorno": {...}}`` envelopes from the
Tiny ERP v2 API (ref tiny_api_v2_cliente.py:225-302: token auth,
``formato=json``, envelope unwrap at :249-250, status protocol at
:259-285). In the Spark engine, fetched pages land as JSON files (one
file per page — the natural spool format for a REST crawler feeding a
cluster) and this module turns a directory of pages into a flat
DataFrame of records:

- explicit envelope schema (no inference on prod paths),
- status-protocol handling: ``status != 'OK'`` is an error, except
  "Nenhum registro encontrado" which is success-with-empty (ref
  :281-282); processing status 3/10 OK, 2 failure (ref :275-284),
- record arrays are exploded and the per-record wrapper struct
  (``{"produto": {...}}``) unwrapped.

At scale this reads thousands of page files in one distributed scan —
the protocol checks are column predicates, not driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: statuses that mean "the page is good" (ref :275-284)
OK_PROCESSING_STATUSES = ("3", "10")
#: error text that actually means empty-success (ref :281-282)
NO_RECORDS_ERROR = "Nenhum registro encontrado"


class ApiProtocolError(RuntimeError):
    """A page violated the API status protocol (ref :259-273)."""


def envelope_schema(record_field: str, wrapper: str, record_schema: T.StructType) -> T.StructType:
    """Schema of one page file: {"retorno": {..., records: [{wrapper: {...}}]}}."""
    return T.StructType(
        [
            T.StructField(
                "retorno",
                T.StructType(
                    [
                        T.StructField("status", T.StringType()),
                        T.StructField("status_processamento", T.StringType()),
                        T.StructField("codigo_erro", T.StringType()),
                        T.StructField(
                            "erros",
                            T.ArrayType(
                                T.StructType([T.StructField("erro", T.StringType())])
                            ),
                        ),
                        T.StructField("pagina", T.IntegerType()),
                        T.StructField("numero_paginas", T.IntegerType()),
                        T.StructField(
                            record_field,
                            T.ArrayType(
                                T.StructType(
                                    [T.StructField(wrapper, record_schema)]
                                )
                            ),
                        ),
                    ]
                ),
            )
        ]
    )


def read_envelope_pages(
    spark: SparkSession,
    path: str,
    record_field: str,
    wrapper: str,
    record_schema: T.StructType,
    strict: bool = True,
) -> DataFrame:
    """Directory of page files → flat DataFrame of records.

    ``strict=True`` raises ApiProtocolError if any page has a bad
    status (the reference aborts the step on protocol errors,
    ref :352-353); empty-success pages contribute zero rows either way.
    """
    schema = envelope_schema(record_field, wrapper, record_schema)
    raw = spark.read.schema(schema).json(path)

    ret = F.col("retorno")
    first_error = F.element_at(ret["erros"], 1)["erro"]
    is_empty_success = (ret["status"] != "OK") & (
        F.coalesce(first_error, F.lit("")).contains(NO_RECORDS_ERROR)
    )
    is_ok = (ret["status"] == "OK") & (
        ret["status_processamento"].isNull()
        | ret["status_processamento"].isin(*OK_PROCESSING_STATUSES)
    )

    if strict:
        bad = raw.filter(~is_ok & ~is_empty_success).select(
            ret["status"].alias("status"),
            ret["codigo_erro"].alias("codigo_erro"),
            first_error.alias("erro"),
        )
        bad_rows = bad.limit(1).collect()
        if bad_rows:
            r = bad_rows[0]
            raise ApiProtocolError(
                f"page with status={r['status']} codigo_erro={r['codigo_erro']} "
                f"erro={r['erro']!r}"
            )

    return (
        raw.filter(is_ok)
        .select(F.explode(ret[record_field]).alias("__rec"))
        .select(F.col(f"__rec.{wrapper}.*"))
    )


def flatten_order_items(
    orders_df: DataFrame,
    order_key: str,
    items_col: str,
    item_wrapper: str,
) -> DataFrame:
    """Header/detail flatten: order rows with nested item arrays →
    one row per item carrying the order key.

    The contract of the elided ``search_pedidos_v2`` loader: order
    headers from /pedidos.pesquisa.php, items from /pedido.obter.php
    into ``pedido_itens`` (ref :37-38, DDL :89, README.md:11).
    """
    return orders_df.select(
        F.col(order_key),
        F.explode(F.col(items_col)).alias("__item"),
    ).select(F.col(order_key), F.col(f"__item.{item_wrapper}.*"))
