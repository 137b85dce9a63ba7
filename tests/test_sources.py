"""Envelope-JSON page reader + resilient fetcher protocol tests."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tinyerp_etl_spark.sources.fetcher import (
    CriticalTokenError,
    FetchError,
    fetch_page,
    mask_token,
)
from tinyerp_etl_spark.sources.json_pages import (
    ApiProtocolError,
    flatten_order_items,
    read_envelope_pages,
)

PRODUTO_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("nome", T.StringType()),
        T.StructField("preco", T.StringType()),
    ]
)


def _write_page(path, payload):
    path.write_text(json.dumps(payload))


def test_read_envelope_pages_flattens_records(spark, tmp_path):
    d = tmp_path / "pages"
    d.mkdir()
    _write_page(
        d / "p1.json",
        {
            "retorno": {
                "status": "OK",
                "status_processamento": "3",
                "pagina": 1,
                "numero_paginas": 2,
                "produtos": [
                    {"produto": {"id": "1", "nome": "Caneta", "preco": "1,50"}},
                    {"produto": {"id": "2", "nome": "Lapis", "preco": "0,75"}},
                ],
            }
        },
    )
    _write_page(
        d / "p2.json",
        {
            "retorno": {
                "status": "OK",
                "status_processamento": "10",
                "pagina": 2,
                "numero_paginas": 2,
                "produtos": [
                    {"produto": {"id": "3", "nome": "Borracha", "preco": "2,00"}}
                ],
            }
        },
    )
    df = read_envelope_pages(spark, str(d), "produtos", "produto", PRODUTO_SCHEMA)
    rows = sorted((r["id"], r["nome"]) for r in df.collect())
    assert rows == [("1", "Caneta"), ("2", "Lapis"), ("3", "Borracha")]


def test_empty_success_page_contributes_zero_rows(spark, tmp_path):
    d = tmp_path / "pages"
    d.mkdir()
    _write_page(
        d / "empty.json",
        {
            "retorno": {
                "status": "Erro",
                "erros": [{"erro": "Nenhum registro encontrado"}],
            }
        },
    )
    df = read_envelope_pages(spark, str(d), "produtos", "produto", PRODUTO_SCHEMA)
    assert df.count() == 0


def test_protocol_error_raises_in_strict_mode(spark, tmp_path):
    d = tmp_path / "pages"
    d.mkdir()
    _write_page(
        d / "bad.json",
        {
            "retorno": {
                "status": "Erro",
                "codigo_erro": "32",
                "erros": [{"erro": "Parametro invalido"}],
            }
        },
    )
    with pytest.raises(ApiProtocolError, match="codigo_erro=32"):
        read_envelope_pages(spark, str(d), "produtos", "produto", PRODUTO_SCHEMA)


def test_flatten_order_items(spark):
    schema = T.StructType(
        [
            T.StructField("id_pedido", T.IntegerType()),
            T.StructField(
                "itens",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField(
                                "item",
                                T.StructType(
                                    [
                                        T.StructField("codigo", T.StringType()),
                                        T.StructField("quantidade", T.StringType()),
                                    ]
                                ),
                            )
                        ]
                    )
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [
            (1, [{"item": {"codigo": "A", "quantidade": "2"}},
                 {"item": {"codigo": "B", "quantidade": "1"}}]),
            (2, [{"item": {"codigo": "C", "quantidade": "5"}}]),
        ],
        schema,
    )
    out = flatten_order_items(df, "id_pedido", "itens", "item")
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [(1, "A", "2"), (1, "B", "1"), (2, "C", "5")]


# ---------------------------------------------------------------- fetcher


def _transport_seq(responses):
    """Transport yielding canned (status, body) responses in order."""
    it = iter(responses)

    def transport(url, params):
        item = next(it)
        if isinstance(item, Exception):
            raise item
        return item

    return transport


def _no_sleep(_):
    pass


def test_fetch_ok_first_try():
    body = {"retorno": {"status": "OK", "produtos": []}}
    res = fetch_page(_transport_seq([(200, body)]), "u", {}, sleep=_no_sleep)
    assert res.ok and res.retorno["status"] == "OK"


def test_fetch_retries_network_errors_with_backoff():
    body = {"retorno": {"status": "OK"}}
    delays = []
    res = fetch_page(
        _transport_seq([OSError("net"), OSError("net"), (200, body)]),
        "u",
        {},
        sleep=delays.append,
    )
    assert res.ok
    assert delays == [2.0, 4.0]  # exponential ×2 (ref :236)


def test_fetch_429_uses_fixed_delay():
    body = {"retorno": {"status": "OK"}}
    delays = []
    res = fetch_page(
        _transport_seq([(429, {}), (200, body)]), "u", {}, sleep=delays.append
    )
    assert res.ok
    assert delays == [30]  # RETRY_DELAY_429 (ref :48, :290)


def test_fetch_4xx_hard_fails():
    with pytest.raises(FetchError, match="HTTP 404"):
        fetch_page(_transport_seq([(404, {})]), "u", {}, sleep=_no_sleep)


def test_fetch_error_code_35_forces_retry():
    bad = {"retorno": {"status": "Erro", "codigo_erro": "35"}}
    good = {"retorno": {"status": "OK"}}
    res = fetch_page(_transport_seq([(200, bad), (200, good)]), "u", {}, sleep=_no_sleep)
    assert res.ok


def test_fetch_token_error_is_critical():
    bad = {"retorno": {"status": "Erro", "codigo_erro": "2"}}
    with pytest.raises(CriticalTokenError):
        fetch_page(_transport_seq([(200, bad)]), "u", {}, sleep=_no_sleep)


def test_fetch_empty_success():
    body = {
        "retorno": {
            "status": "Erro",
            "erros": [{"erro": "Nenhum registro encontrado"}],
        }
    }
    res = fetch_page(_transport_seq([(200, body)]), "u", {}, sleep=_no_sleep)
    assert res.ok


def test_fetch_retries_exhausted():
    with pytest.raises(FetchError, match="retries exhausted"):
        fetch_page(
            _transport_seq([OSError("x")] * 4), "u", {}, max_retries=3, sleep=_no_sleep
        )


def test_mask_token():
    assert mask_token("secret-token-123") == "secre..."  # ref :230


def test_csv_failfast_on_corrupt_rows(spark, tmp_path):
    """Pinned-schema CSV reads fail loudly on malformed rows instead of
    silently producing NULLs (the opposite default from the reference's
    0.0-coercion, which stays available explicitly via coerce)."""
    import pytest
    from pyspark.sql import types as T

    from tinyerp_etl_spark.sources.files import read_csv

    p = tmp_path / "bad.csv"
    p.write_text("id,price\n1,10.5\n2,not-a-number\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("price", T.DoubleType())]
    )
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_csv(spark, str(p), schema).collect()


def test_jsonl_roundtrip_preserves_timestamps(spark, sf_dir, tmp_path):
    from tinyerp_etl_spark.sources.catalog import TABLES, load_table
    from tinyerp_etl_spark.sources.files import read_jsonl, write_jsonl

    ev = load_table(spark, sf_dir, "events").limit(100)
    write_jsonl(ev, str(tmp_path / "ev"), n_files=1)
    back = read_jsonl(spark, str(tmp_path / "ev"), TABLES["events"])
    assert sorted(r["ts"] for r in back.select("ts").collect()) == sorted(
        r["ts"] for r in ev.select("ts").collect()
    )


# ---------------------------------------------------------------------------
# custom Python DataSource (tiny_pages) — batch + streaming
# ---------------------------------------------------------------------------

def _stage_pages(d, n_pages=2, empty_last=False):
    d.mkdir(parents=True, exist_ok=True)
    for i in range(1, n_pages + 1):
        _write_page(
            d / f"page_{i:04d}.json",
            {
                "retorno": {
                    "status": "OK",
                    "status_processamento": "3",
                    "pagina": i,
                    "numero_paginas": n_pages,
                    "produtos": [
                        {"produto": {"id": str(i * 10 + j), "nome": f"p{i}-{j}", "preco": "1,50"}}
                        for j in range(3)
                    ],
                }
            },
        )
    if empty_last:
        _write_page(
            d / f"page_{n_pages + 1:04d}.json",
            {
                "retorno": {
                    "status": "Erro",
                    "erros": [{"erro": "Nenhum registro encontrado"}],
                }
            },
        )


def _register_tiny_pages(spark):
    from tinyerp_etl_spark.sources.tiny_datasource import TinyPagesDataSource

    spark.dataSource.register(TinyPagesDataSource)


def test_tiny_pages_batch_read(spark, tmp_path):
    d = tmp_path / "pages"
    _stage_pages(d, n_pages=3, empty_last=True)
    _register_tiny_pages(spark)
    df = (
        spark.read.format("tiny_pages")
        .schema("id long, nome string, preco string")
        .option("path", str(d))
        .option("record_field", "produtos")
        .option("wrapper", "produto")
        .load()
    )
    rows = sorted(df.collect(), key=lambda r: r.id)
    assert len(rows) == 9  # 3 pages x 3 records; empty-success page adds 0
    assert rows[0].id == 10 and rows[0].nome == "p1-0" and rows[0].preco == "1,50"
    # partition planning: one partition per page file
    assert df.rdd.getNumPartitions() == 4


def test_tiny_pages_batch_protocol_error(spark, tmp_path):
    d = tmp_path / "pages"
    _stage_pages(d, n_pages=1)
    _write_page(
        d / "page_0002.json",
        {"retorno": {"status": "Erro", "erros": [{"erro": "Token invalido"}]}},
    )
    _register_tiny_pages(spark)
    df = (
        spark.read.format("tiny_pages")
        .schema("id long, nome string, preco string")
        .option("path", str(d))
        .option("record_field", "produtos")
        .option("wrapper", "produto")
        .load()
    )
    with pytest.raises(Exception, match="Token invalido"):
        df.collect()


def test_tiny_pages_stream_resumes_from_offset(spark, tmp_path):
    """Streaming offsets == pages ingested; new pages arrive in the next
    micro-batch and a restart does not re-read committed pages —
    the reference's page-checkpoint contract (ref :183-223)."""
    d = tmp_path / "pages"
    _stage_pages(d, n_pages=2)
    _register_tiny_pages(spark)
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        reader = (
            spark.readStream.format("tiny_pages")
            .schema("id long, nome string, preco string")
            .option("path", str(d))
            .option("record_field", "produtos")
            .option("wrapper", "produto")
            .load()
        )
        q = (
            reader.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    out1 = spark.read.parquet(str(tmp_path / "out"))
    assert out1.count() == 6  # 2 pages x 3 records

    # spooler lands one more page; restart picks up ONLY the new page
    _stage_pages(d, n_pages=3)  # rewrites pages 1-2 identically, adds page 3
    run_once()
    out2 = spark.read.parquet(str(tmp_path / "out"))
    assert out2.count() == 9
    assert out2.filter("id >= 30").count() == 3


def test_events_ts_sanity_bounds(spark, sf_dir):
    """Guard against testdata drift: the catalog's events read must land
    in the generated 2024 date range, not a unit-confused 1970 sliver.

    Round 2 regression: the driver regenerated events.ts as
    TIMESTAMP(MICROS) while the catalog still assumed TIMESTAMP(NANOS),
    compressing a month of events into 43 minutes of January 1970 and
    silently corrupting 12 queries. This pins the bound so the next
    physical-type drift fails loudly in seconds.
    """
    import datetime

    from tinyerp_etl_spark.sources.catalog import load_table

    lo, hi = (
        load_table(spark, sf_dir, "events")
        .agg(F.min("ts"), F.max("ts"))
        .first()
    )
    assert lo >= datetime.datetime(2024, 1, 1), lo
    assert hi < datetime.datetime(2026, 1, 1), hi
    # orders/lineitem date columns share the same generation window
    olo, ohi = (
        load_table(spark, sf_dir, "orders")
        .agg(F.min("o_orderdate"), F.max("o_orderdate"))
        .first()
    )
    assert olo >= datetime.datetime(1992, 1, 1), olo
    assert ohi < datetime.datetime(2026, 1, 1), ohi


def test_ts_unit_sniff_does_not_cache_failures(tmp_path):
    # an empty directory (streaming sink sampled mid-materialization)
    # must fall back to 'us' WITHOUT caching — once real nanos files
    # land at the path, the sniff must see them
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tinyerp_etl_spark.sources.catalog import _TS_UNIT_CACHE, _events_ts_unit

    d = tmp_path / "events.parquet"
    d.mkdir()
    path = str(d)
    assert _events_ts_unit(path) == "us"
    assert path not in _TS_UNIT_CACHE
    tbl = pa.table({"ts": pa.array([1, 2, 3], type=pa.timestamp("ns"))})
    pq.write_table(tbl, d / "part-0.parquet")
    assert _events_ts_unit(path) == "ns"
    assert _TS_UNIT_CACHE[path] == "ns"


def test_xml_roundtrip_exact(spark, sf_dir, tmp_path):
    from tinyerp_etl_spark.sources.catalog import TABLES, load_table
    from tinyerp_etl_spark.sources.files import read_xml, write_xml

    orders = load_table(spark, sf_dir, "orders")
    write_xml(orders, str(tmp_path / "xml"), n_files=2)
    back = read_xml(spark, str(tmp_path / "xml"), TABLES["orders"])
    assert back.schema == orders.schema
    a = sorted(map(tuple, orders.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
