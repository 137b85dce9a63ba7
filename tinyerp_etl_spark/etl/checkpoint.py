"""Page-level checkpoint / resume — the reference's progress table.

Mirrors ``script_progresso_paginas`` (ref tiny_api_v2_cliente.py:91)
and its three operations:

- ``start``  ≡ inicializar_progresso (ref :183-223): resume at
  ``saved_page + 1`` when a previous run for the same filter is
  ``EM_ANDAMENTO``/``ERRO``; restart at 1 when the filter changed or
  the previous run is ``CONCLUIDO``.
- ``advance`` ≡ atualizar_progresso_pagina (ref :205-215): per-page
  upsert of (page, total, running record count, ts).
- ``finish`` ≡ finalizar_progresso (ref :198): terminal status.

In the Structured Streaming mirror this is exactly the checkpoint
offset log; in batch mode it is a tiny driver-side parquet table —
control state, not data, so single-row writes are correct here.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from tinyerp_etl_spark.functions.localdf import local_df

STATUS_PENDING = "PENDENTE"
STATUS_RUNNING = "EM_ANDAMENTO"
STATUS_ERROR = "ERRO"
STATUS_DONE = "CONCLUIDO"

_SCHEMA = T.StructType(
    [
        T.StructField("processo", T.StringType(), False),
        T.StructField("data_filtro_api", T.StringType()),
        T.StructField("pagina_atual", T.IntegerType()),
        T.StructField("total_paginas", T.IntegerType()),
        T.StructField("registros_processados", T.LongType()),
        T.StructField("timestamp_inicio", T.TimestampType()),
        T.StructField("timestamp_ultima_pagina", T.TimestampType()),
        T.StructField("status_execucao", T.StringType()),
    ]
)


@dataclass
class Progress:
    processo: str
    data_filtro_api: str | None
    pagina_atual: int
    total_paginas: int
    registros_processados: int
    status_execucao: str


class PageCheckpoint:
    """Parquet-backed page progress store (one row per process)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- storage ------------------------------------------------------

    def _read_all(self):
        if not os.path.exists(self.path):
            return []
        return self.spark.read.schema(_SCHEMA).parquet(self.path).collect()

    def _get_row(self, process: str):
        for r in self._read_all():
            if r["processo"] == process:
                return r
        return None

    def _upsert(self, process: str, **fields) -> None:
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        rows = {r["processo"]: r.asDict() for r in self._read_all()}
        cur = rows.get(
            process,
            {
                "processo": process,
                "data_filtro_api": None,
                "pagina_atual": 0,
                "total_paginas": 0,
                "registros_processados": 0,
                "timestamp_inicio": now,
                "timestamp_ultima_pagina": now,
                "status_execucao": STATUS_PENDING,
            },
        )
        cur.update(fields)
        cur["timestamp_ultima_pagina"] = now
        rows[process] = cur
        df = local_df(
            self.spark,
            [tuple(r[f.name] for f in _SCHEMA.fields) for r in rows.values()],
            _SCHEMA,
        )
        df.coalesce(1).write.mode("overwrite").parquet(self.path)

    # -- reference-contract operations --------------------------------

    def start(self, process: str, filter_date: str) -> int:
        """Resolve the starting page for a run (ref :183-223).

        Returns the page to start from: ``saved + 1`` when resuming an
        interrupted run with the same filter date, else 1.
        """
        prev = self._get_row(process)
        if (
            prev is not None
            and prev["data_filtro_api"] == filter_date
            and prev["status_execucao"] in (STATUS_RUNNING, STATUS_ERROR)
        ):
            start_page = int(prev["pagina_atual"]) + 1
            self._upsert(process, status_execucao=STATUS_RUNNING)
            return start_page
        self._upsert(
            process,
            data_filtro_api=filter_date,
            pagina_atual=0,
            total_paginas=0,
            registros_processados=0,
            timestamp_inicio=datetime.now(timezone.utc).replace(tzinfo=None),
            status_execucao=STATUS_RUNNING,
        )
        return 1

    def advance(self, process: str, page: int, total_pages: int, n_records: int) -> None:
        """Commit one page (ref :205-215): running-counter accumulation."""
        prev = self._get_row(process)
        done = (prev["registros_processados"] if prev else 0) + n_records
        self._upsert(
            process,
            pagina_atual=page,
            total_paginas=total_pages,
            registros_processados=done,
            status_execucao=STATUS_RUNNING,
        )

    def finish(self, process: str, status: str) -> None:
        """Terminal status: CONCLUIDO / ERRO / EM_ANDAMENTO (page cap)."""
        self._upsert(process, status_execucao=status)

    def progress(self, process: str) -> Progress | None:
        r = self._get_row(process)
        if r is None:
            return None
        return Progress(
            processo=r["processo"],
            data_filtro_api=r["data_filtro_api"],
            pagina_atual=r["pagina_atual"],
            total_paginas=r["total_paginas"],
            registros_processados=r["registros_processados"],
            status_execucao=r["status_execucao"],
        )

    def percent_complete(self, process: str) -> float | None:
        """round(page/total*100, 1) — ref :211."""
        p = self.progress(process)
        if p is None or not p.total_paginas:
            return None
        return round(p.pagina_atual / p.total_paginas * 100, 1)
