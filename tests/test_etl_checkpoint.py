"""Page-checkpoint resume semantics (ref :183-223)."""

from __future__ import annotations

from tinyerp_etl_spark.etl.checkpoint import (
    STATUS_DONE,
    STATUS_ERROR,
    STATUS_RUNNING,
    PageCheckpoint,
)


def test_fresh_start_is_page_one(spark, tmp_path):
    cp = PageCheckpoint(spark, str(tmp_path / "cp"))
    assert cp.start("produtos", "01/08/2026 00:00:00") == 1


def test_resume_after_interrupt_same_filter(spark, tmp_path):
    cp = PageCheckpoint(spark, str(tmp_path / "cp"))
    cp.start("produtos", "01/08/2026 00:00:00")
    cp.advance("produtos", page=3, total_pages=10, n_records=150)
    # crash here: status stays EM_ANDAMENTO → resume at 4
    assert cp.start("produtos", "01/08/2026 00:00:00") == 4


def test_resume_after_error_same_filter(spark, tmp_path):
    cp = PageCheckpoint(spark, str(tmp_path / "cp"))
    cp.start("pedidos", "01/08/2026 00:00:00")
    cp.advance("pedidos", page=7, total_pages=9, n_records=10)
    cp.finish("pedidos", STATUS_ERROR)
    assert cp.start("pedidos", "01/08/2026 00:00:00") == 8


def test_filter_change_restarts(spark, tmp_path):
    cp = PageCheckpoint(spark, str(tmp_path / "cp"))
    cp.start("produtos", "01/08/2026 00:00:00")
    cp.advance("produtos", page=5, total_pages=10, n_records=100)
    assert cp.start("produtos", "02/08/2026 00:00:00") == 1


def test_completed_run_restarts(spark, tmp_path):
    cp = PageCheckpoint(spark, str(tmp_path / "cp"))
    cp.start("produtos", "01/08/2026 00:00:00")
    cp.advance("produtos", page=10, total_pages=10, n_records=100)
    cp.finish("produtos", STATUS_DONE)
    assert cp.start("produtos", "01/08/2026 00:00:00") == 1


def test_running_counter_accumulates(spark, tmp_path):
    cp = PageCheckpoint(spark, str(tmp_path / "cp"))
    cp.start("estoques", "01/08/2026 00:00:00")
    cp.advance("estoques", 1, 4, 100)
    cp.advance("estoques", 2, 4, 50)
    p = cp.progress("estoques")
    assert p.registros_processados == 150  # ref :208
    assert cp.percent_complete("estoques") == 50.0  # ref :211
    assert p.status_execucao == STATUS_RUNNING
