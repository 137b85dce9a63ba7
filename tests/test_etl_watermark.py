"""Watermark resolution chain (ref :160-181) + store round-trip."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from tinyerp_etl_spark.etl.watermark import (
    WatermarkStore,
    max_business_timestamp,
    resolve_filter_timestamp,
)

NOW = datetime(2026, 8, 13, 8, 0, 0, tzinfo=timezone.utc)


def test_stored_watermark_plus_one_second():
    wm = NOW - timedelta(days=3)
    got = resolve_filter_timestamp(stored=wm, max_business_ts=None, now=NOW)
    assert got == wm + timedelta(seconds=1)


def test_sixty_day_clamp():
    wm = NOW - timedelta(days=200)
    got = resolve_filter_timestamp(stored=wm, max_business_ts=None, now=NOW)
    assert got == NOW - timedelta(days=60)


def test_synthetic_bootstrap_from_max_date():
    mx = datetime(2026, 8, 1, 15, 30, 45, tzinfo=timezone.utc)
    got = resolve_filter_timestamp(stored=None, max_business_ts=mx, now=NOW)
    # day after max, at midnight UTC (ref :146-158, :172-177)
    assert got == datetime(2026, 8, 2, 0, 0, 0, tzinfo=timezone.utc)


def test_synthetic_bootstrap_clamped():
    mx = NOW - timedelta(days=300)
    got = resolve_filter_timestamp(stored=None, max_business_ts=mx, now=NOW)
    assert got == NOW - timedelta(days=60)


def test_cold_start_default_and_override():
    assert resolve_filter_timestamp(None, None, NOW) == NOW - timedelta(days=60)
    # stock-process fixed 29-day lookback (ref :330-331)
    assert resolve_filter_timestamp(
        None, None, NOW, cold_start_days=29
    ) == NOW - timedelta(days=29)


def test_store_roundtrip_and_upsert(spark, tmp_path):
    store = WatermarkStore(spark, str(tmp_path / "wm"))
    assert store.get("produtos") is None
    t1 = datetime(2026, 8, 10, 8, 0, 0, tzinfo=timezone.utc)
    t2 = datetime(2026, 8, 12, 8, 0, 0, tzinfo=timezone.utc)
    store.commit("produtos", t1)
    store.commit("pedidos", t1)
    store.commit("produtos", t2)  # upsert overwrites
    assert store.get("produtos") == t2
    assert store.get("pedidos") == t1


def test_max_business_timestamp_chronological_not_lexicographic(spark):
    # lexicographic MAX of dd/mm/yyyy text would pick 31/01/2024; the
    # chronological max is 01/12/2025 (the reference's latent bug,
    # deliberately fixed here — SURVEY.md §2 op 17)
    df = spark.createDataFrame(
        [("31/01/2024",), ("01/12/2025",), ("",), ("garbage",), (None,)],
        "d string",
    )
    got = max_business_timestamp(df, "d")
    assert got == datetime(2025, 12, 1, tzinfo=timezone.utc)
