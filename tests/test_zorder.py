"""Z-order clustering: key correctness + the data-skipping effect.

The point of z-ordering is visible in parquet FOOTERS, not query
results: after clustering on the interleaved key, every file's
min/max range is tight on BOTH dimensions, so a filter on either one
prunes files. The second test asserts exactly that, reading the
footers with pyarrow and comparing against single-column clustering
(tight on the sorted column, full-range on the other).
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tinyerp_etl_spark.functions.zorder import zorder_key


def _interleave_ref(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_reference(spark):
    rows = [(i, (i * 7919) % 65536, (i * 104729) % 65536) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {
        r["id"]: r["z"]
        for r in df.select("id", zorder_key("a", "b").alias("z")).collect()
    }
    for i, a, b in rows:
        assert got[i] == _interleave_ref(a, b), (i, a, b)


def _file_stat_fraction(version_dir: str, column: str) -> float:
    """Mean (per-file max-min) / (global max-min) for a column, from
    parquet footer statistics — the number scan-time pruning sees."""
    spans, gmin, gmax = [], None, None
    for path in glob.glob(f"{version_dir}/*.parquet"):
        md = pq.ParquetFile(path).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    s = col.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        assert fmin is not None, f"no stats for {column} in {path}"
        spans.append((fmin, fmax))
        gmin = fmin if gmin is None else min(gmin, fmin)
        gmax = fmax if gmax is None else max(gmax, fmax)
    width = gmax - gmin
    assert width > 0 and len(spans) >= 4
    return sum((hi - lo) / width for lo, hi in spans) / len(spans)


def test_zorder_clustering_tightens_both_dims(spark, sf_dir, tmp_path):
    from pyspark.sql.types import StructType

    from tinyerp_etl_spark.etl.table_store import TableStore
    from tinyerp_etl_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").cast("long").alias("cust"),
        (F.unix_timestamp("o_orderdate") / 86400).cast("long").alias("day"),
    )
    # quantize each dimension onto the full 16-bit range, per the
    # zorder_key contract (bounds from a stats pass)
    b = o.agg(
        F.min("cust"), F.max("cust"), F.min("day"), F.max("day")
    ).first()
    cmin, cmax, dmin, dmax = b
    qc = ((F.col("cust") - cmin) * 65535 / (cmax - cmin)).cast("long")
    qd = ((F.col("day") - dmin) * 65535 / (dmax - dmin)).cast("long")

    schema = StructType.fromDDL("o_orderkey long, cust long, day long")
    lex = TableStore(spark, str(tmp_path / "lex"), schema)
    lex.commit(o, n_files=8, cluster_by=[F.col("day")])
    zed = TableStore(spark, str(tmp_path / "zed"), schema)
    zed.commit(o, n_files=8, cluster_by=[zorder_key(qc, qd)])

    lex_dir = lex._version_dir(1)
    zed_dir = zed._version_dir(1)

    # single-column clustering: tight on day, ~full range on cust
    assert _file_stat_fraction(lex_dir, "day") < 0.35
    assert _file_stat_fraction(lex_dir, "cust") > 0.85
    # z-order: meaningfully tight on BOTH dimensions
    assert _file_stat_fraction(zed_dir, "day") < 0.7
    assert _file_stat_fraction(zed_dir, "cust") < 0.7


def test_zorder_rejects_oversized_bits(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        zorder_key("a", "b", bits=17)
    with _pytest.raises(ValueError):
        zorder_key("a", "b", bits=0)
