"""Differential-testing harness: Spark query vs DuckDB oracle.

Mirrors the driver's correctness gate: run the DataFrame query and the
ANSI-SQL oracle on the same parquet tables, then compare row count +
column set + an order-insensitive canonical form of every value. We
compare exact values (not hashes) so failures are debuggable.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from tinyerp_etl_spark.sources.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    """Run oracle SQL in DuckDB with the test tables as views."""
    con = duckdb.connect()
    try:
        for name in TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _canon_value(v: Any) -> Any:
    """Canonicalize one cell so Spark/DuckDB representations compare equal."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # exact float identity: repr of the double bits
        return float(v).hex()
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
        # The DRIVER's canonicalizer sorts raw pandas frames and dies on
        # list cells (`TypeError: unhashable type: 'list'` — both
        # CORRECTNESS_r07 failures). Tuple-izing here made the local
        # sweep MORE forgiving than the gate, so complex-typed outputs
        # passed locally and failed remotely. Fail loudly instead:
        # registered queries must emit scalar rows (posexplode arrays —
        # the embedding_label_centroids pattern).
        raise TypeError(
            "complex-typed result cell (list/map/struct): the driver "
            "canonicalizer cannot hash it — explode to scalar rows "
            f"(got {type(v).__name__}: {v!r:.80})"
        )
    if hasattr(v, "item") and type(v).__module__ == "numpy":  # numpy scalar
        return _canon_value(v.item())
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    return v


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    """Column-name-sorted, row-sorted canonical form of a result."""
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_value(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def assert_driver_hashable(spark_df, name: str = "?") -> None:
    """Assert every top-level output column is scalar-typed.

    The driver's correctness gate canonicalizes results by sorting and
    hashing pandas cells; Array/Map/Struct cells crash it (the two
    CORRECTNESS_r07 failures). This is the schema-level contract every
    registered query must satisfy: ship vectors exploded
    (posexplode → one scalar row per element), never as array columns.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType as _St

    bad = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, _St))
    ]
    assert not bad, (
        f"{name}: complex-typed output column(s) {bad} — the driver "
        "canonicalizer cannot hash list/map/struct cells; explode to "
        "scalar rows (the embedding_label_centroids pattern)"
    )


#: Plans with a DELIBERATE single-task window over a k-row
#: control-plane frame (documented at each query's definition). The
#: lint reads plan shape, not cardinality, so these are exempted BY
#: NAME — any new exemption needs the same in-code justification.
PLANLINT_EXEMPT = {
    # 5 post-aggregation scenario rows get ordinals via a global
    # row_number — control plane, not a data path (etl_queries.py)
    "watermark_resolution_matrix",
}


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, name: str = "?") -> None:
    """Assert the Spark result matches the DuckDB oracle result —
    and that its physical plan is scale-clean (planlint), so every
    oracle-parity run is also a full plan audit: no unpartitioned
    windows, no cartesian products, no row-at-a-time Python anywhere
    in the registered surface."""
    from tinyerp_etl_spark.operators.planlint import plan_findings

    assert_driver_hashable(spark_df, name=name)
    if name not in PLANLINT_EXEMPT:
        findings = plan_findings(spark_df)
        assert findings == [], f"{name}: plan lint findings: {findings}"
    got = spark_df.toPandas()
    want = run_oracle(sql, sf_dir)
    assert len(got) == len(want), (
        f"{name}: row count mismatch spark={len(got)} oracle={len(want)}"
    )
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch spark={sorted(got.columns)} "
        f"oracle={sorted(want.columns)}"
    )
    got_rows = canonical_rows(got)
    want_rows = canonical_rows(want)
    if got_rows != want_rows:
        diffs = [
            (i, g, w)
            for i, (g, w) in enumerate(zip(got_rows, want_rows))
            if g != w
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
