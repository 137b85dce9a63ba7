"""Named query plans + DuckDB oracle SQL for differential testing."""
