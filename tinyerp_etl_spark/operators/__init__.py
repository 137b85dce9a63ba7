"""Analytics + data-pipeline operators beyond plain DataFrame calls."""
