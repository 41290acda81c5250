"""Operator layer.

Each module registers named queries (Spark implementation) with an optional
DuckDB oracle-SQL twin via :mod:`.registry`. ``__spark_entry__.py`` exposes
the merged registry to the correctness driver.
"""
