"""json2hbase_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities
of the reference ``pythian/json2hbase`` (JSON → HBase-cell ETL),
re-expressed Spark-first (DataFrame/SQL/Catalyst/Structured
Streaming), and extended with the relational + LLM-data-pipeline
operator surface documented in SURVEY.md §2.

NOTE ON PROVENANCE: the reference checkout at /root/reference/ is
empty (SURVEY.md §0), so no file:line citations into the reference
are possible. Semantics are pinned instead by SURVEY.md, FIXTURES.md
golden fixtures, and the DuckDB oracle contract in __spark_entry__.py.
"""

__version__ = "0.1.0"
