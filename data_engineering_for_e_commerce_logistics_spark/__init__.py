"""PySpark-native analytics engine with the query and data-processing
capabilities of MissoumYoucef/Data-Engineering-for-E-Commerce-Logistics
("LogiFlow"), re-designed Spark-first.

The reference is a single-process pandas + SQLAlchemy ETL pipeline
(see SURVEY.md).  This engine re-expresses every capability as lazy
DataFrame / Spark SQL plans optimized by Catalyst, adds a Structured
Streaming ingestion path, and extends the surface with the
large-scale training-data operators (dedup, similarity search,
multimodal columns, text analysis) needed at 100 TB.

Layout:
    session      SparkSession factory (UTC, AQE, Arrow)
    config       YAML config with ${ENV} substitution (ref: src/utils/config.py)
    catalog      named-table catalog over parquet dirs (replaces the
                 reference's dict[str, pd.DataFrame] hand-off)
    sources/     readers (CSV/parquet/JSON-API shapes), profiler, sinks
    operators/   cleaners, dedup, validators, text, similarity, multimodal
    plans/       analytic views + the query registry driving the oracle gate
    streaming/   Structured Streaming ingestion (watermark + windows)
    functions/   scalar helpers shared across operators
"""

__version__ = "0.1.0"
