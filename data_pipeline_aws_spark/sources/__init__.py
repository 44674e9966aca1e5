"""Sources & sinks (SURVEY §2.1): parquet/JSON/CSV readers, partitioned sinks."""
