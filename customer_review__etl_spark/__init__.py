"""customer_review__etl_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing surface of the reference repo
murangomike/Customer_Review_-ETL (a pandas/sklearn batch ETL + NLP
analytics pipeline, see SURVEY.md) as idiomatic Spark DataFrame / SQL /
Structured Streaming plans, designed for 100 TB scale:

- declarative DataFrame plans (Catalyst optimizes: pushdown, pruning,
  join selection); no RDDs, no driver-side loops over collect()
- built-in `pyspark.sql.functions` in every hot path; Arrow-batched
  pandas UDFs only where no built-in exists (Porter stemming)
- broadcast joins for small dimensions, AQE on, bounded top-K instead
  of unbounded collect_list
- Structured Streaming (watermarks, tumbling/sliding/session windows)
  for the event stream the reference approximated with @hourly reruns

Layout:
  sources/    typed table registry + readers/writers (parquet/csv/json)
  functions/  scalar/array column expressions (text chain, vectors)
  plans/      named query plans + DuckDB oracle SQL twins (driver contract)
  streaming/  readStream/writeStream jobs
  ml/         pyspark.ml pipeline mirroring cleaner.py's TF-IDF/LDA/RF
  multimodal/ binary-column plumbing (decode stubs, real Spark plumbing)
  app/        end-to-end review-ETL application (reference EP2 parity)
"""

__version__ = "0.1.0"
