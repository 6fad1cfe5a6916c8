"""pipeline_airflow_docker_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities of the reference repo ``DioNando/pipeline-airflow-docker``
(an Airflow ETL demo: CSV/JSON/REST/Kafka -> clean/enrich -> SQLite/Mongo),
generalized to the full relational + streaming + LLM-data-pipeline
operator surface documented in SURVEY.md §2.

Design stance (SURVEY.md §7): pure public PySpark — DataFrame API,
``spark.sql``, Structured Streaming, ``pyspark.ml.feature`` for LSH.
No custom Catalyst rules; every operator is expressed declaratively so
Catalyst/Tungsten handle pushdown, pruning, join selection, codegen and
AQE handle scale.
"""

__version__ = "0.1.0"
