"""PySpark-native analytics engine with the data-processing capability
surface of njordana77/CICEVSE2024_TFM_datapipeline (see SURVEY.md).

Spark-first re-expression: DataFrame/SQL over Catalyst, window functions,
broadcast lookup joins, seeded mapInPandas for the randomized edge, and
Spark ML where the reference uses sklearn/XGBoost.
"""

from cicevse2024_tfm_datapipeline_spark.session import get_spark

__all__ = ["get_spark"]
