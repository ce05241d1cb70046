from cicevse2024_tfm_datapipeline_spark.sources.readers import load_table, table_names

__all__ = ["load_table", "table_names"]
