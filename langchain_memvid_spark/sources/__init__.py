from langchain_memvid_spark.sources.catalog import Catalog, load_table, register_views

__all__ = ["Catalog", "load_table", "register_views"]
