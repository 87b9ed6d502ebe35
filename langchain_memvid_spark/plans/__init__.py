from langchain_memvid_spark.plans.registry import QUERIES, oracle_map, query_map

__all__ = ["QUERIES", "oracle_map", "query_map"]
