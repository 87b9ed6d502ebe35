from langchain_memvid_spark.operators import topk, dedup, textops, relational

__all__ = ["topk", "dedup", "textops", "relational"]
