"""UDF surface: scalar/grouped-agg pandas UDFs + python-udf fallback."""
from .udfs import covar_pop_udaf, dot_product, l2_norm, py_bucket_fallback

__all__ = ["l2_norm", "dot_product", "covar_pop_udaf", "py_bucket_fallback"]
