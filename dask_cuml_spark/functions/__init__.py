from dask_cuml_spark.functions.json import fast_get_long
from dask_cuml_spark.functions.vector import dot, l2_sq, l2, cosine_unit

__all__ = ["dot", "l2_sq", "l2", "cosine_unit", "fast_get_long"]
