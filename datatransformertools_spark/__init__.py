"""PySpark-native analytics engine with the capabilities of the
reference repo aibelbin/DataTransformerTools, re-expressed as
distributed DataFrame plans and extended with large-scale
training-data pipeline operators (dedup, similarity search,
multimodal plumbing, text analysis).

Design: DataFrame/SQL only, built-in JVM functions in every hot
path, broadcast dims, band/bucket-keyed self-joins — built for a
1000-executor cluster, tested on local[32].
"""

from datatransformertools_spark import registry
from datatransformertools_spark.session import get_spark

__all__ = ["get_spark", "registry"]
