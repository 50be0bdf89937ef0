from olake_spark.functions.zorder import (  # noqa: F401
    hilbert_index_np,
    interleave_bits_np,
    make_cluster_key_udf,
)
