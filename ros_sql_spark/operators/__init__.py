from ros_sql_spark.operators.asof import asof_join, interval_join  # noqa: F401
from ros_sql_spark.operators.dedup import (  # noqa: F401
    connected_components,
    exact_dedup,
    minhash_bands,
    minhash_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from ros_sql_spark.operators.multimodal import (  # noqa: F401
    as_assets,
    extract_features,
    resize_media,
    sample_frames,
)
from ros_sql_spark.operators.normalize import denormalize, normalize  # noqa: F401
from ros_sql_spark.operators.rank import global_row_number, rank_stats  # noqa: F401
from ros_sql_spark.operators.similarity import (  # noqa: F401
    brute_force_knn,
    ivf_knn,
    lsh_knn,
)
from ros_sql_spark.operators.pq import (  # noqa: F401
    ivf_pq_knn,
    pq_encode,
    pq_knn,
    pq_train,
)
from ros_sql_spark.operators.sampling import (  # noqa: F401
    token_budget_mix,
    uniform_from_id,
    weighted_sample,
)
from ros_sql_spark.operators.skew import (  # noqa: F401
    detect_hot_keys,
    salted_aggregate,
    salted_broadcast_left_join,
    split_skew_join,
)
from ros_sql_spark.operators.graph import (  # noqa: F401
    pagerank,
    triangle_count,
)
