from .ragged import Ragged
from .table import Table, read_parquet, write_parquet
from .lookup import Lookup, create_lookup_objects
from .behaviors import (
    add_known_user_column,
    add_prediction_scores,
    create_binary_labels_column,
    create_user_id_to_int_mapping,
    down_sample_on_users,
    ebnerd_from_path,
    filter_minimum_negative_samples,
    join_history,
    remove_positives_from_inview,
    sample_article_ids,
    sampling_strategy_wu2019,
    truncate_history,
    unique_article_ids_in_behaviors,
)
from .articles import (
    build_token_lookup,
    build_value_lookup,
    concat_str_columns,
    convert_text2encoding_with_transformers,
    create_article_id_to_value_mapping,
    create_sort_based_prediction_score,
    load_article_id_embeddings,
)
from .dataloader import EvalFeed, NewsrecFeed
from .synthetic import make_synthetic_ebnerd
