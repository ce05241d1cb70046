from cicevse2024_tfm_datapipeline_spark.functions.scalars import (
    BENIGN_LIKE,
    attack_group_expr,
    binary_label_expr,
    charging_flag_expr,
    norm_str,
    safe_double,
)

__all__ = [
    "BENIGN_LIKE",
    "attack_group_expr",
    "binary_label_expr",
    "charging_flag_expr",
    "norm_str",
    "safe_double",
]
