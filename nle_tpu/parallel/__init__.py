from nle_tpu.parallel.sharded import (
    apply_filter_factored_sharded,
    apply_filter_sharded,
    make_mesh,
    train_filter_sharded,
)

__all__ = ["make_mesh", "train_filter_sharded", "apply_filter_sharded",
           "apply_filter_factored_sharded"]
