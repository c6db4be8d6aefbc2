from nle_tpu.parallel.sharded import (
    apply_filter_factored_sharded,
    apply_filter_sharded,
    make_mesh,
    train_filter_sharded,
)

__all__ = ["make_mesh", "train_filter_sharded", "apply_filter_sharded",
           "apply_filter_factored_sharded", "make_global_mesh",
           "train_filters_multihost"]


def __getattr__(name):
    # The multi-process half imports lazily: nle_tpu.parallel is imported
    # by single-process paths that must not pull jax.distributed wiring.
    if name in ("make_global_mesh", "train_filters_multihost"):
        from nle_tpu.parallel import distributed

        return getattr(distributed, name)
    raise AttributeError(name)
