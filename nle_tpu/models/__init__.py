from nle_tpu.models.filter import NLEFilter, TrainedFilter

__all__ = ["NLEFilter", "TrainedFilter"]
