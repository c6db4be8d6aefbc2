"""Serving subsystem: the train-once / edit-many flow over HTTP.

`nle-serve` (console script) runs a hardened stdlib HTTP service around
NLEFilter: request coalescing into pipelined training batches, bearer
auth, request-size limits, /metrics, and a bounded filter LRU with disk
spill. See nle_tpu.serving.http.
"""

from nle_tpu.serving.http import main, make_server, selftest

__all__ = ["main", "make_server", "selftest"]
