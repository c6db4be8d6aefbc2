"""Compatibility shim: the HTTP edit service moved into the package as
`nle_tpu.serving.http` (console script `nle-serve`). This path keeps the
old `python examples/serve_http.py` invocation working."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nle_tpu.serving.http import *          # noqa: F401,F403
from nle_tpu.serving.http import (          # noqa: F401
    _CoalescingTrainer,
    _FilterStore,
    _Metrics,
    _Service,
    main,
    make_server,
    selftest,
)

if __name__ == "__main__":
    main()
