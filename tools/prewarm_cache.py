"""Prefill the persistent compile cache (NLE_JAX_CACHE_DIR) for a list of
serving shapes, so a LATER `nle-serve` boot — with or without --warmup —
hits the disk cache instead of paying minutes of remote compile per new
(shape, grid, bucket) (VERDICT r3 item 4; nle_tpu/serving/http.py
run_warmup documents what enters the compile keys and the full-rank
bucket caveat).

Run from /root/repo on the platform the server will use (the axon plugin
needs that cwd; ONE TPU job at a time):

    python tools/prewarm_cache.py 1024,1024,20,30,50,50 512,512,10,20
    python tools/prewarm_cache.py --platform=cpu 256,384,8,10   # CPU smoke

Each positional argument is an H,W,nr,nc[,iters[,k]] spec (same grammar
as nle-serve --warmup). Prints one JSON line per spec with the wall time
— re-running immediately should show warm-cache times (seconds, not
minutes); that drop is the evidence the prefill took.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    specs = []
    platform = None
    for a in sys.argv[1:]:
        if a.startswith("--platform="):
            platform = a.split("=", 1)[1]
        elif a.startswith("--"):
            print(f"prewarm_cache: unknown flag {a!r}", file=sys.stderr)
            return 2
        else:
            from nle_tpu.serving.http import parse_warmup_spec

            specs.append(parse_warmup_spec(a))
    if not specs:
        print(__doc__, file=sys.stderr)
        return 2
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    from nle_tpu.config import enable_persistent_cache
    from nle_tpu.serving.http import run_warmup

    enable_persistent_cache()
    import jax

    for spec, secs in zip(specs, run_warmup(specs)):
        print(json.dumps({
            "prewarmed": list(spec), "seconds": round(secs, 2),
            "platform": jax.default_backend(),
            "cache_dir": os.environ.get("NLE_JAX_CACHE_DIR",
                                        "<enable_persistent_cache default>"),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
