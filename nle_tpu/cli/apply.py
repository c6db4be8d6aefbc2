"""`nle-apply` CLI — edit an image with a PREVIOUSLY trained filter.

    nle-apply <filter.npz> <image> <output> <w1> [w2 ...]

New capability beyond the reference (which retrains per edit,
include/filter.hpp:52-53): a filter saved by `nle-enhance --save-filter=`
or `TrainedFilter.save` re-weights detail layers at apply cost only — two
skinny MXU matmuls + the Lab round trip. The image must match the training
image's size (same guard as NLEFilter::enhance, src/filter.cpp:414-420).
"""

from __future__ import annotations

import sys

from nle_tpu.cli.common import (
    add_common_flags,
    apply_common_flags,
    maybe_show,
    split_flags,
    validate_flags,
)

USAGE = "Usage: {prog} <filter.npz> <image> <output> <weight 1> [weight 2 ...]"


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    pos, flags = split_flags(argv)
    if len(pos) < 4:
        print(USAGE.format(prog="nle-apply"), file=sys.stderr)
        print(add_common_flags(), file=sys.stderr)
        return 0

    err = validate_flags(flags)
    if err is None:
        try:
            filter_path, image_path, output_path = pos[0], pos[1], pos[2]
            weights = [float(w) for w in pos[3:]]
        except ValueError as e:
            err = f"Bad argument: {e}"
    if err is not None:
        print(err, file=sys.stderr)
        print(USAGE.format(prog="nle-apply"), file=sys.stderr)
        print(add_common_flags(), file=sys.stderr)
        return 0

    apply_common_flags(flags)
    from nle_tpu.models.filter import NLEFilter, load_filter
    from nle_tpu.utils.imageio import imread_bgr, imwrite_bgr

    try:
        trained = load_filter(filter_path)
    except FileNotFoundError:
        print(f"Failed to read filter from {filter_path}", file=sys.stderr)
        return 0
    except Exception as e:  # corrupt/invalid .npz
        print(f"Failed to read filter from {filter_path}: {e}",
              file=sys.stderr)
        return 0
    try:
        image = imread_bgr(image_path)
    except FileNotFoundError:
        print(f"Failed to read file from {image_path}", file=sys.stderr)
        return 0

    flt = NLEFilter(trained=trained)
    try:
        result = flt.enhance(image, weights)
    except ValueError as e:  # size-mismatch guard (src/filter.cpp:414-420)
        print(str(e), file=sys.stderr)
        return 0
    imwrite_bgr(output_path, result)
    print("Done.")
    maybe_show(result, flags)
    return 0


if __name__ == "__main__":
    sys.exit(main())
