"""Shared helpers for the Pallas kernel modules.

One definition of the padding/alignment arithmetic: the rounding rule is
fidelity-load-bearing (rank bucketing, padded_shape, VMEM budgets), and
four drifting copies were an accident waiting to happen.
"""


def round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult
