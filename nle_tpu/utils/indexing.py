"""Row-major flatten index math (semantics of reference include/utils.hpp:11-19)."""


def to_1d_index(row, col, ncols):
    return row * ncols + col


def to_2d_coords(index, ncols):
    return index // ncols, index % ncols
