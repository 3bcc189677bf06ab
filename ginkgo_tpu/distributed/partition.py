"""Row partitions for the distributed layer.

Reference: include/ginkgo/core/distributed/partition.hpp (range_bounds :169,
part_ids :181, range_starting_indices :199; builders build_from_mapping /
build_from_contiguous / build_from_global_size_uniform :254-284) and the
partition kernels (core/distributed/partition_kernels.hpp:48-80).

TPU difference: SPMD over a mesh axis requires *equal-shaped* shards, so
every partition also carries a padded local size (max part size rounded up);
rows beyond a part's true size are explicit padding.
"""

from __future__ import annotations

import numpy as np


class Partition:
    """Host-side description of a 1-D row partition into num_parts ranges."""

    def __init__(self, part_of_row: np.ndarray, num_parts: int):
        self.part_of_row = np.asarray(part_of_row, dtype=np.int64)
        self.num_parts = int(num_parts)
        self.global_size = len(self.part_of_row)
        counts = np.bincount(self.part_of_row, minlength=num_parts)
        self.part_sizes = counts
        # local index of each row within its part
        order = np.argsort(self.part_of_row, kind="stable")
        local = np.empty(self.global_size, dtype=np.int64)
        offs = np.zeros(num_parts + 1, dtype=np.int64)
        offs[1:] = np.cumsum(counts)
        for p in range(num_parts):
            local[order[offs[p] : offs[p + 1]]] = np.arange(counts[p])
        self.local_of_row = local
        self.rows_of_part = [order[offs[p] : offs[p + 1]] for p in range(num_parts)]

    # -- builders (partition.hpp:254-284) --------------------------------------

    @staticmethod
    def build_from_mapping(mapping, num_parts: int) -> "Partition":
        return Partition(np.asarray(mapping), num_parts)

    @staticmethod
    def build_from_contiguous(range_bounds) -> "Partition":
        rb = np.asarray(range_bounds, dtype=np.int64)
        num_parts = len(rb) - 1
        mapping = np.zeros(rb[-1], dtype=np.int64)
        for p in range(num_parts):
            mapping[rb[p] : rb[p + 1]] = p
        return Partition(mapping, num_parts)

    @staticmethod
    def build_from_global_size_uniform(global_size: int, num_parts: int) -> "Partition":
        base = global_size // num_parts
        rem = global_size % num_parts
        sizes = np.full(num_parts, base, dtype=np.int64)
        sizes[:rem] += 1
        bounds = np.zeros(num_parts + 1, dtype=np.int64)
        bounds[1:] = np.cumsum(sizes)
        return Partition.build_from_contiguous(bounds)

    # -- queries ----------------------------------------------------------------

    @property
    def num_ranges(self) -> int:
        # ranges = maximal contiguous runs with one owner
        return int(np.sum(self.part_of_row[1:] != self.part_of_row[:-1]) + 1) if (
            self.global_size
        ) else 0

    def has_ordered_parts(self) -> bool:
        return bool(np.all(np.diff(self.part_of_row) >= 0))

    @property
    def padded_local_size(self) -> int:
        return int(self.part_sizes.max()) if self.num_parts else 0

    def global_row(self, part: int, local: np.ndarray) -> np.ndarray:
        return self.rows_of_part[part][local]
