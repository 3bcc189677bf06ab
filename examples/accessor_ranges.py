"""Accessor ranges: storage-vs-arithmetic precision decoupling.

Reference: examples/ginkgo-ranges.cpp (range/accessor demo) + the
accessor library (SURVEY.md §2.12)."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
from ginkgo_tpu.base.accessor import ReducedRowMajor, ScaledReducedRowMajor


def main():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((6, 4)).astype(np.float32) * 3.0)

    # bf16 storage, f32 arithmetic (reduced_row_major)
    acc = ReducedRowMajor.create(v)
    err = float(jnp.max(jnp.abs(acc.read() - v)))
    print(f"reduced_row_major: storage {acc.storage_dtype}, "
          f"read dtype {acc.read().dtype}, max err {err:.2e}")

    # int16 storage with per-row scales (scaled_reduced_row_major)
    sacc = ScaledReducedRowMajor.create(v, storage_dtype=jnp.int16)
    err = float(jnp.max(jnp.abs(sacc.read() - v)))
    print(f"scaled_reduced_row_major: storage {sacc.storage.dtype}, "
          f"max err {err:.2e} (4 bytes -> 2 bytes per entry)")

    # lower-upper decomposition of a write: round-trips through storage
    acc2 = acc.write((0, 0), 1.5)
    print(f"write/read round-trip: {float(acc2.read((0, 0)))}")


if __name__ == "__main__":
    main()
