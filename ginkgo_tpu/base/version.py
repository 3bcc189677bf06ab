"""Version info per module.

Reference: core/base/version.cpp — `version_info::get()` reports one
version per compiled backend module (core/reference/omp/cuda/hip/dpcpp);
here the "backends" are the Python core, the Pallas kernel set, and the
native C++ host library.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class version:
    major: int
    minor: int
    patch: int
    tag: str = ""

    def __str__(self):
        s = f"{self.major}.{self.minor}.{self.patch}"
        return f"{s}-{self.tag}" if self.tag else s


_CORE = version(0, 1, 0)


@dataclass(frozen=True)
class version_info_t:
    core_version: version
    pallas_version: version
    native_version: version


def version_info() -> version_info_t:
    """version_info::get() analog."""
    from ..io import native as native_io

    native_tag = "" if native_io.available() else "not built"
    return version_info_t(
        core_version=_CORE,
        pallas_version=_CORE,
        native_version=version(0, 1, 0, native_tag),
    )
