"""Executor — device placement + event hooks.

The reference's Executor (include/ginkgo/core/base/executor.hpp:602-800)
carries three responsibilities: (1) memory ownership, (2) kernel dispatch,
(3) synchronization.  Under XLA, (2) collapses into jit tracing and (3) into
`jax.block_until_ready`, so the TPU-native Executor degenerates to *device /
mesh placement* plus the logging hook surface (allocation/copy/operation
events, executor.hpp:663-735) that the observability layer (§2.11) attaches
to.  `ReferenceExecutor` maps to the host CPU backend (the oracle tier in
tests), `TpuExecutor` to a TPU device, `MeshExecutor` to a jax.sharding.Mesh
for the distributed layer.
"""

from __future__ import annotations

import jax

from ..log.logger import Loggable, Event


class Executor(Loggable):
    def __init__(self):
        super().__init__()

    @property
    def device(self):
        from .exceptions import NotImplementedError_

        raise NotImplementedError_(type(self).__name__)

    def run(self, name: str, fn, *args, **kwargs):
        """Run a named operation with logging hooks (analog of
        Executor::run(Operation), executor.hpp:623)."""
        self.log(Event.operation_launched, executor=self, name=name)
        with jax.default_device(self.device):
            out = fn(*args, **kwargs)
        self.log(Event.operation_completed, executor=self, name=name)
        return out

    def put(self, tree):
        """Place a pytree on this executor's device (alloc+copy analog)."""
        self.log(Event.allocation_started, executor=self)
        out = jax.device_put(tree, self.device)
        self.log(Event.allocation_completed, executor=self)
        return out

    def copy_from(self, other_exec, tree):
        self.log(Event.copy_started, executor=self, source=other_exec)
        out = jax.device_put(tree, self.device)
        self.log(Event.copy_completed, executor=self, source=other_exec)
        return out

    def synchronize(self, tree=None):
        if tree is not None:
            jax.block_until_ready(tree)

    def get_master(self) -> "Executor":
        return ReferenceExecutor.create()

    def memory_accessible(self, other) -> bool:
        return self.device == other.device


class ReferenceExecutor(Executor):
    """Host CPU executor — the numerical ground-truth tier
    (executor.hpp:1320)."""

    @staticmethod
    def create():
        return ReferenceExecutor()

    @property
    def device(self):
        return jax.local_devices(backend="cpu")[0]

    def get_master(self):
        return self


# OmpExecutor (executor.hpp:1249) is a multithreaded CPU backend; XLA:CPU is
# already multithreaded, so it is the same device here.
OmpExecutor = ReferenceExecutor


class TpuExecutor(Executor):
    """Accelerator executor (analog of CudaExecutor, executor.hpp:1384)."""

    def __init__(self, device_id: int = 0):
        super().__init__()
        self._device_id = device_id

    @staticmethod
    def create(device_id: int = 0):
        return TpuExecutor(device_id)

    @property
    def device(self):
        devs = jax.devices()
        return devs[self._device_id % len(devs)]


class MeshExecutor(Executor):
    """Multi-chip executor: wraps a jax.sharding.Mesh; the distributed layer
    (§2.10) shards row-partitioned operators over its first axis."""

    def __init__(self, mesh):
        super().__init__()
        self.mesh = mesh

    @property
    def device(self):
        return self.mesh.devices.flat[0]

    @property
    def num_devices(self):
        return self.mesh.devices.size


def default_executor() -> Executor:
    dev = jax.devices()[0]
    if dev.platform == "cpu":
        return ReferenceExecutor.create()
    return TpuExecutor.create()
