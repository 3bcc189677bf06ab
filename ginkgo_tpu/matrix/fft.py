"""DFT LinOps.

Reference: include/ginkgo/core/matrix/fft.hpp — Fft (:73), Fft2 (:169),
Fft3 (:281), backed by cuFFT/hipFFT/oneMKL bindings.  The TPU-native binding
is XLA's FFT lowering via jnp.fft; inverse=True gives the unscaled inverse
transform like the reference (conjugate transpose of the DFT matrix)."""

from __future__ import annotations

import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d


@linop_dataclass
class Fft(LinOp):
    """1-D DFT on each column of b (size n)."""

    n: int = static_field(default=0)
    inverse: bool = static_field(default=False)

    @staticmethod
    def create(n, inverse=False):
        return Fft(n=int(n), inverse=bool(inverse))

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return jnp.complex64

    def apply(self, b):
        arr, was_1d = as_2d(b)
        arr = arr.astype(jnp.result_type(arr.dtype, jnp.complex64))
        if self.inverse:
            out = jnp.fft.ifft(arr, axis=0) * self.n  # unscaled inverse
        else:
            out = jnp.fft.fft(arr, axis=0)
        return restore_1d(out, was_1d)

    def transpose(self):
        return self  # DFT matrix is symmetric

    def conj_transpose(self):
        return Fft(n=self.n, inverse=not self.inverse)

    def inverse_op(self):
        return Fft(n=self.n, inverse=not self.inverse)


@linop_dataclass
class Fft2(LinOp):
    """2-D DFT: b columns are vec(row-major n1 x n2 grids)."""

    n1: int = static_field(default=0)
    n2: int = static_field(default=0)
    inverse: bool = static_field(default=False)

    @staticmethod
    def create(n1, n2=None, inverse=False):
        n2 = n2 if n2 is not None else n1
        return Fft2(n1=int(n1), n2=int(n2), inverse=bool(inverse))

    @property
    def shape(self):
        n = self.n1 * self.n2
        return (n, n)

    @property
    def dtype(self):
        return jnp.complex64

    def apply(self, b):
        arr, was_1d = as_2d(b)
        arr = arr.astype(jnp.result_type(arr.dtype, jnp.complex64))
        k = arr.shape[1]
        g = arr.reshape(self.n1, self.n2, k)
        if self.inverse:
            out = jnp.fft.ifft2(g, axes=(0, 1)) * (self.n1 * self.n2)
        else:
            out = jnp.fft.fft2(g, axes=(0, 1))
        return restore_1d(out.reshape(self.n1 * self.n2, k), was_1d)

    def conj_transpose(self):
        return Fft2(n1=self.n1, n2=self.n2, inverse=not self.inverse)


@linop_dataclass
class Fft3(LinOp):
    n1: int = static_field(default=0)
    n2: int = static_field(default=0)
    n3: int = static_field(default=0)
    inverse: bool = static_field(default=False)

    @staticmethod
    def create(n1, n2=None, n3=None, inverse=False):
        n2 = n2 if n2 is not None else n1
        n3 = n3 if n3 is not None else n1
        return Fft3(n1=int(n1), n2=int(n2), n3=int(n3), inverse=bool(inverse))

    @property
    def shape(self):
        n = self.n1 * self.n2 * self.n3
        return (n, n)

    @property
    def dtype(self):
        return jnp.complex64

    def apply(self, b):
        arr, was_1d = as_2d(b)
        arr = arr.astype(jnp.result_type(arr.dtype, jnp.complex64))
        k = arr.shape[1]
        g = arr.reshape(self.n1, self.n2, self.n3, k)
        if self.inverse:
            out = jnp.fft.ifftn(g, axes=(0, 1, 2)) * (self.n1 * self.n2 * self.n3)
        else:
            out = jnp.fft.fftn(g, axes=(0, 1, 2))
        return restore_1d(out.reshape(-1, k), was_1d)

    def conj_transpose(self):
        return Fft3(
            n1=self.n1, n2=self.n2, n3=self.n3, inverse=not self.inverse
        )
