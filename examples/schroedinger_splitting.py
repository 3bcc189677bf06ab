"""Split-step Schroedinger propagation using the Fft LinOp.

Reference: examples/schroedinger-splitting.cpp (free propagation in
Fourier space, potential in real space)."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax
import jax.numpy as jnp
import ginkgo_tpu as gko


def _complex_device():
    """Some TPU runtimes lack complex dtypes; fall back to CPU for the FFT
    pipeline (the rest of the library is real-valued on TPU)."""
    try:
        np.asarray(jnp.asarray(1 + 1j, jnp.complex64) * 2)  # forced readback
        return None
    except Exception:
        return jax.local_devices(backend="cpu")[0]


def main(n=256, steps=50, dt=1e-3):
    dev = _complex_device()
    if dev is not None:
        print(f"complex dtypes unavailable on {jax.default_backend()}; "
              f"running on {dev.platform}")
        with jax.default_device(dev):
            return _run(n, steps, dt)
    return _run(n, steps, dt)


def _run(n, steps, dt):
    F = gko.Fft.create(n)
    Finv = gko.Fft.create(n, inverse=True)

    x = np.linspace(-np.pi, np.pi, n, endpoint=False)
    k = np.fft.fftfreq(n, d=(x[1] - x[0])) * 2 * np.pi
    psi = jnp.asarray(np.exp(-2 * x**2) * np.exp(2j * x), jnp.complex64)[:, None]
    V = jnp.asarray(0.5 * x**2, jnp.complex64)[:, None]
    kin = jnp.asarray(np.exp(-0.5j * dt * k**2), jnp.complex64)[:, None]
    pot = jnp.exp(-1j * dt * V)

    norm0 = float(jnp.linalg.norm(psi))
    for _ in range(steps):
        psi = Finv.apply(kin * F.apply(psi)) / n  # free flight
        psi = pot * psi  # potential kick
    drift = abs(float(jnp.linalg.norm(psi)) - norm0) / norm0
    print(f"norm drift after {steps} split steps: {drift:.2e}")


if __name__ == "__main__":
    main()
