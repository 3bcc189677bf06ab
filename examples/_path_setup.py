"""Import shim so examples run as plain scripts from a source checkout:
puts the repo root (one level up) on sys.path if ginkgo_tpu isn't installed."""
import os
import sys

try:
    import ginkgo_tpu  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

# honor JAX_PLATFORMS for CLI runs: the env var alone does not reliably
# switch backends on this tunnel build — the config update does
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
