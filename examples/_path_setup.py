"""Import shim so examples run as plain scripts from a source checkout:
puts the repo root (one level up) on sys.path if ginkgo_tpu isn't installed."""
import os
import sys

try:
    import ginkgo_tpu  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
