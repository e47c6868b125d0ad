"""Import the torch reference model modules for golden-parity testing.

The reference package's top-level ``__init__`` pulls in torchvision (absent
here), so we register a stub ``vitok`` parent package whose ``__path__``
points at the read-only reference checkout and import only the torch-only
model modules (``vitok.models.ae`` and friends). Nothing from the reference
is copied — it is loaded purely as a numerical oracle.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def load_reference_ae():
    """Return the reference ``vitok.models.ae`` module, or None if unavailable."""
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    if "vitok" not in sys.modules:
        stub = types.ModuleType("vitok")
        stub.__path__ = [f"{REFERENCE_ROOT}/vitok"]
        sys.modules["vitok"] = stub
    try:
        import importlib

        return importlib.import_module("vitok.models.ae")
    except Exception:
        return None
