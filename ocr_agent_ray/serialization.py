"""Worker-serialization helper: make the package deliverable by value.

Ray workers normally deserialize our stage classes and map closures by
importing ``ocr_agent_ray`` — which fails (surfacing as a silent
actor-restart hang) whenever the driver process could import the package
but the workers cannot (driver cwd != repo root, PYTHONPATH not
propagated). Registering every loaded ``ocr_agent_ray`` module with Ray's
VENDORED cloudpickle switches those objects to by-value serialization, so
workers need no import at all. Worker-executed code must not re-import
the package at runtime (internal imports are hoisted to module level).
"""

from __future__ import annotations

import os
import sys

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def register_for_ray_workers(force: bool = False) -> None:
    """Idempotent; cheap no-op when workers can import the package anyway
    (cwd == repo root) unless ``force``."""
    if not force and os.getcwd() == _PKG_ROOT:
        return
    try:
        from ray import cloudpickle

        # load the full worker-facing tree before registering
        import ocr_agent_ray.pipelines.extract  # noqa: F401
        import ocr_agent_ray.stages.media  # noqa: F401

        for name, mod in list(sys.modules.items()):
            if name.startswith("ocr_agent_ray") and mod is not None:
                try:
                    cloudpickle.register_pickle_by_value(mod)
                except Exception:
                    pass
    except Exception:
        pass
