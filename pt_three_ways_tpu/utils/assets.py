"""Scene asset resolution.

The OBJ scene files (CornellBox-Original, suzanne, ce — open data, see the
.md provenance notes next to each) are VENDORED under ``<repo>/scenes`` so
the repo renders all catalog scenes standalone. Resolution order:

  1. ``$PT3_SCENES``
  2. ``<repo root>/scenes`` (vendored — the normal case)
  3. ``/root/reference/scenes`` (the read-only reference mount, if present)
"""

from __future__ import annotations

import os

_REFERENCE_SCENES = "/root/reference/scenes"


def scenes_dir() -> str:
    env = os.environ.get("PT3_SCENES")
    if env and os.path.isdir(env):
        return env
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    local = os.path.join(here, "scenes")
    if os.path.isdir(local):
        return local
    if os.path.isdir(_REFERENCE_SCENES):
        return _REFERENCE_SCENES
    raise FileNotFoundError(
        "No scenes directory found (set PT3_SCENES or create ./scenes)"
    )
