"""Scene asset resolution.

The OBJ scene files (CornellBox-Original, suzanne, ce — public-domain data
shipped with the reference under /root/reference/scenes) are looked up at
runtime rather than vendored into this repo. Resolution order:

  1. ``$PT3_SCENES``
  2. ``<repo root>/scenes``
  3. ``/root/reference/scenes`` (the read-only reference mount)
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
