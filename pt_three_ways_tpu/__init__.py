"""pt_three_ways_tpu — a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas framework with the full capability surface of
mattgodbolt/pt-three-ways (scene catalog, OBJ/MTL ingest, the three "ways",
smallpt sidecar, raw checkpoint/merge, CLI) re-designed TPU-first: wavefront
integration over SoA path buffers, intersection as MXU matmuls, counter-based
RNG, sharded multi-chip rendering, and pixel gradients the reference lacks.
"""

__version__ = "0.1.0"

from .models.materials import MaterialSpec  # noqa: F401
from .models.scene import Scene, SceneBuilder, StatsSceneBuilder  # noqa: F401
from .ops.camera import Camera, make_camera, set_focus  # noqa: F401
from .utils.framebuffer import ArrayOutput  # noqa: F401
from .utils.render_params import RenderParams  # noqa: F401
