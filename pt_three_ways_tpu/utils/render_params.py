"""Render configuration.

Mirrors the reference's RenderParams POD (src/util/RenderParams.h:3-13) and
adds the TPU-specific knobs (dtype, mesh/sharding, ray-batch sizing) that have
no CPU analogue.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class RenderParams:
    width: int = 1920
    height: int = 1080
    preview: bool = False
    samples_per_pixel: int = 40
    max_depth: int = 5
    first_bounce_u_samples: int = 4
    first_bounce_v_samples: int = 4
    seed: int = 0

    # --- TPU-specific extensions (no reference analogue) ---
    # Compute dtype for the integrator ("float32" or "float64"; f64 only
    # meaningful on CPU oracle runs).
    dtype: str = "float32"
    # Geometric epsilon; scenes with large coordinates override it.
    epsilon: float = 1e-4
    # Passes fused into one device dispatch (spp is split into ceil(spp/k)
    # dispatches of k passes each). 0 = auto.
    passes_per_dispatch: int = 0
    # Feedback work-sort for the regen megakernel: chain each dispatch's
    # per-lane bounce counts into the next dispatch's lane ordering so
    # tiles become work-homogeneous (bit-exact permutation; measured win
    # on open mesh scenes — models/catalog.FEEDBACK_SORT_HINT).
    regen_feedback_sort: bool = False
    # Number of devices to shard rays over (0 = all visible devices).
    max_devices: int = 1
    # Use the BVH-accelerated intersector when the scene is large enough.
    use_bvh: bool = True
    # Intersection backend: "auto" (fused Pallas kernel on TPU, XLA
    # elsewhere), "xla", "pallas", or "pallas-interpret" (testing).
    intersector: str = "auto"
    # Rematerialise each bounce in the backward pass (path-replay backprop:
    # per-bounce intermediates are recomputed from the compact path state
    # instead of stored).
    remat: bool = False
    # Kill paths whose throughput is exactly zero (identical images, much
    # less work in light-dominated scenes). Off in the training path: a path
    # with beta == 0 can still carry a nonzero DERIVATIVE (d beta/d albedo
    # at albedo == 0), which the kill would silently drop.
    kill_dead_paths: bool = True
    # Fused bounce megakernel (ops/pallas_megakernel.py): "auto" uses it
    # whenever the Pallas intersector is active (forward-only — the training
    # path sets "off" to keep the differentiable lax.scan wavefront).
    fused: str = "auto"
    # Bounce-uniform source for the regenerating megakernel: "auto"/"kernel"
    # computes them IN-KERNEL with a counter hash of (lane, sample, depth,
    # seed) — no HBM uniform tables, tiling/sharding-invariant draws
    # (ops/kernel_rng.py); "table" keeps the precomputed threefry tables that
    # are bit-compatible with the lax.scan wavefront (estimator-equivalence
    # tests). Images from the two modes agree statistically, never bitwise.
    rng_mode: str = "auto"
    # Tail compaction for the in-kernel-RNG regen megakernel: each tile's
    # bounce loop stops once live lanes drop below this fraction of the
    # tile; survivors are packed densely and ONE continuation dispatch
    # finishes them at high occupancy (exact — resumes identical in-flight
    # state). Attacks the stochastic lane-lifetime spread the feedback sort
    # cannot predict. 0 disables.
    regen_tail_frac: float = 0.0
    # Runtime auto-tuning (models/render.autotune_decisions): when every
    # regen knob above is at its default on TPU, the first pass group's
    # per-lane bounce counts choose (rng_mode, passes_per_dispatch,
    # feedback_sort, tail_frac) — the measured catalog hints, derived at
    # runtime for unknown scenes. Estimator-neutral scheduling except
    # rng_mode, which is decided deterministically (and re-derived on
    # --resume) so fixed-seed runs stay bit-reproducible.
    autotune: bool = True
    # Number of tail-compaction levels: 1 = the classic single continuation;
    # >1 packs each continuation's own stragglers again (geometrically
    # smaller dispatches) so occupancy stays high all the way down. Exact at
    # any value (chronological per-lane accumulation order is preserved).
    regen_tail_levels: int = 1

    @property
    def first_bounce_samples(self) -> int:
        return self.first_bounce_u_samples * self.first_bounce_v_samples

    def replace(self, **kw) -> "RenderParams":
        return replace(self, **kw)
