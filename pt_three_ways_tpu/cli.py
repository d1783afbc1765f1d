"""Command-line interface (reference: src/main/main.cpp:370-473).

Same flags and defaults as the reference binary, with TPU-specific additions
(--dtype, --tri-chunk, --devices, --passes-per-dispatch). Tuning knobs
(rng mode, dispatch fusion, feedback sort, tail compaction) come from the
RUNTIME AUTOTUNE for every scene — the first pass group doubles as a probe
(models/render.autotune_decisions); the reference needs no tuning either
(main.cpp:370-453). ``-h`` means HEIGHT like the reference (clara uses -h
for height too); use --help for help.

Usage:
    python -m pt_three_ways_tpu.cli [options] output.png
"""

from __future__ import annotations

import argparse
import random
import sys
import time


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pt_three_ways_tpu", add_help=False,
        description="TPU-native path tracer (pt-three-ways capability set)",
    )
    p.add_argument("--help", action="help", help="show this help")
    p.add_argument("-w", "--width", type=int, default=1920, help="output image width")
    p.add_argument("-h", "--height", type=int, default=1080, help="output image height")
    p.add_argument("--max-cpus", type=int, default=1,
                   help="accepted for reference compatibility (scheduling is XLA's)")
    p.add_argument("--spp", type=int, default=40, help="number of samples per pixel")
    p.add_argument("--first-bounce-u", type=int, default=4,
                   help="number of first bounce u samples")
    p.add_argument("--first-bounce-v", type=int, default=4,
                   help="number of first bounce v samples")
    p.add_argument("--max-depth", type=int, default=5, help="maximum recursion depth")
    p.add_argument("--seed", type=int, default=0,
                   help="set rendering seed (0 to use random seed)")
    p.add_argument("--preview", action="store_true", help="super quick preview")
    p.add_argument("--save-every", type=int, default=30,
                   help="periodically save (every secs), 0 to disable")
    p.add_argument("--way", default="dod",
                   help="which way: dod/wavefront (default), oo/megakernel, fp/functional")
    p.add_argument("--scene", default="cornell", help="which scene to render")
    p.add_argument("--raw", action="store_true", help="output in raw form")
    p.add_argument("--dtype", default="float32", choices=["float32", "float64"],
                   help="compute dtype (float64 only on CPU)")
    p.add_argument("--epsilon", type=float, default=None,
                   help="geometric epsilon (default: derived from scene "
                        "scale — models/scene.auto_epsilon — unless a "
                        "catalog.EPSILON_HINT override exists)")
    p.add_argument("--tri-chunk", type=int, default=1024,
                   help="triangles per intersection chunk")
    p.add_argument("--passes-per-dispatch", type=int, default=0,
                   help="sample passes fused per device dispatch "
                        "(0 = runtime-autotuned on TPU; an explicit value "
                        "pins the group size while rng/sort/tail stay "
                        "autotuned; with --devices>1 each dp replica "
                        "renders a block of this many samples per dispatch)")
    p.add_argument("--progress", action="store_true", help="print progress lines")
    p.add_argument("--resume", default=None, metavar="CKPT.raw",
                   help="resume from a .raw checkpoint of the same config")
    p.add_argument("--devices", type=int, default=1,
                   help="shard the render over N devices (1 = single device)")
    p.add_argument("--dp", type=int, default=1,
                   help="sample-parallel replicas within --devices")
    p.add_argument("output", help="output filename")
    return p


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from .models.catalog import EPSILON_HINT, create_scene, hint_key
    from .models.render import render
    from .models.scene import SceneBuilder, StatsSceneBuilder
    from .utils.framebuffer import ArrayOutput
    from .utils.png import write_png
    from .utils.render_params import RenderParams

    from .models.ways import WAYS

    if args.way not in WAYS:
        print(f"Unknown way {args.way}", file=sys.stderr)
        return 1

    seed = args.seed if args.seed != 0 else random.SystemRandom().randrange(1, 2**31)

    if args.scene == "smallpt":
        # the smallpt sidecar has its own camera/film pipeline
        # (models/smallpt.py; reference src/smallpt/smallpt.cpp)
        from .models.smallpt import render_smallpt
        from .utils.framebuffer import ArrayOutput as _AO, srgb8
        from .utils.png import write_png as _write_png

        start = time.time()
        img = render_smallpt(args.width, args.height, args.spp, seed=seed)
        elapsed = time.time() - start
        if args.raw:
            _AO.from_mean(img, args.spp).save(args.output)
        else:
            _write_png(args.output, srgb8(img))
        total = args.width * args.height * args.spp
        print(f"Took {elapsed:.3f}s")
        print(f"Total samples: {total}")
        print(f"Samples/ms: {total / (elapsed * 1000.0):.2f}")
        return 0
    params = RenderParams(
        width=args.width,
        height=args.height,
        preview=args.preview,
        samples_per_pixel=args.spp,
        max_depth=args.max_depth,
        first_bounce_u_samples=args.first_bounce_u,
        first_bounce_v_samples=args.first_bounce_v,
        seed=seed,
        dtype=args.dtype,
        epsilon=args.epsilon if args.epsilon is not None
        else EPSILON_HINT.get(hint_key(args.scene), 1e-4),
        passes_per_dispatch=args.passes_per_dispatch,
    )
    # Tuning is the RUNTIME AUTOTUNE's job for every scene — catalog and
    # user OBJ alike (models/render.render: the first pass group doubles
    # as a probe whose per-lane bounce counts drive rng_mode /
    # passes-per-dispatch / feedback-sort / tail decisions; render_sharded
    # runs the same flow). The measured per-scene hint tables in
    # models/catalog.py are no longer consulted here: they are the TEST
    # ORACLE that pins autotune_decisions to the measured optima
    # (tests/test_autotune.py), so a kernel change that shifts an optimum
    # fails a test instead of silently diverging from the heuristic.
    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32

    stats = StatsSceneBuilder()
    try:
        create_scene(stats, args.scene, params, dtype)
    except ValueError as e:
        print(e, file=sys.stderr)
        return 1
    print(stats.report())

    builder = SceneBuilder()
    camera = create_scene(builder, args.scene, params, dtype)
    scene = builder.build(dtype)

    # AUTO-EPSILON: no explicit --epsilon and no measured per-scene
    # override -> derive epsilon from scene scale (models/scene
    # .auto_epsilon; refgate-validated, replaces name-keyed defaults so
    # user OBJ scenes get the same treatment as catalog scenes)
    if args.epsilon is None and hint_key(args.scene) not in EPSILON_HINT:
        from .models.scene import auto_epsilon

        params = params.replace(epsilon=auto_epsilon(scene, camera))

    def save(output: ArrayOutput) -> None:
        if args.raw:
            output.save(args.output)
        else:
            write_png(args.output, output.to_srgb8())

    start = time.time()
    if args.devices > 1:
        from .parallel.mesh import make_mesh
        from .parallel.shard import render_sharded

        mesh = make_mesh(n_devices=args.devices, dp=args.dp)
        output = render_sharded(
            scene,
            camera,
            params,
            mesh,
            way=args.way,
            tri_chunk=args.tri_chunk,
            update_fn=save,
            save_every_seconds=float(args.save_every),
            progress=args.progress,
            resume_from=args.resume,
        )
    else:
        output = render(
            scene,
            camera,
            params,
            way=args.way,
            update_fn=save,
            save_every_seconds=float(args.save_every),
            progress=args.progress,
            tri_chunk=args.tri_chunk,
            resume_from=args.resume,
        )
    elapsed = time.time() - start
    save(output)

    total_samples = output.total_samples()
    print(f"Took {elapsed:.3f}s")
    print(f"Total samples: {total_samples}")
    print(f"Samples/ms: {total_samples / (elapsed * 1000.0):.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
