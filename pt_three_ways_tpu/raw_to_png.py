"""Offline merge tool (reference: src/main/raw_to_png.cpp).

Loads N ``.raw`` checkpoints (ours or the C++ reference's — the format is
bit-compatible), accumulates them exactly (sum,count addition), reports
per-file and average samples-per-pixel, writes a PNG.

Usage: python -m pt_three_ways_tpu.raw_to_png out.png in1.raw [in2.raw ...]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="raw_to_png")
    p.add_argument("output", help="output PNG filename")
    p.add_argument("inputs", nargs="+", help="input .raw files")
    args = p.parse_args(argv)

    import tempfile

    from .utils import native
    from .utils.framebuffer import ArrayOutput, merge
    from .utils.png import write_png

    loaded = []
    for name in args.inputs:
        a = ArrayOutput.load(name)
        spp = a.total_samples() / (a.width * a.height)
        print(f"{name}: {a.width}x{a.height}, {spp:.2f} spp")
        loaded.append(a)
    if native.load() is not None and len(args.inputs) > 1:
        # native C++ accumulate (csrc/pt3native.cpp), exact like the Python path
        with tempfile.NamedTemporaryFile(suffix=".raw") as tmp:
            native.raw_merge_native(list(args.inputs), tmp.name)
            acc = ArrayOutput.load(tmp.name)
    else:
        acc = merge(loaded)
    avg = acc.total_samples() / (acc.width * acc.height)
    print(f"Average spp: {avg:.2f}")
    write_png(args.output, acc.to_srgb8())
    return 0


if __name__ == "__main__":
    sys.exit(main())
