"""Command-line interface: the TPU-native replacement of the reference app.

Mirrors the reference UX (``./main sigma minVal maxVal [-s] [-c]``,
src/main.cpp:18-76) adapted to a datacenter: input is an image / video /
directory / synthetic spec instead of a webcam, ``-s`` saves min-max
normalized per-stage PNGs instead of opening GUI windows
(src/utils.cpp:440-486), and backend selection is a runtime flag instead of
a compile-time CUDA switch (CMakeLists.txt:4-8).

Examples::

    python -m canny_edge_tpu.cli tests/test.jpg 1.0 50 150 -o edges.png
    python -m canny_edge_tpu.cli video.mp4 1.4 50 150 --batch 8 --out-dir out/
    python -m canny_edge_tpu.cli synthetic:1080x1920x64 1.4 50 150 --backend sharded
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="canny-tpu",
        description="TPU-native Canny edge detection",
        epilog="sigma: stddev of the Gaussian blur kernel; "
               "minVal/maxVal: hysteresis thresholds in [0,255]",
    )
    p.add_argument("input", help="image/video path, directory, camera index, "
                                 "or synthetic:HxW[xN]")
    p.add_argument("sigma", type=float, help="Gaussian sigma")
    p.add_argument("min_val", type=int, metavar="minVal",
                   help="minimum hysteresis threshold [0,255]")
    p.add_argument("max_val", type=int, metavar="maxVal",
                   help="maximum hysteresis threshold [0,255]")
    p.add_argument("-s", "--save-steps", action="store_true",
                   help="save per-stage intermediate images (the reference's"
                        " -s display)")
    p.add_argument("-o", "--output", default=None,
                   help="output path for a single image input")
    p.add_argument("--out-dir", default="canny_out",
                   help="output directory for multi-frame inputs / steps")
    p.add_argument("--backend", default="fused",
                   choices=["fused", "xla", "pallas", "sharded", "golden"],
                   help="execution backend (default: fused — best engine "
                        "per stage on a single chip)")
    p.add_argument("--hysteresis", default="component",
                   choices=["component", "strict-reference"],
                   help="hysteresis rule: clean 8-connected components, or "
                        "the reference binary's BFS including its bounds "
                        "quirk (src/utils.cpp:378,399)")
    p.add_argument("--batch", type=int, default=1,
                   help="frames per device batch")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--mesh", default=None,
                   help="sharded mesh as DATAxYxX, e.g. 1x2x4")
    p.add_argument("--time", action="store_true", dest="timeit",
                   help="print per-stage timing (reference's Execution time"
                        " print, structured)")
    p.add_argument("--json", action="store_true",
                   help="emit machine-readable stats on stdout")
    return p


def validate_args(args) -> None:
    # mirrors src/main.cpp:63-76 (with real exit codes instead of exit(0))
    if args.max_val <= args.min_val:
        raise SystemExit("ERROR: minVal must be less than maxVal")
    if not (0 <= args.min_val <= 255):
        raise SystemExit("ERROR: minVal must be in the range of [0,255]")
    if not (0 <= args.max_val <= 255):
        raise SystemExit("ERROR: maxVal must be in the range of [0,255]")
    if args.sigma <= 0:
        raise SystemExit("ERROR: sigma must be positive")
    if args.hysteresis == "strict-reference" and args.backend == "sharded":
        raise SystemExit("ERROR: strict-reference hysteresis is a "
                         "single-chip contract mode (the quirk pixel lives "
                         "at a fixed global corner); use backend xla, "
                         "pallas, or golden")


def _apply_platform_env() -> None:
    """Honor JAX_PLATFORMS even when the runtime pre-imports jax.

    Some environments pre-import jax at interpreter startup (TPU plugin
    sitecustomize), in which case the JAX_PLATFORMS env var has already been
    read by the time user code runs; re-applying it via the live config
    before backend initialization restores the documented behavior."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except RuntimeError:
            pass  # backend already initialized; nothing to do


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    validate_args(args)
    _apply_platform_env()

    from .io import imageio, video

    try:
        frames = video.open_source(args.input, args.max_frames)
    except FileNotFoundError as e:
        raise SystemExit(f"ERROR: {e}")

    if args.backend == "golden":
        from . import golden

        hyst = (golden.hysteresis_strict
                if args.hysteresis == "strict-reference"
                else golden.hysteresis)

        def run_batch(batch):
            outs = []
            for f in batch:
                sm = golden.gaussian_blur(f, args.sigma)
                nm = golden.nonmax_suppression(*golden.sobel(sm))
                outs.append(hyst(nm, args.min_val, args.max_val))
            return np.stack(outs)
    elif args.backend == "sharded":
        import jax

        from .parallel import ShardedCanny, make_mesh

        first = next(iter(frames))
        frames = _chain_first(first, frames)
        if args.mesh:
            d, y, x = (int(v) for v in args.mesh.split("x"))
            mesh = make_mesh(data=d, y=y, x=x)
        else:
            mesh = make_mesh()
        ndata = mesh.shape["data"]
        if args.batch % ndata:
            raise SystemExit(f"ERROR: --batch {args.batch} must be a "
                             f"multiple of the mesh data axis ({ndata})")
        model = ShardedCanny(mesh, args.sigma, first.shape)

        def run_batch(batch):
            # pad short final batches to the compiled batch size (keeps the
            # data-axis placement valid and avoids a recompile per distinct
            # remainder), then trim the zero frames from the output
            n_real = batch.shape[0]
            if n_real != args.batch:
                pad = np.zeros((args.batch - n_real,) + batch.shape[1:],
                               batch.dtype)
                batch = np.concatenate([batch, pad])
            out = np.asarray(model(model.shard_batch(batch),
                                   args.min_val, args.max_val))
            return out[:n_real]
    else:
        from .models import CannyTPU

        model = CannyTPU(sigma=args.sigma, backend=args.backend,
                         hysteresis_mode=args.hysteresis)

        def run_batch(batch):
            if batch.shape[0] == 1:
                return np.asarray(model(batch[0], args.min_val,
                                        args.max_val))[None]
            return np.asarray(model.batch(batch, args.min_val, args.max_val))

    n_out = 0
    total_px = 0
    profiled_frame = None
    t0 = time.perf_counter()
    single_image = (os.path.splitext(args.input)[1].lower()
                    in video.IMAGE_EXTS and args.output)
    for bi, batch in enumerate(video.batched(frames, args.batch)):
        edges = run_batch(batch)
        total_px += batch.size
        if profiled_frame is None:
            profiled_frame = batch[0]
        for fi in range(edges.shape[0]):
            if single_image:
                out_path = args.output
            else:
                out_path = os.path.join(args.out_dir,
                                        f"edges_{n_out:06d}.png")
            imageio.save_png(out_path, edges[fi].astype(np.uint8))
            n_out += 1
        if args.save_steps and bi == 0:
            _save_steps(args, batch[0])
    elapsed = time.perf_counter() - t0

    stats = {
        "frames": n_out,
        "seconds": round(elapsed, 4),
        "mp_per_s": round(total_px / 1e6 / elapsed, 2),
        "backend": args.backend,
    }
    report = None
    if args.timeit and profiled_frame is not None:
        from .utils.timing import profile_stages

        # profile the actual first input frame at its actual size
        report = profile_stages(profiled_frame, args.sigma, args.min_val,
                                args.max_val)
        stats["stages"] = report.json()
    if args.json:
        print(json.dumps(stats))
    else:
        # the reference prints "Execution time: <s> seconds" (utils.cpp:489)
        print(f"Execution time: {elapsed:.6f} seconds "
              f"({stats['frames']} frames, {stats['mp_per_s']} MP/s)")
    if report is not None:
        print(report.table(), file=sys.stderr)
    return 0


def _chain_first(first, rest):
    yield first
    yield from rest


def _save_steps(args, frame) -> None:
    """Save min-max normalized stage images (reference -s equivalent)."""
    from .io import imageio

    if args.backend == "golden":
        from . import golden

        _, inter = golden.canny(frame, args.sigma, args.min_val,
                                args.max_val, intermediates=True)
    else:
        from .models import CannyTPU

        model = CannyTPU(sigma=args.sigma)
        _, inter = model.with_intermediates(frame, args.min_val, args.max_val)
        inter = {k: np.asarray(v) for k, v in inter.items()}
    os.makedirs(args.out_dir, exist_ok=True)
    for name in ("smoothed", "magnitude", "nonmax"):
        imageio.save_png(os.path.join(args.out_dir, f"step_{name}.png"),
                         imageio.minmax_normalize_u8(inter[name]))


if __name__ == "__main__":
    sys.exit(main())
