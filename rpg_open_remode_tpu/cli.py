"""Command-line interface — the reference's executables, one binary.

  run    offline dataset processing with the full keyframe lifecycle
         (replaces the `depthmap_node` ROS node + `dataset_publisher`
         replay, src/main_ros.cpp / test/publish_dataset.cpp): reads a
         REMODE-format dataset, drives DepthmapNode, exports per-keyframe
         depth maps / convergence overlays / PLY point clouds.
  bench  single-keyframe timed benchmark against ground truth (replaces
         `dataset_main`, test/dataset_main.cpp): frame 0 is the reference,
         all following frames update it, per-update wall-clock stats and
         depth accuracy are reported.

Both accept either a real on-disk dataset (--data-path / RMD_TEST_DATA_PATH,
reference format) or --synthetic for the built-in ray-traced scene.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _stdin_frames(args):
    """Live input: one frame per stdin line —

        <image-path> tx ty tz qx qy qz qw [min_depth max_depth]

    (the reference's /svo/dense_input topic, src/main_ros.cpp:36-41 +
    svo_msgs::DenseInput, as a pipe: a visual-odometry process streams
    image paths and T_world_curr poses; an empty line or EOF ends the
    stream). Depth bounds, when present, update the scene bounds used at
    the next keyframe."""
    import sys as _sys

    from rpg_open_remode_tpu.io.dataset import DatasetEntry, read_gray_image

    def gen():
        for line in _sys.stdin:
            parts = line.split()
            if not parts:
                break
            try:
                path, vals = parts[0], [float(v) for v in parts[1:]]
            except ValueError:
                vals = []
            if len(vals) not in (7, 9):
                print(f"skipping malformed line: {line.rstrip()}", flush=True)
                continue
            entry = DatasetEntry(
                image_file=path, depthmap_file="",
                translation=np.asarray(vals[:3], np.float32),
                quaternion=np.asarray(vals[3:7], np.float32),
            )
            gt = None
            if len(vals) == 9:
                # bounds ride the gt slot as a (min, max) marker array
                gt = np.array([vals[7], vals[8]], np.float32)
            yield path, read_gray_image(path), entry.T_curr_world, gt

    cx = args.cx if args.cx is not None else (args.width - 1) / 2.0
    cy = args.cy if args.cy is not None else (args.height - 1) / 2.0
    return gen(), (args.width, args.height, args.fx, cx, args.fy, cy)


def _load_frames(args):
    """-> (frames iterable of (name, image, T_curr_world, gt_depth|None),
    (width, height, fx, cx, fy, cy))."""
    if getattr(args, "stdin", False):
        return _stdin_frames(args)
    if args.synthetic:
        from rpg_open_remode_tpu.utils import synthetic

        cam = dict(
            fx=args.fx or 481.2,
            fy=args.fy or -480.0,
            cx=args.cx if args.cx is not None else (args.width - 1) / 2.0,
            cy=args.cy if args.cy is not None else (args.height - 1) / 2.0,
        )
        frames = synthetic.generate(
            n_frames=args.frames or 100,
            width=args.width,
            height=args.height,
            cam=cam,
            seed=args.seed,
            step=args.motion_step,
        )

        def gen():
            for i, fr in enumerate(frames):
                T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
                yield (f"synthetic_{i:04d}", fr.image,
                       np.linalg.inv(T)[:3].astype(np.float32), fr.depth)

        return gen(), (args.width, args.height,
                       cam["fx"], cam["cx"], cam["fy"], cam["cy"])

    from rpg_open_remode_tpu.io import Dataset

    ds = Dataset(args.sequence, path=args.data_path)
    if ds.path is None and not ds.load_path_from_env():
        sys.exit("no dataset path: pass --data-path or set RMD_TEST_DATA_PATH")
    if not ds.read_data_sequence(args.start, args.end):
        sys.exit(f"cannot read sequence file {ds.path / ds.sequence_file}")

    from rpg_open_remode_tpu.io.dataset import FramePrefetcher

    def gen():
        # background read-ahead: frame decode overlaps device dispatch
        gt_shape = (args.width, args.height) if args.use_gt_depth else None
        pf = FramePrefetcher(ds, depth=4, gt_shape=gt_shape)
        try:
            for entry, img, gt in pf:
                yield entry.image_file, img, entry.T_curr_world, gt
        finally:
            pf.close()

    cx = args.cx if args.cx is not None else 319.5
    cy = args.cy if args.cy is not None else 239.5
    return gen(), (args.width, args.height, args.fx, cx, args.fy, cy)


def _make_engine(geom, args=None):
    from rpg_open_remode_tpu.models.depthmap import Depthmap

    cfg = None
    if args is not None and getattr(args, "propagate", False):
        from rpg_open_remode_tpu.config import RemodeConfig

        cfg = RemodeConfig(propagate_depth=True)
    width, height, fx, cx, fy, cy = geom
    return Depthmap(width, height, fx=fx, cx=cx, fy=fy, cy=cy, cfg=cfg)


def _make_sharded_node(args, geom, export):
    """--mesh KF,TY,TX: the mapping loop over a device mesh (keyframes x
    spatial tiles; parallel/node.ShardedDepthmapNode). With --distributed,
    joins a multi-process mesh first (keyframes across processes over DCN,
    tiles across each process's chips over ICI)."""
    from rpg_open_remode_tpu.parallel import ShardedDepthmapNode, make_mesh

    kf, ty, tx = (int(v) for v in args.mesh.split(","))
    if args.distributed:
        from rpg_open_remode_tpu.parallel import (
            initialize_distributed, make_distributed_mesh,
        )

        initialize_distributed(
            coordinator_address=args.distributed,
            num_processes=args.nproc,
            process_id=args.proc,
        )
        mesh = make_distributed_mesh(kf=kf, ty=ty, tx=tx)
    else:
        mesh = make_mesh(kf * ty * tx, kf=kf, ty=ty, tx=tx)
    width, height, fx, cx, fy, cy = geom
    cfg = None
    if getattr(args, "propagate", False):
        from rpg_open_remode_tpu.config import RemodeConfig

        # sharded reseeds warm-start each slot from its outgoing posterior
        # (parallel/sharded.build_sharded_reseed + ops/propagate.py)
        cfg = RemodeConfig.for_camera(fx, propagate_depth=True)
    n_kf = args.keyframes if args.keyframes > 1 else None
    return ShardedDepthmapNode(
        mesh, width, height, fx=fx, cx=cx, fy=fy, cy=cy,
        n_keyframes=n_kf, cfg=cfg, on_keyframe=export,
    )


def cmd_run(args):
    from rpg_open_remode_tpu.io import (
        GlobalMap,
        convergence_overlay,
        save_pointcloud_ply,
        save_state,
    )
    from rpg_open_remode_tpu.models.node import DepthmapNode

    frames, geom = _load_frames(args)
    os.makedirs(args.out, exist_ok=True)
    kf_idx = [0]
    gmap = GlobalMap(voxel=args.map_voxel) if args.map_voxel else None

    def export(result):
        import jax

        i = kf_idx[0]
        kf_idx[0] += 1
        # multi-process meshes export per owning process with a per-process
        # counter; namespace the files (and the per-process partial global
        # map below) so processes sharing --out cannot clobber each other
        tag = (f"p{jax.process_index()}_" if jax.process_count() > 1 else "")
        stem = os.path.join(args.out, f"kf_{tag}{i:03d}")
        np.save(stem + "_depth.npy", result.denoised_depth)
        n = save_pointcloud_ply(
            stem + "_cloud.ply", result.state, result.denoised_depth,
        )
        from PIL import Image

        Image.fromarray(convergence_overlay(result.state)).save(
            stem + "_convergence.png"
        )
        if gmap is not None:
            gmap.add_keyframe(result)
        if args.checkpoint:
            save_state(stem + "_state.npz", result.state)
        print(
            f"[keyframe {tag}{i}] {result.converged_percentage:.1f}% "
            f"converged, {result.n_updates} updates, {n} points",
            flush=True,
        )

    if args.mesh:
        if args.metrics or args.conv_every:
            print("note: --metrics/--conv-every are single-device only; "
                  "ignored under --mesh", flush=True)
        node = _make_sharded_node(args, geom, export)
    elif args.keyframes > 1:
        # concurrent-keyframe ring (models/multikeyframe.MultiKeyframeNode):
        # every frame fuses into all N keyframes in one device program
        from rpg_open_remode_tpu.models.multikeyframe import (
            BatchedDepthmap, MultiKeyframeNode,
        )

        if args.metrics:
            print("note: --metrics NDJSON is single-keyframe only; ignored",
                  flush=True)
        if args.conv_every:
            print("note: --conv-every is single-keyframe only; ignored",
                  flush=True)
        width, height, fx, cx, fy, cy = geom
        ring_cfg = None
        if getattr(args, "propagate", False):
            from rpg_open_remode_tpu.config import RemodeConfig

            # ring slots warm-start from their own outgoing posterior
            # (models/multikeyframe.seed_slot_prop + ops/propagate.py)
            ring_cfg = RemodeConfig.for_camera(fx, propagate_depth=True)
        engine = BatchedDepthmap(
            args.keyframes, width, height, fx=fx, cx=cx, fy=fy, cy=cy,
            cfg=ring_cfg,
        )
        node = MultiKeyframeNode(engine, on_keyframe=export)
    else:
        engine = _make_engine(geom, args)
        on_conv = None
        node_cfg = None
        if args.conv_every:
            import dataclasses

            from PIL import Image

            node_cfg = dataclasses.replace(
                engine.cfg, publish_conv_every_n=args.conv_every
            )

            def on_conv(overlay):
                Image.fromarray(overlay).save(
                    os.path.join(args.out, "conv_latest.png")
                )

        node = DepthmapNode(engine, cfg=node_cfg, on_keyframe=export,
                            on_convergence=on_conv,
                            metrics_path=args.metrics or None)
    last_bounds = None
    n_frames = 0
    t0 = time.perf_counter()
    next_due = t0
    for name, img, T_cw, gt in frames:
        if args.rate_hz:
            # paced replay (the dataset_publisher analog, 10 Hz default
            # there: test/publish_dataset.cpp:43-47)
            now = time.perf_counter()
            if now < next_due:
                time.sleep(next_due - now)
            next_due += 1.0 / args.rate_hz
        if gt is not None:
            finite = gt[np.isfinite(gt)]
            if finite.size:
                last_bounds = (float(finite.min()), float(finite.max()))
        if last_bounds is None:
            last_bounds = (args.min_depth, args.max_depth)
        stats = node.process_frame(img, T_cw, *last_bounds)
        n_frames += 1
        if args.verbose:
            if "converged_percentage" in stats:
                print(
                    f"{name}: {stats['converged_percentage']:.1f}% converged",
                    flush=True,
                )
            elif "slots" in stats:
                pcts = "/".join(
                    f"{sl['converged_percentage']:.1f}" for sl in stats["slots"]
                )
                print(f"{name}: {pcts}% converged per slot", flush=True)
    node.close()
    if gmap is not None and gmap.n_keyframes:
        import jax

        # per-process partial map under a multi-process mesh (each process
        # fused only the keyframes it exported)
        map_name = (f"global_map_p{jax.process_index()}.ply"
                    if jax.process_count() > 1 else "global_map.ply")
        n_pts = gmap.save_ply(os.path.join(args.out, map_name))
        print(f"global map: {n_pts} points over {gmap.n_keyframes} keyframes "
              f"(voxel {gmap.voxel} m)")
    dt = time.perf_counter() - t0
    print(
        f"processed {n_frames} frames in {dt:.1f}s "
        f"({n_frames / dt:.1f} fps), {len(node.keyframes)} keyframes -> {args.out}"
    )


def cmd_bench(args):
    import jax
    import jax.numpy as jnp

    from rpg_open_remode_tpu.config import ConvergenceState

    frames, geom = _load_frames(args)
    frames = list(frames)
    engine = _make_engine(geom)

    name0, img0, T0, gt0 = frames[0]
    if gt0 is not None and gt0.ndim == 1:
        # --stdin rides (min, max) depth bounds in the gt slot — they are
        # bounds, not a ground-truth map
        gt0 = None
    if gt0 is not None:
        finite = gt0[np.isfinite(gt0)]
        bounds = (float(finite.min()), float(finite.max()))
    else:
        bounds = (args.min_depth, args.max_depth)
    engine.set_reference_image(img0, T0, *bounds)

    # frame 1 warms the jit compile untimed (the reference pays compilation
    # at build time, dataset_main.cpp times only kernel launches); then
    # time in blocks with ONE queue drain each — on the tunnel backend any
    # device->host fetch stalls ~30-40 ms, so a per-frame drain measures
    # the link, not the update
    seq = frames[1:]
    if seq:
        _, img, T_cw, _ = seq[0]
        engine.update(img, T_cw)
        float(jnp.sum(engine.state.mu))
    BLOCK = 10
    times = []
    i = 1
    while i < len(seq):
        j = min(i + BLOCK, len(seq))
        t0 = time.perf_counter()
        for _, img, T_cw, _ in seq[i:j]:
            engine.update(img, T_cw)
        float(jnp.sum(engine.state.mu))   # drain once per block
        times.append((time.perf_counter() - t0) / (j - i))
        i = j
    if not times:
        times = [float("nan")]

    out = {
        "frames": max(len(seq) - 1, 0),
        "warmup_frames": 1,
        "timing_block_frames": BLOCK,
        "mean_update_s": float(np.mean(times)),
        "var_update_s": float(np.var(times)),
        "fps": 1.0 / float(np.mean(times)),
        "converged_percent": engine.converged_percentage(),
    }
    if gt0 is not None:
        conv = engine.convergence_map() == int(ConvergenceState.CONVERGED)
        err = np.abs(engine.depthmap() - gt0)[conv & np.isfinite(gt0)]
        if err.size:
            out["depth_rmse_m"] = float(np.sqrt(np.mean(err**2)))
            rng = bounds[1] - bounds[0]
            out["within_2p6pct_range"] = float((err < 0.026 * rng).mean())
    engine.denoised_depthmap(0.5, 200)      # warm the denoise compile
    t0 = time.perf_counter()
    d = engine.denoised_depthmap(0.5, 200)
    float(np.sum(d))
    out["denoise_200it_s"] = time.perf_counter() - t0
    print(json.dumps(out))


def main(argv=None):
    p = argparse.ArgumentParser(prog="remode", description=__doc__)
    p.add_argument("--platform", default=None,
                   help="force a jax backend (cpu/tpu); the environment's "
                        "boot hook overrides JAX_PLATFORMS, this overrides it back")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in [("run", cmd_run), ("bench", cmd_bench)]:
        s = sub.add_parser(name)
        s.set_defaults(fn=fn)
        s.add_argument("--data-path", default=None,
                       help="dataset root (default: $RMD_TEST_DATA_PATH)")
        s.add_argument("--sequence",
                       default="first_200_frames_traj_over_table_input_sequence.txt")
        s.add_argument("--stdin", action="store_true",
                       help="live input: read '<image-path> tx ty tz qx qy "
                            "qz qw [min max]' lines from stdin (the "
                            "/svo/dense_input analog)")
        s.add_argument("--synthetic", action="store_true",
                       help="use the built-in ray-traced synthetic scene")
        s.add_argument("--frames", type=int, default=None)
        s.add_argument("--start", type=int, default=0)
        s.add_argument("--end", type=int, default=0)
        s.add_argument("--width", type=int, default=640)
        s.add_argument("--height", type=int, default=480)
        s.add_argument("--fx", type=float, default=481.2)
        s.add_argument("--fy", type=float, default=-480.0)
        s.add_argument("--cx", type=float, default=None,
                       help="principal point x (default: 319.5 for datasets, "
                            "image center for --synthetic)")
        s.add_argument("--cy", type=float, default=None)
        s.add_argument("--min-depth", type=float, default=0.5)
        s.add_argument("--max-depth", type=float, default=5.0)
        s.add_argument("--use-gt-depth", action=argparse.BooleanOptionalAction,
                       default=True,
                       help="read per-frame GT .depth files for scene bounds "
                            "and accuracy metrics (--no-use-gt-depth disables)")
        s.add_argument("--seed", type=int, default=1)
        s.add_argument("--motion-step", type=float, default=0.023,
                       help="synthetic camera travel per frame in metres "
                            "(0.023 ~ the 'over table' pace; ~0.054 matches "
                            "the paper's 'fast motion' sequence)")
        s.add_argument("--out", default="remode_out")
        s.add_argument("--keyframes", type=int, default=1,
                       help="concurrent reference keyframes (>1 drives the "
                            "batched ring engine; the reference supports 1)")
        s.add_argument("--mesh", default=None, metavar="KF,TY,TX",
                       help="run the mapping loop sharded over a device "
                            "mesh: KF concurrent keyframes x TY*TX spatial "
                            "tiles (e.g. --mesh 2,2,2 on 8 devices)")
        s.add_argument("--distributed", default=None, metavar="COORD:PORT",
                       help="join a multi-process mesh: coordinator "
                            "address (requires --nproc/--proc; with --mesh)")
        s.add_argument("--nproc", type=int, default=None,
                       help="total process count for --distributed")
        s.add_argument("--proc", type=int, default=None,
                       help="this process's index for --distributed")
        s.add_argument("--host-devices", type=int, default=None,
                       help="force N virtual host-platform devices (CPU "
                            "mesh testing; sets XLA_FLAGS before jax init)")
        s.add_argument("--conv-every", type=int, default=0,
                       help="export the convergence overlay every N frames "
                            "(conv_latest.png; the publish_conv_every_n "
                            "analog, 0 = off)")
        s.add_argument("--map-voxel", type=float, default=0.01,
                       help="voxel size (m) for the fused global map "
                            "(global_map.ply); 0 disables map fusion")
        s.add_argument("--checkpoint", action="store_true",
                       help="save per-keyframe SeedState .npz")
        s.add_argument("--propagate", action="store_true",
                       help="warm-start each new keyframe from the previous "
                            "keyframe's posterior (depth propagation, "
                            "ops/propagate.py; works with --keyframes N "
                            "and --mesh too — ring/sharded slots propagate "
                            "from their own outgoing posterior)")
        s.add_argument("--verbose", action="store_true")
        s.add_argument("--metrics", default=None,
                       help="write per-frame stats as NDJSON to this path")
        s.add_argument("--rate-hz", type=float, default=None,
                       help="pace the replay at this frame rate (the "
                            "dataset_publisher analog); default: as fast "
                            "as possible")
    args = p.parse_args(argv)
    if getattr(args, "host_devices", None):
        import re

        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       os.environ.get("XLA_FLAGS", ""))
        os.environ["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={args.host_devices}"
        )
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from rpg_open_remode_tpu.utils.devices import check_devices

    check_devices(verbose=True)
    args.fn(args)


if __name__ == "__main__":
    main()
