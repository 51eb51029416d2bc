"""Image-family data-scale rehearsal: the flagship pipeline
(decode+verify -> tile assignment -> PIP join -> phash dedup ->
parent-cell rollup, durable checkpoint included) at 1x/2x/4x/8x the
image count at FIXED cpu width, by reading growing file subsets of
the bench cache (64 parquet files x ~31k images) — no extra disk, no
synthetic-table rebuild.

What "healthy at 100 TB" looks like here: throughput (images/s)
flat-or-rising as data grows — fixed costs (Ray launch, actor spinup,
the small polygon broadcast, the 32-partition manifest) amortize,
per-image cost (entropy decode, phash, join) stays constant, and no
stage's driver-side state grows with the data (the rollup output is
O(polygons x parent cells), the manifest is O(parts)).

Run:  python tools/scale_rehearsal_images.py  [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--subsets", type=str, default="8,16,32,64",
                    help="comma list of file counts from the 64-file cache")
    ap.add_argument("--compose-resize", action="store_true",
                    help="prepend the bilinear ResizeStage (decode -> "
                         "32x32 thumbs -> re-encode to a VALID image "
                         "table) so the ladder measures the multi-stage "
                         "resize-then-flagship composition")
    args = ap.parse_args()

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import bench

    bench.ensure_image_cache()
    files = sorted(
        os.path.join(bench.CACHE, f)
        for f in os.listdir(bench.CACHE)
        if f.endswith(".parquet")
    )
    subsets = [int(s) for s in args.subsets.split(",")]
    if len(files) < max(subsets):
        raise SystemExit(
            f"cache has {len(files)} parquet files < requested subset "
            f"{max(subsets)}: the scale ladder would silently flatten"
        )
    # warm only what the largest leg reads (bench.py's warm policy)
    bench.warm_page_cache(files[: max(subsets)])

    from geotools_ray.ops import imagepipeline as IP

    rows = []
    for nf in subsets:
        sub = files[:nf]
        import pyarrow.parquet as pq

        n_img = sum(pq.ParquetFile(p).metadata.num_rows for p in sub)
        nb = bench.blocks_for_images(n_img)  # bench.py's block rule
        ck = tempfile.mkdtemp(prefix="graft_img_rehearsal_ck_")
        try:
            t0 = time.time()
            images = ray.data.read_parquet(sub, override_num_blocks=nb)
            if args.compose_resize:
                from geotools_ray.stages.imaging import ResizeStage

                images = images.map_batches(
                    ResizeStage(out_w=32, out_h=32, fmt="jpeg"),
                    batch_format="pyarrow", batch_size=256,
                )
            out = IP.flagship_full(images, checkpoint_dir=ck)
            n_out = out.count()
            dt = time.time() - t0
        finally:
            shutil.rmtree(ck, ignore_errors=True)
        rows.append({
            "files": nf, "images": n_img, "sec": round(dt, 2),
            "images_per_sec": round(n_img / dt, 1), "out_rows": n_out,
        })
        print(json.dumps(rows[-1]))

    base = rows[0]["images_per_sec"]
    print(json.dumps({
        "metric": "flagship_data_scale_rehearsal",
        "cpus": args.cpus,
        "rows": rows,
        "throughput_ratio_last_vs_first": round(rows[-1]["images_per_sec"] / base, 3),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
