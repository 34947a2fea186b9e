"""``ray job submit``-able entrypoint for the flagship pipeline.

    ray job submit -- python -m opentelemetry_collector_contrib_ray.job \
        --sf-dir /root/testdata/sf0.1 --out /tmp/flagship_out

On a cluster the same command runs against the shared object store; the
job is resumable — re-submitting with the same --out skips completed
partitions via their lineage manifests (state/manifest.py). Prints one
JSON summary line (rows, per-sink counts, skipped partitions, wall time).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1",
                   help="input scale dir (transcripts derived+cached from it)")
    p.add_argument("--out", required=True, help="output root for sinks + lineage")
    p.add_argument("--no-resume", action="store_true",
                   help="reprocess all partitions even if manifests exist")
    p.add_argument("--group-size", type=int, default=4,
                   help="input files per resumable partition")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():  # the driver contract owns init elsewhere
        # no explicit address: ray.init() honors RAY_ADDRESS, so `ray job
        # submit` connects to the submitting cluster (address="local"
        # would silently spin up an isolated single-node instance there);
        # the sandbox presets RAY_ADDRESS=local, so local runs unchanged
        ray.init(include_dashboard=False)

    from .pipelines.flagship import run_flagship

    summary = run_flagship(args.sf_dir, args.out,
                           resume=not args.no_resume,
                           group_size=args.group_size)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
