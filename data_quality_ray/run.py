"""CLI entry point — the shape a cluster user runs via ``ray job submit``:

    ray job submit -- python -m data_quality_ray.run \
        --input /data/clips --output /data/out --partitions 64 [--resume]

Locally (this sandbox) it runs against a local Ray session. The driver-owned
convention still holds: when Ray is already initialised (job submission,
tests) we never re-init; standalone invocation initialises a local session
and shuts it down on exit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="data_quality_ray.run")
    p.add_argument("--input", required=True, help="directory of clip parquet files")
    p.add_argument("--output", required=True, help="output directory (partitioned)")
    p.add_argument("--partitions", type=int, default=16, help="checkpoint partitions")
    p.add_argument("--no-resume", action="store_true", help="recompute committed partitions")
    p.add_argument("--kept-only", action="store_true", help="write only keep=True rows")
    p.add_argument("--num-cpus", type=int, default=None, help="cpus for a standalone local session")
    p.add_argument(
        "--table",
        choices=("clips", "documents"),
        default="clips",
        help="which flagship to run: the audio clip pipeline (default) or "
        "the document-corpus pipeline over the same checkpointed engine",
    )
    p.add_argument(
        "--render-spectrograms",
        type=int,
        default=0,
        metavar="N",
        help="additionally render N sample spectrogram PNGs under OUTPUT/_samples "
        "(the reference's plot sink, behind a flag)",
    )
    args = p.parse_args(argv)
    if args.render_spectrograms and args.table != "clips":
        # the render step reads clip columns (clip_id, bytes, sr_hz, codec);
        # fail fast instead of crashing after the pipeline already committed
        p.error("--render-spectrograms requires --table clips")

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        from data_quality_ray.session import init_local_session

        init_local_session(args.num_cpus)

    try:
        if args.table == "documents":
            from data_quality_ray.pipelines.documents import run_document_pipeline

            summary = run_document_pipeline(
                args.input,
                args.output,
                n_partitions=args.partitions,
                resume=not args.no_resume,
                kept_only=args.kept_only,
            )
        else:
            from data_quality_ray.pipelines.quality import run_checkpointed

            summary = run_checkpointed(
                args.input,
                args.output,
                n_partitions=args.partitions,
                resume=not args.no_resume,
                kept_only=args.kept_only,
            )
        # K1 analogue (runme.py:35-36): global bucket stats JSON at the root
        stats_path = os.path.join(args.output, "quality_stats.json")
        tmp = stats_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(summary["buckets"], f, sort_keys=True)
        os.replace(tmp, stats_path)
        if args.render_spectrograms:
            from data_quality_ray.pipelines.spectrogram import render_spectrogram_pngs

            render_spectrogram_pngs(
                args.input,
                os.path.join(args.output, "_samples"),
                limit=args.render_spectrograms,
            )
        print(json.dumps(summary))
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
