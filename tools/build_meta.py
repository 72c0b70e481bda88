"""Meta-info CLI: extract / segment / split / merge training meta JSONs.

Replaces the reference's per-source scripts (``tools/extract_pexels_meta_info
.py``, ``extract_ue_meta_info.py``, ``extract_tiktok/ubc_*``,
``merge_all_meta_info.py``, ``get_video_segments.py``) with one driver:

    python tools/build_meta.py extract --videos_dir data/pexels/videos \\
        --human_csv data/pexels/humans.csv --segment 10 --split_orientation \\
        --out data/meta/pexels
    python tools/build_meta.py merge --inputs a.json b.json --out merged.json
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from humanvid_tpu.data.meta_tools import (
    extract_meta,
    load_human_counts,
    merge_meta,
    save_meta,
    segment_meta,
    split_by_orientation,
)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("extract")
    e.add_argument("--videos_dir", required=True)
    e.add_argument("--out", required=True, help="output path or prefix")
    e.add_argument("--human_csv", default=None)
    e.add_argument("--max_humans", type=int, default=1)
    e.add_argument("--no_camera", action="store_true")
    e.add_argument("--no_length_check", action="store_true")
    e.add_argument("--segment", type=float, default=0.0, help="seconds per segment")
    e.add_argument("--split_orientation", action="store_true")

    m = sub.add_parser("merge")
    m.add_argument("--inputs", nargs="+", required=True)
    m.add_argument("--out", required=True)

    args = p.parse_args()
    if args.cmd == "merge":
        merged = merge_meta(args.inputs, args.out)
        print(f"merged {len(merged)} entries -> {args.out}")
        return

    counts = load_human_counts(args.human_csv) if args.human_csv else None
    entries = extract_meta(
        args.videos_dir,
        require_camera=not args.no_camera,
        check_lengths=not args.no_length_check,
        human_counts=counts,
        max_humans=args.max_humans,
    )
    if args.segment > 0:
        entries = segment_meta(entries, args.segment)
    if args.split_orientation:
        split = split_by_orientation(entries)
        for k, v in split.items():
            path = f"{args.out}_{k}.json"
            save_meta(v, path)
            print(f"{len(v)} {k} entries -> {path}")
    else:
        save_meta(entries, args.out if args.out.endswith(".json") else args.out + ".json")
        print(f"{len(entries)} entries -> {args.out}")


if __name__ == "__main__":
    main()
