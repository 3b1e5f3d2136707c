#!/usr/bin/env python3
"""Workflow-path shim: prune label lists (and symlinks) of files that
failed to load during training.

The reference ships this script at
``labels/processed/remove_problematic_files.py`` (CLI:
``--error-log/--label-file/--output-label-file/--symlink-dir/
--problem-list``); scraping + pruning live in
``nrse_tpu.utils.preprocess_audio_files``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    parser = argparse.ArgumentParser(
        description="Remove problematic audio files from label file "
                    "and symlinks")
    parser.add_argument("--error-log", "-e", required=True,
                        help="Path to the error log file")
    parser.add_argument("--label-file", "-l", required=True,
                        help="Path to the label file")
    parser.add_argument("--output-label-file", "-o", required=True,
                        help="Path to the output label file")
    parser.add_argument("--symlink-dir", "-s", required=False,
                        help="Directory containing symbolic links")
    parser.add_argument("--problem-list", "-p", required=False,
                        help="Output file for the list of problematic files")
    args = parser.parse_args()

    from nrse_tpu.utils.preprocess_audio_files import (
        prune_label_list,
        scrape_problematic_files_from_logs,
    )

    problematic = scrape_problematic_files_from_logs([args.error_log])
    print(f"Found {len(problematic)} problematic audio files")

    if args.problem_list:
        with open(args.problem_list, "w") as f:
            for p in problematic:
                f.write(p + "\n")
        print(f"Saved list of {len(problematic)} problematic files to "
              f"{args.problem_list}")

    kept = prune_label_list(args.label_file, args.output_label_file,
                            problematic)
    print(f"Kept {kept} entries in label file")

    if args.symlink_dir:
        bad_names = {os.path.basename(p) for p in problematic}
        removed = 0
        for name in os.listdir(args.symlink_dir):
            path = os.path.join(args.symlink_dir, name)
            if name in bad_names and os.path.islink(path):
                os.unlink(path)
                removed += 1
        print(f"Removed {removed} symbolic links")

    print("Done!")


if __name__ == "__main__":
    main()
