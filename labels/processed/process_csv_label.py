#!/usr/bin/env python3
"""Workflow-path shim: drop X/O rows from a consensus label CSV.

The reference ships this script at ``labels/processed/process_csv_label.py``
(same CLI: ``--input/--output``); the implementation lives in
``nrse_tpu.labels.parsing.filter_consensus_csv``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    parser = argparse.ArgumentParser(
        description="Filter out rows with X or O in EmoClass column")
    parser.add_argument("--input", type=str, required=True,
                        help="Path to input CSV/TSV file with emotion labels")
    parser.add_argument("--output", type=str, required=True,
                        help="Path to output filtered file")
    args = parser.parse_args()

    from nrse_tpu.labels.parsing import filter_consensus_csv

    if not os.path.exists(args.input):
        print(f"Error: Input file {args.input} does not exist")
        return
    kept = filter_consensus_csv(args.input, args.output)
    print(f"kept {kept} rows -> {args.output}")


if __name__ == "__main__":
    main()
