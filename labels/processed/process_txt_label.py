#!/usr/bin/env python3
"""Workflow-path shim: drop X/O lines from a semicolon label list.

The reference ships this script at ``labels/processed/process_txt_label.py``
(same CLI: ``--input/--output``); the implementation lives in
``nrse_tpu.labels.parsing.filter_label_list``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    parser = argparse.ArgumentParser(
        description="Filter out rows with X or O emotion labels")
    parser.add_argument("--input", type=str, required=True,
                        help="Path to input text file with emotion labels")
    parser.add_argument("--output", type=str, required=True,
                        help="Path to output filtered text file")
    args = parser.parse_args()

    from nrse_tpu.labels.parsing import filter_label_list

    if not os.path.exists(args.input):
        print(f"Error: Input file {args.input} does not exist")
        return
    kept = filter_label_list(args.input, args.output)
    print(f"kept {kept} lines -> {args.output}")


if __name__ == "__main__":
    main()
