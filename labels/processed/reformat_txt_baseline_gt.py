#!/usr/bin/env python3
"""Workflow-path shim: semicolon label lists → baseline one-hot CSV.

The reference ships this script at
``labels/processed/reformat_txt_baseline_gt.py`` (CLI:
``--input-file/--ground-truth-file/--output-file/--preserve-path``); the
implementation lives in
``nrse_tpu.labels.parsing.reformat_lists_to_onehot_csv``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    parser = argparse.ArgumentParser(
        description="Reformat label files to target format")
    parser.add_argument("--input-file", "-i", required=True,
                        help="Input label file")
    parser.add_argument("--ground-truth-file", "-g", required=True,
                        help="Ground truth label file (labels_consensus.csv)")
    parser.add_argument("--output-file", "-o", required=True,
                        help="Output label file")
    parser.add_argument("--preserve-path", "-p", action="store_true",
                        help="Preserve full path in output")
    args = parser.parse_args()

    from nrse_tpu.labels.parsing import reformat_lists_to_onehot_csv

    n = reformat_lists_to_onehot_csv(
        [args.input_file], args.ground_truth_file, args.output_file,
        args.preserve_path,
    )
    print(f"Reformatted {n} rows from {args.input_file} to "
          f"{args.output_file} using information from "
          f"{args.ground_truth_file}")


if __name__ == "__main__":
    main()
