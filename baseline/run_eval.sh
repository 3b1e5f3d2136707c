#!/bin/bash
# List-based timed evaluation (parity with reference baseline/run_eval.sh:
# evaluates on the snr8 processed test2 list)
set -e
cd "$(dirname "$0")/.."
MODEL_PATH=${MODEL_PATH:-checkpoints/baseline/e2e}
AUDIO_DIR=${AUDIO_DIR:-data/msp_podcast}
LIST=${LIST:-labels/processed/msp1_11-test2-snr8_processed.txt}
python -m nrse_tpu.baseline.eval_cat_ser \
  --model_path "$MODEL_PATH" --audio_list "$LIST" --audio_dir "$AUDIO_DIR" "$@"
