#!/bin/bash
# End-to-end baseline fine-tune (parity with reference run_train_e2e.sh:
# same hyperparameters with --freeze_ssl=False)
set -e
cd "$(dirname "$0")/.."
python -m nrse_tpu.baseline.train_ft_cat_ser \
  --config baseline/config_cat_noisy.json \
  --model_path checkpoints/baseline/e2e \
  --epochs 10 --batch_size 32 --accumulation_steps 4 --lr 5e-6 \
  --freeze_ssl false --pooling_type AttentiveStatisticsPooling "$@"
