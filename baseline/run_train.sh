#!/bin/bash
# Frozen-SSL baseline fine-tune (parity with reference baseline/run_train.sh:
# bs 32, accum 4, lr 5e-6, 10 epochs, ASP pooling, SSL frozen)
set -e
cd "$(dirname "$0")/.."
python -m nrse_tpu.baseline.train_ft_cat_ser \
  --config baseline/config_cat_noisy.json \
  --model_path checkpoints/baseline/frozen \
  --epochs 10 --batch_size 32 --accumulation_steps 4 --lr 5e-6 \
  --freeze_ssl true --pooling_type AttentiveStatisticsPooling "$@"
