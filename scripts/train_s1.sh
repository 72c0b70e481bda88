#!/usr/bin/env bash
# reference scripts/train_s1.sh equivalent (single-host; the data mesh spans
# all local TPU devices — multi-host uses the same script per host)
python scripts/train_stage_1.py --config configs/train/stage1.yaml "$@"
