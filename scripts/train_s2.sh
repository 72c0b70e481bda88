#!/usr/bin/env bash
python scripts/train_stage_2.py --config configs/train/stage2.yaml "$@"
