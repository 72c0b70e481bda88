#!/usr/bin/env bash
# reference scripts/eval.sh equivalent
python scripts/eval_pose2img.py --config ./configs/prompts/stage2.yaml -W 512 -H 896 --repeat 1 "$@"
