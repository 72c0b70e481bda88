"""Stage-2 (pose2vid) training driver.

Behavioral parity: reference ``train_stage_2.py`` — video batches (bs 1, 24
frames, random stride), trains motion modules + camera encoder only, loads
stage-1 checkpoints, saves motion-module + camera-encoder checkpoints with
keep-last-10 rotation. The camera encoder's positional-encoding table is
sinusoidal and computed (not stored), so the reference's max_len 16->24
checkpoint surgery (``train_stage_2.py:181-186``) is unnecessary here.

Shares the loop with stage 1 (`train_stage_1.run_training`).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from train_stage_1 import run_training  # noqa: E402

if __name__ == "__main__":
    run_training(2)
