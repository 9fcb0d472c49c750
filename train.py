#!/usr/bin/env python
"""Training CLI, drop-in surface for /root/reference/train.py.

Example (reference README.md:111-118):
    python train.py --dataroot ./datasets/straightened --name exp \
        --model pix2pix --direction BtoA --batch_size 16 --n_epochs 1000

Hermetic run without data: add --dataset_mode synthetic.
"""

import sys

from healthivert_tpu.config.options import TrainOptions, TestOptions
from healthivert_tpu.engine.train_loop import run_training


def main(argv=None):
    opt = TrainOptions().parse(argv)

    # second parse for the in-training eval split (reference train.py:173-177)
    # known_only: ignore train-only flags when re-parsing for the eval split
    opt_test = TestOptions().parse(argv, save=False, known_only=True)
    opt_test.batch_size = 5
    opt_test.serial_batches = True
    opt_test.phase = "test"
    opt_test.isTrain = False
    profile_steps = None
    if getattr(opt, "profile_steps", None):
        a, _, b = opt.profile_steps.partition(",")
        try:
            start = int(a)
            stop = int(b) if b else start + 10
        except ValueError:
            raise SystemExit(
                f"--profile_steps expects START[,STOP] integers, got {opt.profile_steps!r}"
            )
        if start < 0 or stop <= start:
            raise SystemExit(
                f"--profile_steps needs 0 <= START < STOP, got {start},{stop}"
            )
        profile_steps = (start, stop)
    return run_training(
        opt, opt_test,
        max_steps=getattr(opt, "max_steps", None),
        profile_steps=profile_steps,
    )


if __name__ == "__main__":
    main(sys.argv[1:])
