"""Schedule-resolution regression tests.

Round-2 postmortem: a 6k-step batch-8 run with the default OptimConfig got a
38,400-step warmup (reference semantics divide canonical warmup by the LR
scaling factor, lightning/train_homo_geoformer.py:80-86) so the peak LR was
never reached and the checkpoint badly underfit. make_schedule now clamps the
derived warmup to total_steps // 12 when the run length is known and no
explicit warmup override is given.
"""

import dataclasses

from geoformer_tpu.config import OptimConfig
from geoformer_tpu.train.optim import make_schedule


def test_default_warmup_clamped_to_run_length():
    sch, true_lr, warmup = make_schedule(
        OptimConfig(), batch_size=8, steps_per_epoch=400, total_steps=6000)
    assert true_lr == 6e-3 * 8 / 64
    assert warmup == 500  # 6000 // 12
    # peak LR is actually reached inside the run, before the first decay
    assert abs(sch(warmup) - true_lr) < 1e-12
    # and the ramp is far above the round-2 bug's 9.7e-7 at step 200
    assert sch(200) > 1e-4


def test_reference_semantics_without_total_steps():
    # no total_steps => exact reference behavior (canonical / scaling)
    _, _, warmup = make_schedule(OptimConfig(), 8, 400)
    assert warmup == 4800 * 8  # 4800 / (8/64)


def test_explicit_warmup_actual_wins():
    cfg = dataclasses.replace(OptimConfig(), warmup_actual=250)
    sch, true_lr, warmup = make_schedule(cfg, 8, 400, total_steps=6000)
    assert warmup == 250
    assert abs(sch(250) - true_lr) < 1e-12


def test_multistep_decay_after_warmup():
    sch, true_lr, warmup = make_schedule(
        OptimConfig(), 8, 400, total_steps=6000)
    # epoch 3 begins at step 1200 -> one 0.5 decay; epoch 6 -> two
    assert abs(sch(1200) - 0.5 * true_lr) < 1e-12
    assert abs(sch(2400) - 0.25 * true_lr) < 1e-12
    # monotone non-decreasing through the warmup ramp
    prev = -1.0
    for s in range(0, warmup + 1, 50):
        cur = sch(s)
        assert cur >= prev
        prev = cur
