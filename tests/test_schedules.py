"""Poly LR parity vs the reference scheduler's closed form
(train_sup.py:277-286: factor = (1 - T/N)^0.9 with T = global iter)."""

import numpy as np

from stcd_tpu.train.schedules import (
    poly_schedule,
    get_scheduler,
)


def test_poly_matches_reference_factor():
    base_lr, epochs, ipe = 1e-3, 60, 100
    sched = poly_schedule(base_lr, epochs, ipe)
    N = epochs * ipe
    for t in [0, 1, 57, 100, 999, 5999]:
        expected = base_lr * (1 - t / N) ** 0.9
        np.testing.assert_allclose(float(sched(t)), expected, rtol=2e-4)


def test_poly_warmup():
    sched = poly_schedule(1e-3, 10, 10, warmup_epochs=2)
    np.testing.assert_allclose(float(sched(10)), 1e-3 * 10 / 20, rtol=1e-6)
    assert float(sched(0)) == 0.0


def test_linear_policy():
    sched = get_scheduler("linear", 1e-3, iters_per_epoch=10, max_epochs=99)
    np.testing.assert_allclose(float(sched(0)), 1e-3 * (1 - 0 / 100), rtol=1e-6)
    np.testing.assert_allclose(float(sched(55)), 1e-3 * (1 - 5 / 100), rtol=1e-6)


def test_step_policy():
    sched = get_scheduler("step", 1e-3, iters_per_epoch=10, lr_decay_iters=5)
    np.testing.assert_allclose(float(sched(0)), 1e-3)
    np.testing.assert_allclose(float(sched(50)), 5e-4)
    np.testing.assert_allclose(float(sched(100)), 2.5e-4)


def test_exponential_policy():
    sched = get_scheduler("exponential", 1e-3, iters_per_epoch=10)
    np.testing.assert_allclose(float(sched(30)), 1e-3 * 0.95 ** 3, rtol=1e-6)
