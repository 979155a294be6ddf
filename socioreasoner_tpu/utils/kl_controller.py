"""KL coefficient controllers (ref roll/utils/kl_controller.py:6,24)."""

from __future__ import annotations

import numpy as np


class AdaptiveKLController:
    """Adaptive KL controller from Ziegler et al. 2019 (ref kl_controller.py:6)."""

    def __init__(self, init_kl_coef: float, target: float, horizon: float):
        self.value = init_kl_coef
        self.target = target
        self.horizon = horizon

    def update(self, current: float, n_steps: int):
        proportional_error = np.clip(current / self.target - 1, -0.2, 0.2)
        mult = 1 + proportional_error * n_steps / self.horizon
        self.value *= mult


class FixedKLController:
    """Constant KL coefficient (ref kl_controller.py:24)."""

    def __init__(self, kl_coef: float):
        self.value = kl_coef

    def update(self, current: float, n_steps: int):
        pass


def get_kl_controller(init_kl_coef: float, target_kl: float | None = None,
                      kl_horizon: float = 10000):
    if target_kl is not None and target_kl > 0:
        return AdaptiveKLController(init_kl_coef, target_kl, kl_horizon)
    return FixedKLController(init_kl_coef)
