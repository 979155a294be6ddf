"""Agentic RL config surface (ref roll/pipeline/agentic/agentic_config.py).

`EnvManagerConfig` groups environments: every env in a group shares its config
and seed (so GRPO can normalize returns within the group, ref :26-61);
`AgenticConfig` adds env managers + reward normalization on top of the shared
RL hyperparameters (which RLVRConfig already carries).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from .rlvr_config import RLVRConfig
from .worker_config import WorkerConfig


@dataclass
class RewardNormalizationConfig:
    """ref agentic_config.py:20-22."""
    grouping: str = "state"        # state / batch / inductive / tags
    method: str = "identity"       # mean_std / mean / asym_clip / identity


@dataclass
class EnvManagerConfig(WorkerConfig):
    """Environment fleet layout (ref agentic_config.py:26-61): env_groups
    groups × group_size envs; same group ⇒ same env config AND same seed."""
    env_groups: int = 8
    group_size: int = 1
    tags: List[str] = field(default_factory=lambda: ["grid_goal"])
    n_groups: Optional[List[int]] = None
    max_traj_per_env: int = -1
    format_penalty: float = 0.0
    max_env_num_per_worker: int = 0

    def __post_init__(self):
        if self.max_env_num_per_worker <= 0:
            self.max_env_num_per_worker = self.env_groups * self.group_size

    @property
    def total_envs(self) -> int:
        return self.env_groups * self.group_size


@dataclass
class AgenticConfig(RLVRConfig):
    """ref agentic_config.py:70-142; RL hyperparameters (pg_clip, kl, adv
    estimator, reward_clip, gamma/lambd…) come from RLVRConfig."""
    custom_envs: Dict[str, Any] = field(default_factory=dict)
    train_env_manager: EnvManagerConfig = field(default_factory=EnvManagerConfig)
    val_env_manager: EnvManagerConfig = field(
        default_factory=lambda: EnvManagerConfig(env_groups=2))
    enable_response_mask: bool = True
    render_save_dir: Optional[str] = None
    action_sep: str = "||"
    use_turn_scores: bool = False
    enable_think: bool = True
    reward_normalization: RewardNormalizationConfig = field(
        default_factory=RewardNormalizationConfig)
    max_steps_per_traj: int = 10
    val_batch_size: int = 4
