"""Agentic RL surface: environments + rollout loop.

Parity with the reference's agentic package (`roll/pipeline/agentic/
environment_worker.py:18-81` EnvironmentWorker.run_rollout_loop +
`agentic_pipeline.py:32`; env registry from examples/config/envs.yaml): a
multi-turn env-interaction loop where the policy emits an action per turn, the
env returns observation/reward/done, and trajectories accumulate for training.

Environments implement the tiny gym-ish protocol below; a registry maps names →
constructors (the reference plugs gem-llm/sokoban/webshop envs the same way).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from ...configs.worker_config import WorkerConfig
from ...protocol import BatchProto
from ...runtime.dispatch import Dispatch, register
from ...runtime.worker import Worker

ENV_REGISTRY: Dict[str, Callable] = {}


def register_env(name: str):
    def deco(cls):
        ENV_REGISTRY[name] = cls
        return cls
    return deco


def make_env(name: str, **kwargs):
    if name not in ENV_REGISTRY:
        raise KeyError(f"unknown env {name!r}; have {sorted(ENV_REGISTRY)}")
    return ENV_REGISTRY[name](**kwargs)


class BaseEnv:
    """Text-interface environment protocol."""

    def reset(self, seed: Optional[int] = None) -> str:
        raise NotImplementedError

    def step(self, action: str) -> Tuple[str, float, bool, Dict]:
        """→ (observation, reward, done, info)."""
        raise NotImplementedError


@register_env("guess_number")
class GuessNumberEnv(BaseEnv):
    """Minimal built-in env (tests + examples): guess an integer with feedback."""

    def __init__(self, low: int = 0, high: int = 100, max_turns: int = 10):
        self.low, self.high, self.max_turns = low, high, max_turns

    def reset(self, seed=None) -> str:
        rng = np.random.default_rng(seed)
        self.target = int(rng.integers(self.low, self.high + 1))
        self.turns = 0
        return (f"Guess the number between {self.low} and {self.high}. "
                "Answer with just a number.")

    def step(self, action: str):
        self.turns += 1
        try:
            guess = int("".join(c for c in action if c.isdigit() or c == "-") or "x")
        except ValueError:
            return "Not a number. Try again.", -0.1, self.turns >= self.max_turns, {}
        if guess == self.target:
            return "Correct!", 1.0, True, {"solved": True}
        hint = "higher" if guess < self.target else "lower"
        return f"Try {hint}.", -0.05, self.turns >= self.max_turns, {}


@dataclasses.dataclass
class Trajectory:
    observations: List[str] = dataclasses.field(default_factory=list)
    actions: List[str] = dataclasses.field(default_factory=list)
    rewards: List[float] = dataclasses.field(default_factory=list)
    done: bool = False
    info: Dict = dataclasses.field(default_factory=dict)

    @property
    def total_reward(self) -> float:
        return float(sum(self.rewards))


class EnvironmentWorker(Worker):
    """Runs env episodes against a policy `generate_fn(prompt_text) -> action`
    (ref run_rollout_loop :18-81)."""

    @register(dispatch_mode=Dispatch.ONE_TO_ALL)
    def initialize(self, pipeline_config=None, env_name: str = "guess_number",
                   env_kwargs: Optional[Dict] = None,
                   generate_fn: Optional[Callable[[str], str]] = None,
                   max_turns: int = 10):
        super().initialize(pipeline_config)
        self.env = make_env(env_name, **(env_kwargs or {}))
        self.generate_fn = generate_fn
        self.max_turns = max_turns

    def run_rollout_loop(self, n_episodes: int, seed: int = 0) -> List[Trajectory]:
        trajectories = []
        for ep in range(n_episodes):
            traj = Trajectory()
            obs = self.env.reset(seed=seed + ep)
            history = [obs]
            for _ in range(self.max_turns):
                prompt = "\n".join(history)
                action = self.generate_fn(prompt)
                obs, reward, done, info = self.env.step(action)
                traj.observations.append(prompt)
                traj.actions.append(action)
                traj.rewards.append(reward)
                history.extend([action, obs])
                if done:
                    traj.done = True
                    traj.info = info
                    break
            trajectories.append(traj)
        return trajectories
