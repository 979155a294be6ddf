"""Code-execution reward (ref roll/pipeline/rlvr/rewards/
code_sandbox_reward_worker.py, 583 LoC + roll/utils/local_code/testing_util.py).

Runs model-generated code against test cases in an isolated subprocess with a
wall-clock timeout (the reference's "local" execution mode; its remote sandbox
URL mode is a deployment concern behind the same interface). Two test styles,
matching the reference: stdin/stdout cases and assert-based function cases.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
from typing import Dict, List, Optional, Sequence

import numpy as np

CODE_BLOCK_RE = re.compile(r"```(?:python|py)?\s*\n(.*?)```", re.DOTALL)


def extract_code(text: str) -> Optional[str]:
    blocks = CODE_BLOCK_RE.findall(text)
    if blocks:
        return blocks[-1].strip()
    if "def " in text or "print(" in text:
        return text.strip()
    return None


def run_stdin_case(code: str, stdin: str, expected: str, timeout: float = 6.0
                   ) -> bool:
    """Run code with stdin, compare stripped stdout lines."""
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "sol.py")
        with open(path, "w") as f:
            f.write(code)
        try:
            proc = subprocess.run(
                [sys.executable, "-E", "-I", path], input=stdin.encode(),
                capture_output=True, timeout=timeout, cwd=td)
        except (subprocess.TimeoutExpired, OSError):
            return False
        if proc.returncode != 0:
            return False
        got = [l.rstrip() for l in proc.stdout.decode(errors="replace").strip().splitlines()]
        want = [l.rstrip() for l in expected.strip().splitlines()]
        return got == want


def run_assert_case(code: str, test_code: str, timeout: float = 6.0) -> bool:
    """Append assert-style tests to the solution and run."""
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "sol.py")
        with open(path, "w") as f:
            f.write(code + "\n\n" + test_code + "\n")
        try:
            proc = subprocess.run([sys.executable, "-E", "-I", path],
                                  capture_output=True, timeout=timeout, cwd=td)
        except (subprocess.TimeoutExpired, OSError):
            return False
        return proc.returncode == 0


def score_response(response: str, test_cases, timeout: float = 6.0) -> float:
    """Fraction of test cases passed. test_cases: list of
    {"input":..., "output":...} or {"assert": code} or a JSON string thereof."""
    code = extract_code(response)
    if code is None:
        return 0.0
    if isinstance(test_cases, str):
        try:
            test_cases = json.loads(test_cases)
        except json.JSONDecodeError:
            return 0.0
    if not test_cases:
        return 0.0
    passed = 0
    for case in test_cases:
        if "assert" in case:
            ok = run_assert_case(code, case["assert"], timeout)
        else:
            ok = run_stdin_case(code, case.get("input", ""),
                                case.get("output", ""), timeout)
        passed += ok
    return passed / len(test_cases)


def compute_code_rewards(responses: Sequence[str], test_cases_list: Sequence,
                         timeout: float = 6.0) -> Dict:
    scores = np.array([score_response(r, t, timeout)
                       for r, t in zip(responses, test_cases_list)], np.float32)
    return {"scores": scores,
            "response_level_rewards": scores,
            "metrics": {"code/pass_rate": float(scores.mean()),
                        "code/all_passed": float((scores == 1.0).mean())}}
