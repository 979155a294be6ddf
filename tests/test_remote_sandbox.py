"""Remote code-sandbox mode (VERDICT r3 Missing #3): a local HTTP stub plays
the sandbox service; the client must send the reference payload schema
(`code_sandbox_reward_worker.py:134-160`), retry SandboxError, and judge
Success/stdout like the reference's sanbox_result_judge (`:248-283`)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from socioreasoner_tpu.pipeline.rlvr.rewards.code_sandbox import (
    RemoteSandbox, compute_code_rewards, score_response)


class _StubSandbox(BaseHTTPRequestHandler):
    """Executes the posted python code in-process (trusted test code only)
    and answers with the reference sandbox response shape."""

    fail_first_n = 0          # respond SandboxError to the first N requests
    seen = []

    def do_POST(self):
        cls = type(self)
        payload = json.loads(self.rfile.read(
            int(self.headers["Content-Length"])))
        cls.seen.append(payload)
        if cls.fail_first_n > 0:
            cls.fail_first_n -= 1
            body = {"status": "SandboxError", "message": "transient"}
        else:
            import io, contextlib, sys
            out = io.StringIO()
            status = "Success"
            old_stdin = sys.stdin
            try:
                sys.stdin = io.StringIO(payload.get("stdin", ""))
                with contextlib.redirect_stdout(out):
                    exec(payload["code"], {"__name__": "__main__"})
            except Exception:
                status = "Failed"
            finally:
                sys.stdin = old_stdin
            body = {"status": status,
                    "run_result": {"stdout": out.getvalue(), "stderr": "",
                                   "return_code": 0}}
        data = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):
        pass


@pytest.fixture()
def sandbox_url():
    _StubSandbox.seen = []
    _StubSandbox.fail_first_n = 0
    srv = HTTPServer(("127.0.0.1", 0), _StubSandbox)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/run_code"
    srv.shutdown()


def test_remote_stdin_case(sandbox_url):
    resp = "```python\nprint(int(input()) * 2)\n```"
    cases = [{"input": "3", "output": "6"}, {"input": "5", "output": "11"}]
    s = score_response(resp, cases, sandbox=RemoteSandbox(sandbox_url))
    assert s == 0.5
    # payload carries the reference schema
    p = _StubSandbox.seen[0]
    assert {"compile_timeout", "run_timeout", "code", "language", "stdin",
            "expected_stdout"} <= set(p)
    assert p["language"] == "python"


def test_remote_assert_case_and_retry(sandbox_url):
    _StubSandbox.fail_first_n = 1   # first request -> SandboxError, must retry
    resp = "```python\ndef add(a, b):\n    return a + b\n```"
    cases = [{"assert": "assert add(2, 2) == 4"},
             {"assert": "assert add(2, 2) == 5"}]
    out = compute_code_rewards([resp], [cases], code_url=sandbox_url)
    np.testing.assert_allclose(out["response_level_rewards"], [0.5])


def test_remote_worker_wiring(sandbox_url):
    """CodeSandboxRewardWorker routes through the URL when code_url is set."""
    from socioreasoner_tpu.configs.worker_config import WorkerConfig
    from socioreasoner_tpu.pipeline.base_worker import CodeSandboxRewardWorker
    from socioreasoner_tpu.protocol import BatchProto

    wc = WorkerConfig(code_url=sandbox_url)
    w = CodeSandboxRewardWorker(worker_config=wc)
    data = BatchProto.from_dict(non_tensors={
        "response_text": np.array(
            ["```python\nprint('ok')\n```"], dtype=object),
        "ground_truth": np.array(
            [json.dumps([{"input": "", "output": "ok"}])], dtype=object)})
    out = w.compute_rewards(data)
    np.testing.assert_allclose(out.batch["response_level_rewards"], [1.0])
    assert len(_StubSandbox.seen) == 1   # executed remotely, not locally


def test_unreachable_url_scores_zero():
    """Service down -> every case fails (no crash, reward 0)."""
    sb = RemoteSandbox("http://127.0.0.1:9/run_code", timeout=0.2,
                       max_retries=1)
    s = score_response("```python\nprint(1)\n```",
                       [{"input": "", "output": "1"}], sandbox=sb)
    assert s == 0.0
