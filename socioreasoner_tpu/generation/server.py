"""Rollout server: command-queue wrapper around DecodeEngine.

Contract parity with the reference's server mode (`roll/distributed/strategy/
vllm_strategy.py:156-208` command loop + `roll/pipeline/base_worker.py:162-204,
343-381` start_server/add_request/request_complete):

  ADD         — enqueue a request (per-prompt BatchProto → engine request)
  ABORT       — abort by request_id
  STOP        — drain and exit the loop
  ALIVE_CHECK — liveness ping (the reference's 10s watchdog,
                generate_scheduler.py:222-228)

The server runs in a thread; responses flow through per-request callbacks.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
import traceback
from typing import Any, Callable, Dict, Optional

logger = logging.getLogger(__name__)

from ..utils.functionals import GenerateRequestType
from .engine import DecodeEngine, EngineOutput
from .sampling import SamplingParams


class GenerateServer:
    def __init__(self, engine: DecodeEngine, idle_sleep: float = 0.001):
        self.engine = engine
        self.command_queue: "queue.Queue" = queue.Queue()
        self.idle_sleep = idle_sleep
        self._thread: Optional[threading.Thread] = None
        self._running = False
        self._alive_ts = 0.0
        self._lock = threading.Lock()

    # ----------------------------------------------------------------- control
    def start(self):
        if self._thread is not None and self._thread.is_alive():
            return
        self._running = True
        self._thread = threading.Thread(target=self._loop, name="generate-server",
                                        daemon=True)
        self._thread.start()

    def stop(self, timeout: float = 60.0):
        self.command_queue.put((GenerateRequestType.STOP, None))
        if self._thread is not None:
            self._thread.join(timeout)

    def is_alive(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    # ---------------------------------------------------------------- commands
    def add_request(self, command: GenerateRequestType, data: Optional[Dict] = None):
        """Reference-style entry: (ADD, request dict) / (ABORT, {request_id}) /
        (ALIVE_CHECK, None) / (STOP, None)."""
        if command == GenerateRequestType.ALIVE_CHECK:
            if not self.is_alive():
                raise RuntimeError("generate server thread died")
            return {"alive": True, "ts": self._alive_ts}
        self.command_queue.put((command, data))

    # -------------------------------------------------------------------- loop
    MAX_CONSECUTIVE_ERRORS = 3

    def _loop(self):
        """Per-request errors are handled inside engine.step (finish_reason=
        "error" + callback); anything that still escapes is logged and the loop
        continues, so one bad step can't silently strand pending requests. Only
        repeated systemic failures kill the thread (the ALIVE_CHECK watchdog
        then surfaces it, ref generate_scheduler.py:222-228)."""
        consecutive_errors = 0
        try:
            while self._running:
                self._alive_ts = time.time()
                drained_stop = self._drain_commands()
                if drained_stop:
                    break
                if self.engine.has_work():
                    try:
                        with self._lock:
                            self.engine.step()   # callbacks fire inside
                        consecutive_errors = 0
                    except Exception:  # noqa: BLE001 — keep serving
                        consecutive_errors += 1
                        logger.error("generate server step failed (%d/%d):\n%s",
                                     consecutive_errors,
                                     self.MAX_CONSECUTIVE_ERRORS,
                                     traceback.format_exc())
                        if consecutive_errors >= self.MAX_CONSECUTIVE_ERRORS:
                            raise
                        time.sleep(0.05)
                else:
                    time.sleep(self.idle_sleep)
        finally:
            self._running = False

    def _drain_commands(self) -> bool:
        while True:
            try:
                command, data = self.command_queue.get_nowait()
            except queue.Empty:
                return False
            if command == GenerateRequestType.STOP:
                # abort everything still running
                for req_id in [r.request_id for r in self.engine.waiting] + \
                              [r.request_id for r in self.engine.slot_req.values()]:
                    self.engine.abort_request(req_id)
                return True
            if command == GenerateRequestType.ABORT:
                self.engine.abort_request(data["request_id"])
            elif command == GenerateRequestType.ADD:
                self.engine.add_request(
                    request_id=data["request_id"],
                    prompt_ids=data["prompt_ids"],
                    sampling=data.get("sampling", SamplingParams()),
                    image_embeds=data.get("image_embeds"),
                    position_ids=data.get("position_ids"),
                    callback=data.get("callback"),
                    meta=data.get("meta"))
